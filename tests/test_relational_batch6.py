"""Batch 6: cube, grouped mode, running total, skew-aware join and
triangle counting — oracle tests plus hand-computed semantic cases."""

import pandas as pd
import pyarrow as pa
import pytest

from conftest import assert_frames_equivalent, to_pandas


@pytest.mark.parametrize("name", ["rel_cube", "rel_mode", "rel_cumsum",
                                  "rel_skew_join", "kg_triangles"])
def test_batch6_oracles(sf_dir, duck, name):
    import __ray_entry__ as em

    got = em.queries()[name](sf_dir)
    expected = duck.execute(em.oracle_sql()[name]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_triangle_count_hand_graph(ray_session):
    """Two triangles sharing an edge (a-b-c, b-c-d) plus a dangling
    path (d-e-f): exactly 2 triangles, found once each via the wedge at
    the minimum vertex."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import triangle_count

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
             ("d", "e"), ("e", "f"),
             ("a", "b")]  # duplicate edge must not double-count
    t = pa.table({"norm_a": [a for a, _ in edges],
                  "norm_b": [b for _, b in edges]})
    out = triangle_count(rd.from_arrow(t).repartition(3))
    assert out["n_triangles"].tolist() == [2]


def test_cube_has_all_grouping_sets(sf_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        cube_order_stats)

    df = to_pandas(cube_order_stats(sf_dir))
    grand = df[(df["o_orderpriority"] == "ALL")
               & (df["o_orderstatus"] == "ALL")]
    assert len(grand) == 1
    # every margin total equals the sum of its leaves
    leaves = df[(df["o_orderpriority"] != "ALL")
                & (df["o_orderstatus"] != "ALL")]
    assert grand["total_cents"].iloc[0] == leaves["total_cents"].sum()
    by_status = df[(df["o_orderpriority"] == "ALL")
                   & (df["o_orderstatus"] != "ALL")]
    assert by_status["total_cents"].sum() == grand["total_cents"].iloc[0]


def test_skew_join_hot_and_cold_paths_agree(sf_dir):
    """Forcing every key hot (hot_k huge ⇒ threshold 0) and every key
    cold (hot_k=1 ⇒ nothing qualifies) must give identical results —
    routing is an execution detail, not a semantic one."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        skew_join_events_nation)

    all_cold = to_pandas(skew_join_events_nation(sf_dir, hot_k=1))
    default = to_pandas(skew_join_events_nation(sf_dir))
    # hot_k huge => threshold ~ a few rows => (nearly) every key routes
    # through the broadcast hot path
    all_hot = to_pandas(skew_join_events_nation(sf_dir, hot_k=5000))
    key = ["event_id"]
    a = all_cold.sort_values(key).reset_index(drop=True)
    b = default.sort_values(key).reset_index(drop=True)
    c = all_hot.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    pd.testing.assert_frame_equal(a[sorted(a.columns)], c[sorted(c.columns)])


def test_cumulative_spend_is_prefix_sum(sf_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        cumulative_spend)

    df = to_pandas(cumulative_spend(sf_dir))
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    one = orders[orders["o_custkey"] == orders["o_custkey"].iloc[0]]
    one = one.sort_values(["o_orderdate", "o_orderkey"])
    expect = (one["o_totalprice"] * 100).round().astype("int64").cumsum()
    got = df.set_index("o_orderkey").loc[one["o_orderkey"], "cum_cents"]
    assert got.tolist() == expect.tolist()


def test_dedup_editdist_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["dedup_editdist"](sf_dir)
    expected = duck.execute(em.oracle_sql()["dedup_editdist"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_editdist_pairs_hand_cases(ray_session):
    """Substitution, insertion and deletion variants pair up; distance-2
    strings must not, and duplicates collapse to distinct values first."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import editdist_pairs

    vals = ["cat", "cut", "cart", "at", "dog", "cat", "cast"]
    out = to_pandas(editdist_pairs(
        rd.from_arrow(pa.table({"surface": vals})).repartition(3)))
    pairs = set(map(tuple, out[["surface_a", "surface_b"]].values))
    assert ("cat", "cut") in pairs      # substitution
    assert ("cart", "cat") in pairs     # insertion/deletion
    assert ("at", "cat") in pairs       # deletion
    assert ("cast", "cat") in pairs
    assert not any("dog" in p for p in pairs)
    assert ("at", "cut") not in pairs   # distance 2
    assert len(out) == len(pairs)       # no duplicate pair rows


def test_kg_link_jaccard_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["kg_link_jaccard"](sf_dir)
    expected = duck.execute(em.oracle_sql()["kg_link_jaccard"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_neighborhood_jaccard_hand_graph(ray_session):
    """Square with diagonal: a-b, a-c, b-c, b-d, c-d. Edge (b,c) shares
    {a,d}: 2/(3+3-2)=0.5; edge (a,b) shares {c}: 1/(2+3-1)=0.25."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import neighborhood_jaccard

    t = pa.table({"norm_a": ["a", "a", "b", "b", "c"],
                  "norm_b": ["b", "c", "c", "d", "d"]})
    out = to_pandas(neighborhood_jaccard(rd.from_arrow(t).repartition(2)))
    out = out.set_index(["norm_a", "norm_b"])
    assert out.loc[("b", "c"), "common_neighbors"] == 2
    assert out.loc[("b", "c"), "jaccard_micro"] == 500000
    assert out.loc[("a", "b"), "common_neighbors"] == 1
    assert out.loc[("a", "b"), "jaccard_micro"] == 250000
    assert len(out) == 5


def test_ta_collocations_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["ta_collocations"](sf_dir)
    expected = duck.execute(em.oracle_sql()["ta_collocations"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_collocations_lift_semantics(ray_session):
    """Hand corpus: 'a b' always adjacent (perfect collocation, lift =
    nb/(ca*cb) scaled), 'x y' co-occur at chance across docs."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import collocations

    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["a b x", "a b y", "a b x", "a b y",
                          "a b x y", "a b y x"], pa.string()),
    })
    out = to_pandas(collocations(rd.from_arrow(docs).repartition(3),
                                 min_count=2)).set_index(["w1", "w2"])
    # 'a b': n=6, c_a=6, c_b=6, nb=14 -> (1e6*14*6)//36 = 2333333
    assert out.loc[("a", "b"), "n_pair"] == 6
    assert out.loc[("a", "b"), "lift_micro"] == 2333333
    # bigram below min_count is dropped
    assert ("x", "y") not in out.index or out.loc[("x", "y"), "n_pair"] >= 2


def test_new_operators_empty_inputs(ray_session):
    """Empty edge/doc/item streams must produce empty (or zero-count)
    results, not schema-less crashes — the sf0.001 tables can be tiny."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import editdist_pairs
    from fcrepo3_rdf_extractor_ray.stages.graph import (
        connected_components, neighborhood_jaccard, triangle_count)
    from fcrepo3_rdf_extractor_ray.stages.multimodal import (
        phash_neardup_pairs)
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import collocations

    edges = rd.from_arrow(pa.table({"norm_a": pa.array([], pa.string()),
                                    "norm_b": pa.array([], pa.string())}))
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                   "text": pa.array([], pa.string())}))
    items = rd.from_arrow(pa.table({"item_id": pa.array([], pa.int64()),
                                    "payload": pa.array([], pa.binary())}))
    assert connected_components(edges).count() == 0
    assert neighborhood_jaccard(edges).count() == 0
    assert triangle_count(edges)["n_triangles"].tolist() == [0]
    assert editdist_pairs(docs, col="text").count() == 0
    assert collocations(docs).count() == 0
    assert phash_neardup_pairs(items).count() == 0


@pytest.mark.parametrize("name", ["rel_retention", "ta_keywords"])
def test_retention_keywords_oracles(sf_dir, duck, name):
    import __ray_entry__ as em

    got = em.queries()[name](sf_dir)
    expected = duck.execute(em.oracle_sql()[name]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_cohort_retention_day_zero_is_cohort_size(sf_dir):
    """Every user is active on their own first day, so the offset-0 cell
    of each cohort equals the cohort's size."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        cohort_retention)

    df = to_pandas(cohort_retention(sf_dir))
    day0 = df[df["day_offset"] == 0].set_index("cohort")["n_users"]
    events = pd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
    first = events.groupby("user_id")["ts"].min().dt.normalize()
    sizes = first.value_counts()
    for cohort, n in day0.items():
        assert sizes[pd.Timestamp(cohort)] == n


def test_rel_history_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_history"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_history"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_event_type_history_run_semantics(sf_dir):
    """Runs are maximal, ordered, disjoint, and cover every event."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        event_type_history)

    hist = to_pandas(event_type_history(sf_dir))
    events = pd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "event_type",
                                      "ts"])
    assert hist["n_events"].sum() == len(events)
    one = events[events["user_id"] == events["user_id"].iloc[0]]
    one = one.sort_values(["ts", "event_id"])
    runs = (one["event_type"].ne(one["event_type"].shift())).cumsum()
    expect_runs = runs.nunique()
    got_runs = len(hist[hist["user_id"] == one["user_id"].iloc[0]])
    assert got_runs == expect_runs


def test_rel_window_distinct_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_window_distinct"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_window_distinct"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_kg_pagerank_weighted_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["kg_pagerank_weighted"](sf_dir)
    expected = duck.execute(em.oracle_sql()["kg_pagerank_weighted"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_pagerank_weighted_mass_follows_weight(ray_session):
    """Star a-b (weight 9) vs a-c (weight 1): b must outrank c, and with
    equal weights they tie."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import pagerank_weighted

    t = pa.table({"norm_a": ["a", "a"], "norm_b": ["b", "c"],
                  "n_pages": pa.array([9, 1], pa.int64())})
    r = (to_pandas(pagerank_weighted(rd.from_arrow(t), iters=3))
         .set_index("node")["rank_micro"])
    assert r["b"] > r["c"]
    t2 = pa.table({"norm_a": ["a", "a"], "norm_b": ["b", "c"],
                   "n_pages": pa.array([5, 5], pa.int64())})
    r2 = (to_pandas(pagerank_weighted(rd.from_arrow(t2), iters=3))
          .set_index("node")["rank_micro"])
    assert r2["b"] == r2["c"]


@pytest.mark.parametrize("name", ["dedup_containment", "rel_cume_dist"])
def test_containment_cumedist_oracles(sf_dir, duck, name):
    import __ray_entry__ as em

    got = em.queries()[name](sf_dir)
    expected = duck.execute(em.oracle_sql()[name]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_containment_is_asymmetric(ray_session):
    """A short doc fully quoted inside a long one: containment(short in
    long)=1.0 fires, the reverse stays below threshold, and symmetric
    Jaccard would have missed the pair entirely."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs)

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array([short, long_], pa.string())})
    ds = rd.from_arrow(docs)
    out = ngram_containment_pairs(ds, threshold=0.9).to_pandas()
    assert set(map(tuple, out[["doc_a", "doc_b"]].values)) == {(1, 2)}
    assert out["containment_micro"].iloc[0] == 1_000_000
    jac = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    assert len(jac) == 0  # symmetric measure misses the subset dup


def test_rel_unpivot_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_unpivot"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_unpivot"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_kg_entity_profile_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["kg_entity_profile"](sf_dir)
    expected = duck.execute(em.oracle_sql()["kg_entity_profile"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_prep_neardup_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["prep_neardup"](sf_dir)
    expected = duck.execute(em.oracle_sql()["prep_neardup"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_neardup_filter_keeps_one_per_cluster(sf_dir):
    """Survivors = corpus minus non-minimal cluster members: every
    near-dup cluster keeps exactly its min doc_id."""
    import duckdb as _d

    from fcrepo3_rdf_extractor_ray.pipelines.prep import (
        neardup_filter_corpus)

    kept = set(to_pandas(neardup_filter_corpus(sf_dir))["doc_id"])
    total = _d.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert len(kept) < total          # something was dropped
    assert len(kept) == len(set(kept))


def test_rel_first_order_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_first_order"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_first_order"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_rel_bucketed_join_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_bucketed_join"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_bucketed_join"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_bucketed_join_layout_is_resumable(sf_dir, tmp_path):
    """The bucketed write leaves one directory per bucket — the
    resumable unit — and every customer key lands in exactly the bucket
    its hash names."""
    import os

    import pyarrow.parquet as pq

    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        bucketed_join_orders_customer)

    root = str(tmp_path / "buckets")
    bucketed_join_orders_customer(sf_dir, bucket_root=root).count()
    cdirs = sorted(os.listdir(os.path.join(root, "customer")))
    assert len(cdirs) == 16 and all(d.startswith("bucket=") for d in cdirs)
    t = pq.read_table(os.path.join(root, "customer", "bucket=3"))
    assert (t["c_custkey"].to_pandas() % 16 == 3).all()


def test_dedup_incremental_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["dedup_incremental"](sf_dir)
    expected = duck.execute(em.oracle_sql()["dedup_incremental"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_dedup_incremental_planted_waves(ray_session):
    """Cross-wave dup dropped, in-wave dup keeps min id, fresh doc
    survives."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import dedup_incremental

    committed = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["old text a", "old text b"], pa.string())}))
    incoming = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": pa.array(["old text a",      # cross-wave dup -> dropped
                          "fresh text",      # survives
                          "fresh text",      # in-wave dup -> dropped
                          "another fresh"],  # survives
                         pa.string())}))
    out = to_pandas(dedup_incremental(committed, incoming))
    assert sorted(out["doc_id"]) == [11, 13]


def test_rel_zorder_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_zorder"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_zorder"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_zorder_locality_property():
    """Morton keys interleave correctly: z(x=0b11, y=0) == 0b0101 and
    nearby (x, y) cells share high bits (quadrant prefix)."""
    import numpy as np
    import pyarrow as pa

    from fcrepo3_rdf_extractor_ray.pipelines.relational import zorder_orders
    # pure-bit check against the engine's arithmetic, inline
    x = np.uint64(0b11); y = np.uint64(0)
    z = np.uint64(0)
    for b in range(16):
        z |= ((x >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
        z |= ((y >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
    assert int(z) == 0b0101


def test_ml_linreg_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["ml_linreg"](sf_dir)
    expected = duck.execute(em.oracle_sql()["ml_linreg"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_kg_entity_timeline_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["kg_entity_timeline"](sf_dir)
    expected = duck.execute(em.oracle_sql()["kg_entity_timeline"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_prep_report_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["prep_report"](sf_dir)
    expected = duck.execute(em.oracle_sql()["prep_report"]).df()
    assert len(expected) == 1
    assert_frames_equivalent(got, expected)
