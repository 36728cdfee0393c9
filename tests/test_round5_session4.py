"""Round-5 session-4 operator tests: DSIR importance selection and the
later batches added this session."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _dsir_corpus():
    """60 docs: 20 'en' docs over an en-distinctive vocabulary, 40 'de'
    docs over a disjoint one, plus 4 mixed docs that borrow en tokens.
    Importance must rank en-vocab docs above de-vocab docs."""
    rows = []
    for i in range(20):
        rows.append((i, f"alpha beta gamma tok{i % 3}", "en"))
    for i in range(20, 60):
        rows.append((i, f"zulu yankee xray tok{i % 3} extra", "de"))
    for i in range(60, 64):
        rows.append((i, "alpha beta gamma", "de"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def test_dsir_selects_target_like_docs(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import dsir_select

    df = _dsir_corpus()
    out = (dsir_select(rd.from_pandas(df).repartition(4), top_pct=25)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 64
    k = 64 * 25 // 100
    assert int(out["selected"].sum()) == k
    # en-vocab docs (incl. the de-labelled borrowers) outweigh de-vocab
    en_like = out[out["doc_id"].isin(list(range(20)) + [60, 61, 62, 63])]
    de_only = out[~out["doc_id"].isin(en_like["doc_id"])]
    assert en_like["weight"].min() > de_only["weight"].max()
    # selection = exact top-k by (weight DESC, doc_id ASC)
    ordered = out.sort_values(["weight", "doc_id"],
                              ascending=[False, True])
    assert set(ordered.head(k)["doc_id"]) == set(
        out[out["selected"]]["doc_id"])


def test_dsir_partition_invariance(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import dsir_select

    df = _dsir_corpus()
    a = (dsir_select(rd.from_pandas(df).repartition(1))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dsir_select(rd.from_pandas(df).repartition(7))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (a["weight"].to_numpy() == b["weight"].to_numpy()).all()
    assert (a["selected"].to_numpy() == b["selected"].to_numpy()).all()


def test_dsir_tie_break_and_bounds(ray_session):
    """Identical docs tie on weight: selection must break by doc_id
    ascending, and n_buckets outside [1,256] must raise."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import dsir_select

    df = pd.DataFrame({"doc_id": range(10),
                       "text": ["same text here"] * 10,
                       "lang": ["en"] * 10})
    out = (dsir_select(rd.from_pandas(df).repartition(3), top_pct=30)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["weight"].nunique() == 1
    assert out[out["selected"]]["doc_id"].tolist() == [0, 1, 2]
    with pytest.raises(ValueError):
        dsir_select(rd.from_pandas(df), n_buckets=0)


def _toy_facts():
    import pyarrow as pa

    return pa.table({
        "subj": ["a", "a", "b", "c", "c", "a"],
        "pred": ["p", "p", "p", "q", "q", "p"],
        "obj":  ["b", "c", "c", "a", "b", "b"],  # (a,p,b) duplicated
    })


def test_neg_samples_filtered_and_deterministic(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.pipelines.kg import negative_samples

    facts = rd.from_arrow(_toy_facts()).repartition(3)
    out = negative_samples(facts, k=4).to_pandas()
    # k * distinct-triples upper bound (5 distinct true triples)
    assert 0 < len(out) <= 4 * 5
    truth = {("a", "p", "b"), ("a", "p", "c"), ("b", "p", "c"),
             ("c", "q", "a"), ("c", "q", "b")}
    for r in out.itertuples():
        assert (r.subj, r.pred, r.neg_obj) not in truth
        assert (r.subj, r.pred, r.obj) in truth
        assert r.neg_obj in {"a", "b", "c"}
    # deterministic across partitionings
    out2 = negative_samples(rd.from_arrow(_toy_facts()).repartition(1),
                            k=4).to_pandas()
    key = ["subj", "pred", "obj", "slot"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert (a[key + ["neg_obj"]].values == b[key + ["neg_obj"]].values).all()


def test_neg_samples_paths_equivalent(ray_session):
    """Broadcast id→entity resolution vs the co-partitioned attach path
    (forced via broadcast_max_terms=0) must emit identical samples."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.pipelines.kg import negative_samples

    facts = rd.from_arrow(_toy_facts()).repartition(2)
    key = ["subj", "pred", "obj", "slot"]
    a = (negative_samples(facts, k=3).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (negative_samples(facts, k=3, broadcast_max_terms=0).to_pandas()
         .sort_values(key).reset_index(drop=True))
    assert len(a) == len(b)
    assert (a[key + ["neg_obj"]].values == b[key + ["neg_obj"]].values).all()


def test_harmonic_2hop_planted(ray_session):
    """Chain a->b->c->d plus direct a->c: c's in-rings are {b}=d1 and
    {a}=d1 (direct edge wins over the 2-hop path), d's are {c}=d1,
    {b}=d2. Self loop x->x contributes nothing."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import harmonic_2hop

    edges = pa.table({
        "subj": ["a", "b", "c", "a", "x"],
        "obj":  ["b", "c", "d", "c", "x"]})
    out = (harmonic_2hop(rd.from_arrow(edges).repartition(3))
           .to_pandas().set_index("node")["harmonic_x2"].to_dict())
    assert out == {
        "a": 0,
        "b": 2,          # d1={a}
        "c": 2 + 2,      # d1={b,a} (a is d1 via the direct edge), d2={}
        "d": 2 + 1 + 1,  # d1={c}, d2={b,a}
        "x": 0,          # self loop ignored
    }


def test_harmonic_2hop_partition_invariance(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import harmonic_2hop

    rng = np.random.default_rng(11)
    n = 400
    edges = pa.table({
        "subj": [f"n{int(i)}" for i in rng.integers(0, 60, n)],
        "obj": [f"n{int(i)}" for i in rng.integers(0, 60, n)]})
    a = (harmonic_2hop(rd.from_arrow(edges).repartition(1))
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (harmonic_2hop(rd.from_arrow(edges).repartition(8))
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert (a["node"] == b["node"]).all()
    assert (a["harmonic_x2"].to_numpy() == b["harmonic_x2"].to_numpy()).all()


def test_neardup_best_keeps_longest_not_min_id(ray_session, tmp_path):
    """Planted cluster where the LONGEST member has the larger id: the
    best-policy survivor differs from the min-id policy's."""
    import pyarrow.parquet as pq

    from fcrepo3_rdf_extractor_ray.pipelines.prep import neardup_best_corpus

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 7], pa.int64()),
        "text": [dup, dup, "totally different words entirely here now"],
        "n_chars": pa.array([10, 99, 40], pa.int64())})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (neardup_best_corpus(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [2, 7]  # 1 dropped, longest kept
    assert out["n_chars"].tolist() == [99, 40]
