"""Rolling window, anti-join, grouped top-k, pivot, HLL sketch — unit
tests against DuckDB oracles / exact references (the layer-1 pattern of
SURVEY.md §5)."""

import numpy as np
import pytest

from conftest import assert_frames_equivalent, to_pandas


def test_rolling_user_spend_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        rolling_user_spend)

    expected = duck.execute("""
        SELECT event_id, user_id, ts,
               sum(round(value * 100)::BIGINT)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::BIGINT
                   AS roll_cents
        FROM events""").df()
    assert_frames_equivalent(rolling_user_spend(sf_dir), expected)


def test_rolling_window_size_one_is_identity(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        rolling_user_spend)

    out = to_pandas(rolling_user_spend(sf_dir, window=1))
    expected = duck.execute(
        "SELECT event_id, round(value * 100)::BIGINT AS cents "
        "FROM events").df().set_index("event_id")
    got = out.set_index("event_id")["roll_cents"]
    assert (got == expected.loc[got.index, "cents"]).all()


def test_customers_without_orders_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        customers_without_orders)

    expected = duck.execute("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')""").df()
    assert len(expected) > 0  # the fixture must exercise the op
    assert_frames_equivalent(customers_without_orders(sf_dir), expected)


def test_top_orders_per_priority_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        top_orders_per_priority)

    expected = duck.execute("""
        SELECT o_orderpriority, rnk, o_orderkey, total_cents FROM (
          SELECT o_orderpriority, o_orderkey,
                 round(o_totalprice * 100)::BIGINT AS total_cents,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY round(o_totalprice * 100)::BIGINT DESC,
                            o_orderkey)::BIGINT AS rnk
          FROM orders) r WHERE rnk <= 3""").df()
    assert_frames_equivalent(top_orders_per_priority(sf_dir, k=3), expected)


def test_event_type_pivot_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        event_type_pivot)

    expected = duck.execute("""
        SELECT user_id,
               count(*) FILTER (event_type = 'click')::BIGINT    AS n_click,
               count(*) FILTER (event_type = 'error')::BIGINT    AS n_error,
               count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
               count(*) FILTER (event_type = 'signup')::BIGINT   AS n_signup,
               count(*) FILTER (event_type = 'view')::BIGINT     AS n_view,
               sum(round(value * 100)::BIGINT)::BIGINT           AS value_cents
        FROM events GROUP BY user_id""").df()
    assert_frames_equivalent(event_type_pivot(sf_dir), expected)


def test_hll_approx_distinct_within_tolerance(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        approx_distinct_users)

    got = to_pandas(approx_distinct_users(sf_dir)).set_index("event_type")
    exact = duck.execute(
        "SELECT event_type, count(DISTINCT user_id) AS n "
        "FROM events GROUP BY 1").df().set_index("event_type")
    for ty, n in exact["n"].items():
        est = got.loc[ty, "n_users_approx"]
        # 1.04/sqrt(m) ≈ 1.6% standard error at p=12; allow 4 sigma
        assert abs(est - n) <= max(3, 0.065 * n), (ty, est, n)


def test_stratified_sample_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        stratified_sample)

    expected = duck.execute("""
        SELECT doc_id, lang FROM documents
        WHERE substring(md5(text), 1, 2) <
              CASE lang WHEN 'en' THEN '40' WHEN 'de' THEN '20'
                        ELSE '10' END""").df()
    assert len(expected) > 0
    assert_frames_equivalent(stratified_sample(sf_dir), expected)


def test_stratified_sample_rates_shift_mix(sf_dir):
    """Raising a stratum's rate must strictly grow that stratum only."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        stratified_sample)

    low = to_pandas(stratified_sample(sf_dir, rates={"en": 16},
                                      default_bucket=16))
    high = to_pandas(stratified_sample(sf_dir, rates={"en": 128},
                                       default_bucket=16))
    n_en_low = (low["lang"] == "en").sum()
    n_en_high = (high["lang"] == "en").sum()
    assert n_en_high > n_en_low
    assert (low[low["lang"] != "en"]["doc_id"].sort_values().tolist()
            == high[high["lang"] != "en"]["doc_id"].sort_values().tolist())


def test_mention_cooccurrence_tiny_fixture(ray_session):
    """Two pages: (a,b,c) and (a,b) → pair counts {ab:2, ac:1, bc:1};
    duplicate mentions on one page must not inflate counts."""
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.ner import mention_cooccurrence

    rows = [("u1", "a"), ("u1", "b"), ("u1", "c"), ("u1", "a"),
            ("u2", "a"), ("u2", "b")]
    ds = rd.from_arrow(pa.table({
        "src_url": pa.array([r[0] for r in rows]),
        "surface": pa.array([r[1].upper() for r in rows]),
        "norm": pa.array([r[1] for r in rows]),
    }))
    got = {(r["norm_a"], r["norm_b"]): r["n_pages"]
           for r in mention_cooccurrence(ds).take_all()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_normalize_texts_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import normalize_texts
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    expected = duck.execute(
        "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)), "
        "'\\s+', ' ', 'g')) AS text_norm FROM documents").df()
    assert_frames_equivalent(normalize_texts(docs), expected)


def test_normalize_texts_edge_cases(ray_session):
    """NFC recomposition, case fold, tab/newline collapse, trim."""
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import normalize_texts

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        # "é" as e + combining acute must NFC-compose to single é
        "text": pa.array(["  Héllo\t WORLD \n", ""]),
    }))
    out = {r["doc_id"]: r["text_norm"]
           for r in normalize_texts(docs).take_all()}
    assert out == {1: "héllo world", 2: ""}


def test_grouped_quantiles_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        grouped_quantiles)

    expected = duck.execute(
        "SELECT source, quantile_disc(n_chars, 0.5)::BIGINT AS p50 "
        "FROM documents GROUP BY source").df()
    assert len(expected) > 1
    assert_frames_equivalent(grouped_quantiles(sf_dir), expected)


def test_grouped_quantiles_nondefault_q(sf_dir, duck):
    """ceil(q·n)-1 convention must hold away from the quartile
    coincidence points (q=0.3 diverges from floor(q·(n-1)))."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        grouped_quantiles)

    for q in (0.3, 0.9):
        expected = duck.execute(
            f"SELECT source, quantile_disc(n_chars, {q})::BIGINT "
            f"AS p{int(q * 100)} FROM documents GROUP BY source").df()
        assert_frames_equivalent(grouped_quantiles(sf_dir, q=q), expected)


def test_anti_join_no_matching_orders_returns_all_customers(sf_dir, duck):
    """Empty filtered-order side must not crash the join — every
    customer qualifies (the reviewed empty-Dataset edge case)."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        customers_without_orders)

    out = to_pandas(customers_without_orders(
        sf_dir, priority="NO-SUCH-PRIORITY"))
    n_cust = duck.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert len(out) == n_cust


def test_hll_rejects_unsafe_precision(sf_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        approx_distinct_users)

    with pytest.raises(ValueError):
        approx_distinct_users(sf_dir, p=10)


def test_hll_deterministic(sf_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        approx_distinct_users)

    a = to_pandas(approx_distinct_users(sf_dir)).sort_values(
        "event_type").reset_index(drop=True)
    b = to_pandas(approx_distinct_users(sf_dir)).sort_values(
        "event_type").reset_index(drop=True)
    assert a.equals(b)
