"""Funnel, rollup, except, lag-gaps, correlation stats, histogram,
repetition, bigrams, redaction, source stats — unit tests against DuckDB
oracles plus edge-case fixtures (the layer-1 pattern of SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from conftest import assert_frames_equivalent, to_pandas


def test_funnel_steps_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import funnel_steps

    expected = duck.execute("""
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t2
               FROM events e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts >= s1.t1
                 AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t3
               FROM events e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
                 AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY e.user_id)
        SELECT s1.user_id, t1, t2, t3,
               (1 + (t2 IS NOT NULL)::INT
                  + (t3 IS NOT NULL)::INT)::BIGINT AS step
        FROM s1 LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)""").df()
    assert len(expected) > 0
    assert_frames_equivalent(funnel_steps(sf_dir), expected)


def test_funnel_partial_steps(ray_session, tmp_path):
    """A user who clicks before signing up must stall at step 1; a
    purchase outside the conversion window must not count."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.pipelines.relational import funnel_steps

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: full funnel inside windows
        (1, t0, "signup"), (1, t0 + h, "click"), (1, t0 + 2 * h, "purchase"),
        # user 2: click BEFORE signup only → step 1
        (2, t0, "click"), (2, t0 + h, "signup"),
        # user 3: purchase 30h after click → outside 24h window → step 2
        (3, t0, "signup"), (3, t0 + h, "click"),
        (3, t0 + h + pd.Timedelta(hours=30), "purchase"),
        # user 4: never signs up → absent from output
        (4, t0, "click"), (4, t0 + h, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    path = tmp_path / "events.parquet"
    df.to_parquet(path)
    out = to_pandas(funnel_steps(str(tmp_path))).set_index("user_id")
    assert out.loc[1, "step"] == 3
    assert out.loc[2, "step"] == 1
    assert out.loc[3, "step"] == 2
    assert 4 not in out.index


def test_rollup_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        rollup_order_stats)

    expected = duck.execute("""
        SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents,
               count(*)::BIGINT AS n_orders
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""").df()
    assert_frames_equivalent(rollup_order_stats(sf_dir), expected)


def test_rollup_grand_total_equals_table(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        rollup_order_stats)

    out = to_pandas(rollup_order_stats(sf_dir))
    grand = out[(out.o_orderpriority == "ALL") & (out.o_orderstatus == "ALL")]
    n = duck.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert int(grand["n_orders"].iloc[0]) == n


def test_except_custkeys_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import except_custkeys

    expected = duck.execute("""
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderpriority = '5-LOW'""").df()
    assert len(expected) > 0
    assert_frames_equivalent(except_custkeys(sf_dir), expected)


def test_user_gap_stats_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import user_gap_stats

    expected = duck.execute("""
        WITH g AS (SELECT user_id,
                          epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id
                             ORDER BY ts, event_id) AS gap_us
                   FROM events)
        SELECT user_id, count(*)::BIGINT AS n_events,
               count(gap_us)::BIGINT AS n_gaps,
               max(gap_us)::BIGINT AS max_gap_us,
               sum(gap_us)::BIGINT AS sum_gap_us
        FROM g GROUP BY user_id""").df()
    assert_frames_equivalent(user_gap_stats(sf_dir), expected)


def test_user_gap_single_event_has_null_gaps(ray_session, tmp_path):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import user_gap_stats

    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [7, 7, 9],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-01"]).astype("datetime64[us]"),
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = to_pandas(user_gap_stats(str(tmp_path))).set_index("user_id")
    assert out.loc[9, "n_gaps"] == 0
    assert pd.isna(out.loc[9, "max_gap_us"])
    assert pd.isna(out.loc[9, "sum_gap_us"])
    assert out.loc[7, "sum_gap_us"] == 86_400_000_000


def test_corr_sufficient_stats_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        corr_sufficient_stats)

    expected = duck.execute("""
        SELECT l_returnflag, count(*)::BIGINT AS n_rows,
               sum(round(l_quantity * 100)::BIGINT)::BIGINT AS sum_x,
               sum(round(l_discount * 100)::BIGINT)::BIGINT AS sum_y,
               sum(round(l_quantity * 100)::BIGINT
                   * round(l_quantity * 100)::BIGINT)::BIGINT AS sum_xx,
               sum(round(l_quantity * 100)::BIGINT
                   * round(l_discount * 100)::BIGINT)::BIGINT AS sum_xy,
               sum(round(l_discount * 100)::BIGINT
                   * round(l_discount * 100)::BIGINT)::BIGINT AS sum_yy
        FROM lineitem GROUP BY l_returnflag""").df()
    assert_frames_equivalent(corr_sufficient_stats(sf_dir), expected)


def test_corr_stats_reproduce_duckdb_corr(sf_dir, duck):
    """The moment formula over the sufficient statistics must agree with
    DuckDB's native corr() to float precision."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        corr_sufficient_stats)

    out = to_pandas(corr_sufficient_stats(sf_dir))
    exp = duck.execute("""
        SELECT l_returnflag,
               corr(round(l_quantity * 100)::BIGINT,
                    round(l_discount * 100)::BIGINT) AS r
        FROM lineitem GROUP BY l_returnflag""").df().set_index("l_returnflag")
    for _, row in out.iterrows():
        n = row.n_rows
        cov = n * row.sum_xy - row.sum_x * row.sum_y
        vx = n * row.sum_xx - row.sum_x ** 2
        vy = n * row.sum_yy - row.sum_y ** 2
        r = cov / np.sqrt(float(vx) * float(vy))
        assert abs(r - exp.loc[row.l_returnflag, "r"]) < 1e-9


def test_orders_histogram_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import orders_histogram

    expected = duck.execute("""
        SELECT round(o_totalprice * 100)::BIGINT // 5000000 AS bucket,
               count(*)::BIGINT AS n_orders,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
        FROM orders GROUP BY 1""").df()
    assert len(expected) > 1  # must exercise >1 bin
    assert_frames_equivalent(orders_histogram(sf_dir), expected)


def test_repetition_stats_oracle(sf_dir, duck, docs_ds):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import repetition_stats

    expected = duck.execute("""
        WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
                      FROM documents),
        cnt AS (SELECT doc_id, tok, count(*) AS c
                FROM toks GROUP BY doc_id, tok)
        SELECT doc_id, sum(c)::BIGINT AS n_tokens,
               count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS top_count
        FROM cnt GROUP BY doc_id""").df()
    assert_frames_equivalent(repetition_stats(docs_ds), expected)


def test_repetition_pathological_whitespace(ray_session):
    """Double spaces / empty text must match str_split(' ') semantics:
    empty tokens COUNT (engine and oracle agree on any input)."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import repetition_stats

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a  b", "", "x x x"], pa.string()),
    }))
    out = to_pandas(repetition_stats(ds)).set_index("doc_id")
    # 'a  b' → ['a','','b'] = 3 tokens, 3 distinct
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "n_distinct"] == 3
    # '' → [''] = 1 empty token
    assert out.loc[2, "n_tokens"] == 1 and out.loc[2, "top_count"] == 1
    assert out.loc[3, "n_tokens"] == 3 and out.loc[3, "top_count"] == 3


def test_bigram_top_oracle(sf_dir, duck, docs_ds):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import bigram_top

    expected = duck.execute("""
        WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
        b AS (SELECT l[i] || ' ' || l[i + 1] AS bigram
              FROM t, unnest(range(1, len(l))) AS r(i))
        SELECT bigram, count(*)::BIGINT AS n FROM b GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20""").df()
    assert_frames_equivalent(bigram_top(docs_ds), expected)


def test_bigram_no_cross_document_pairs(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import bigram_top

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b", "c d"], pa.string()),
    }))
    out = to_pandas(bigram_top(ds, k=10))
    assert set(out["bigram"]) == {"a b", "c d"}  # never 'b c'


def test_redact_column_oracle(sf_dir, duck, ray_session):
    import os

    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import redact_column

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "props"])
    expected = duck.execute("""
        SELECT event_id,
               regexp_replace(props, '[0-9]+', '#', 'g') AS redacted
        FROM events""").df()
    # the fixture must actually contain digits to scrub
    assert (expected["redacted"].str.contains("#")).any()
    assert_frames_equivalent(redact_column(ev), expected)


def test_source_stats_oracle(sf_dir, duck, docs_ds):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import source_stats

    expected = duck.execute("""
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars,
               count(DISTINCT lang)::BIGINT AS n_langs
        FROM documents GROUP BY source""").df()
    assert_frames_equivalent(source_stats(docs_ds), expected)
