"""Bloom semi-join, exact heavy hitters (Misra-Gries two-pass),
last-value-wins compaction, hopping windows — oracle tests + the edge
cases the sf tables can't exercise (MG decrement, bloom false
positives, tie-breaks, window fan)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from conftest import assert_frames_equivalent, to_pandas


def test_semi_join_bloom_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_semi_join_bloom"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_semi_join_bloom"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_semi_join_bloom_false_positives_removed(ray_session, sf_dir):
    """A 64-bit filter with 4 hashes over hundreds of keys is
    saturated — nearly every probe is a bloom hit — so the exact
    verify pass must still produce the same rows as the broadcast
    semi-join."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        semi_join_orders, semi_join_orders_bloom)

    exact = to_pandas(semi_join_orders(sf_dir)).sort_values(
        "o_orderkey").reset_index(drop=True)
    tiny = to_pandas(semi_join_orders_bloom(sf_dir, m_bits=64)).sort_values(
        "o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        tiny[sorted(tiny.columns)], exact[sorted(exact.columns)])


def test_heavy_hitters_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_heavy_hitters"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_heavy_hitters"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_heavy_hitters_mg_decrement_path(ray_session):
    """Skewed synthetic stream with cardinality >> k forces the
    Misra-Gries decrement inside every batch; the two-pass design must
    still return the exact hitters (sketch error must not leak)."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.pipelines.relational import heavy_hitters

    rng = np.random.RandomState(7)
    # 300 distinct keys; key 0 takes ~40%, key 1 ~25%, rest uniform tail
    n = 6000
    keys = np.concatenate([
        np.zeros(2400, np.int64),
        np.ones(1500, np.int64),
        rng.randint(2, 300, n - 3900).astype(np.int64),
    ])
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(8)
    out = to_pandas(heavy_hitters(None, key="k", k=5, ds=ds))
    truth = pd.Series(keys).value_counts()
    expected = set(truth[truth > n // 5].index)
    assert set(out["k"]) == expected
    got = out.set_index("k")["n_events"]
    for k in expected:
        assert got[k] == truth[k]


def test_latest_event_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_latest_event"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_latest_event"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_latest_event_tiebreak_on_event_id(ray_session, tmp_path):
    """Two events with the identical timestamp: the higher event_id
    wins, deterministically, regardless of block layout."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        latest_event_per_user)

    ts = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": [ts, ts, ts - pd.Timedelta(hours=1)],
        "user_id": [7, 7, 7],
        "event_type": ["a", "b", "c"],
        "value": [1.0, 2.0, 3.0],
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = to_pandas(latest_event_per_user(str(tmp_path)))
    assert len(out) == 1
    assert out.iloc[0]["event_id"] == 2
    assert out.iloc[0]["event_type"] == "b"
    assert out.iloc[0]["value_cents"] == 200


def test_hopping_window_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["rel_hopping_window"](sf_dir)
    expected = duck.execute(em.oracle_sql()["rel_hopping_window"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_hopping_window_fan_and_tumbling(ray_session, tmp_path):
    """Every event lands in exactly size/stride windows, so total
    exploded count is fan × n; stride == size degenerates to a tumbling
    window with exactly n rows spread over disjoint windows."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        hopping_window_counts)

    base = pd.Timestamp("2024-03-01 00:00:00")
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": [base + pd.Timedelta(minutes=17 * i) for i in range(8)],
        "user_id": np.zeros(8, np.int64),
        "event_type": ["x"] * 8,
        "value": np.ones(8),
    })
    df.to_parquet(tmp_path / "events.parquet")
    hop = to_pandas(hopping_window_counts(str(tmp_path), size_hours=2,
                                          stride_hours=1))
    assert hop["n_events"].sum() == 2 * 8
    tumble = to_pandas(hopping_window_counts(str(tmp_path), size_hours=1,
                                             stride_hours=1))
    assert tumble["n_events"].sum() == 8
    # tumbling windows are disjoint: per-window sums reconstruct totals
    assert tumble["value_cents"].sum() == 800
