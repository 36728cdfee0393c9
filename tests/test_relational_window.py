"""As-of join + range (interval) join — the time-series feature ops."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def events_dir(tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: purchase @0min, clicks @2,5min, purchase @9min,
        #         view @9.5min
        (1, 1, base, "purchase", 1.0, "{}"),
        (2, 1, base + dt.timedelta(minutes=2), "click", 0.0, "{}"),
        (3, 1, base + dt.timedelta(minutes=5), "click", 0.0, "{}"),
        (4, 1, base + dt.timedelta(minutes=9), "purchase", 2.0, "{}"),
        (5, 1, base + dt.timedelta(minutes=9, seconds=30), "view", 0.0, "{}"),
        # user 2: click @0, purchase @15min (click outside 10-min window)
        (6, 2, base, "click", 0.0, "{}"),
        (7, 2, base + dt.timedelta(minutes=15), "purchase", 3.0, "{}"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows]),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_last_purchase(events_dir, sf_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        asof_last_purchase)

    out = asof_last_purchase(events_dir).to_pandas().set_index("event_id")
    # first event of each user: no earlier purchase → sentinel
    assert out.loc[1, "gap_us"] == -1
    assert out.loc[6, "gap_us"] == -1
    # clicks after user 1's purchase @0
    assert out.loc[2, "gap_us"] == 2 * 60 * 1_000_000
    assert out.loc[3, "gap_us"] == 5 * 60 * 1_000_000
    # the 9-min purchase sees the @0 one (strictly earlier), not itself
    assert out.loc[4, "gap_us"] == 9 * 60 * 1_000_000
    # view @9.5min sees the 9-min purchase
    assert out.loc[5, "gap_us"] == 30 * 1_000_000
    # user 2's purchase: no earlier purchase for that user
    assert out.loc[7, "gap_us"] == -1


def test_range_join_attribution(events_dir, sf_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        range_join_attribution)

    out = range_join_attribution(events_dir).to_pandas().set_index("event_id")
    assert set(out.index) == {1, 4, 7}  # one row per purchase
    assert out.loc[1, "n_clicks"] == 0  # nothing before the first purchase
    assert out.loc[4, "n_clicks"] == 2  # clicks @2,5min inside (−10m, 9m)
    assert out.loc[7, "n_clicks"] == 0  # click @0 outside the 10-min window


@pytest.fixture()
def orders_dir(tmp_path):
    rng = np.random.RandomState(42)
    n = 400
    # few distinct prices -> heavy ties; rank must break them by orderkey
    prices = rng.choice([10.00, 10.00, 25.50, 99.99, 0.01], size=n)
    t = pa.table({
        "o_orderkey": pa.array(np.arange(n, 0, -1), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_global_rank_total_order_and_bucket_invariance(orders_dir):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        global_rank_orders)

    out = global_rank_orders(orders_dir, n_buckets=7).to_pandas()
    assert sorted(out["rnk"]) == list(range(1, 401))  # exact permutation
    df = pq.read_table(str(orders_dir) + "/orders.parquet").to_pandas()
    df["price_c"] = (df["o_totalprice"] * 100).round().astype("int64")
    expect = df.sort_values(["price_c", "o_orderkey"],
                            ascending=[False, True]).reset_index(drop=True)
    expect["rnk"] = np.arange(1, 401)
    merged = out.merge(expect[["o_orderkey", "rnk"]], on="o_orderkey",
                       suffixes=("", "_exp"))
    assert (merged["rnk"] == merged["rnk_exp"]).all()
    # rank is a property of the data, not of the partitioning knob
    out2 = global_rank_orders(orders_dir, n_buckets=64).to_pandas()
    m2 = out.merge(out2, on="o_orderkey", suffixes=("", "_b64"))
    assert (m2["rnk"] == m2["rnk_b64"]).all()


def test_full_outer_join_both_null_directions(tmp_path):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        full_outer_customer_orders)

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([2, 3], pa.int64()),
        "c_acctbal": pa.array([9000.0, 8000.0], pa.float64()),
    }), str(tmp_path / "customer.parquet"))
    out = (full_outer_customer_orders(str(tmp_path)).to_pandas()
           .sort_values("custkey").reset_index(drop=True))
    # 1: orders only (below-cutoff side absent) -> acctbal sentinel
    # 2: both sides; 3: rich customer with no orders -> n_orders 0
    assert out["custkey"].tolist() == [1, 2, 3]
    assert out["n_orders"].tolist() == [2, 1, 0]
    assert out["acctbal_c"].tolist() == [-1, 900000, 800000]


def test_time_window_peers_and_boundaries(tmp_path):
    """RANGE-frame semantics: equal timestamps are peers (all included,
    even 'later' rows); the window edge at exactly -60min is inclusive."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        time_window_spend)

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, 1.0),
        (2, 1, base + dt.timedelta(minutes=30), 2.0),
        # two peers at the same instant: each must see both
        (3, 1, base + dt.timedelta(minutes=90), 4.0),
        (4, 1, base + dt.timedelta(minutes=90), 8.0),
        # exactly 60min after the peers: they are still in range
        (5, 1, base + dt.timedelta(minutes=150), 16.0),
        # other user: isolated
        (6, 2, base + dt.timedelta(minutes=90), 32.0),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = (time_window_spend(str(tmp_path)).to_pandas()
           .set_index("event_id")["win_cents"])
    assert out[1] == 100
    assert out[2] == 300            # 0 and 30min both inside
    assert out[3] == 1400           # 30min + both peers (2+4+8)
    assert out[4] == 1400           # identical frame for the peer
    assert out[5] == 2800           # peers at exactly -60min inclusive
    assert out[6] == 3200           # other user unaffected


def test_grouped_quantiles_cont_matches_numpy(tmp_path):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        grouped_quantiles_cont)

    rng = np.random.RandomState(3)
    langs = ["en"] * 101 + ["de"] * 64   # odd and even group sizes
    chars = np.concatenate([rng.randint(10, 500, 101),
                            rng.randint(10, 500, 64)])
    pq.write_table(pa.table({
        "lang": pa.array(langs),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = (grouped_quantiles_cont(str(tmp_path)).to_pandas()
           .set_index("lang"))
    for lang, n in (("en", 101), ("de", 64)):
        vals = chars[:101] if lang == "en" else chars[101:]
        for q, col in ((0.25, "p25_micro"), (0.5, "p50_micro"),
                       (0.75, "p75_micro")):
            expect = int(np.floor(np.percentile(vals, q * 100,
                                                method="linear") * 1e6))
            assert out.loc[lang, col] == expect, (lang, col)


def test_range_window_sums_overflow_fallback_exact():
    """The packed-key fast path and the per-segment fallback must agree
    with a brute-force reference; the fallback engages (instead of
    silently wrapping int64) when segments × per-user span exceed the
    packable range."""
    import numpy as np

    from fcrepo3_rdf_extractor_ray.pipelines.relational import (
        _range_window_sums)

    rng = np.random.RandomState(11)
    delta = 1000

    def brute(tsv, gid, cents):
        out = np.empty(len(tsv), dtype=np.int64)
        for i in range(len(tsv)):
            m = (gid == gid[i]) & (tsv >= tsv[i] - delta) & (tsv <= tsv[i])
            out[i] = cents[m].sum()
        return out

    # normal magnitudes → fast path
    gid = np.sort(rng.randint(0, 7, size=200))
    tsv = np.concatenate([np.sort(rng.randint(0, 5000, size=(gid == g).sum()))
                          for g in np.unique(gid)]).astype(np.int64)
    cents = rng.randint(-50, 50, size=200).astype(np.int64)
    got = _range_window_sums(tsv, gid, cents, delta)
    assert (got == brute(tsv, gid, cents)).all()

    # huge per-user spans → gid*stride would wrap int64; the fallback
    # must produce the same exact sums
    big = np.int64(4_000_000_000_000_000_000)  # ~4.0e18 µs span
    tsv2 = np.concatenate([np.sort(rng.randint(0, 3, size=(gid == g).sum())
                                   .astype(np.int64)) + (g % 2) * big
                           for g in np.unique(gid)])
    assert int(gid.max()) * (int(big) + delta + 1) > np.iinfo(np.int64).max
    got2 = _range_window_sums(tsv2, gid, cents, delta)
    assert (got2 == brute(tsv2, gid, cents)).all()
