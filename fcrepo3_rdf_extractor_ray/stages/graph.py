"""Graph algorithms over the KG adjacency (entity→entity edges).

PageRank is the canonical "wide iterative" workload a KG engine owes its
users (the reference stops at materializing the graph; ranking its nodes
is the first thing a consumer does with it). The implementation is
Dataset-native end-to-end: each iteration is one hash join (ranks ⋈
edges) + one combiner-bounded groupby + one left-outer join back onto
the node set — no driver-side collection at any point, so the loop runs
at #edges scale.

All arithmetic is INTEGER (micro-units, floor division): integer sums
are order-independent, so the distributed result is bit-identical to the
sequential one and to the unrolled DuckDB oracle — float PageRank would
hash-drift under Ray's nondeterministic reduce order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .canonicalize import _safe_join_partitions


def _distinct(ds, cols: list[str], n_parts: int = 16):
    """Distinct rows via per-batch combiner → hash-partition → one
    vectorized Arrow group_by per partition (same shape as
    ``unique_norms`` — never one Python call per key)."""
    from ..functions.hashing import siphash64_batch

    def batch_distinct(t: pa.Table) -> pa.Table:
        g = t.select(cols).group_by(cols).aggregate([])
        h = siphash64_batch(g[cols[0]].to_pylist())
        part = pa.array((h % n_parts).astype(np.int32))
        return g.append_column("part", part)

    def part_distinct(t: pa.Table) -> pa.Table:
        g = t.group_by(["part"] + cols).aggregate([])
        return g.rename_columns(["part"] + cols)

    return (ds.map_batches(batch_distinct, batch_format="pyarrow")
            .groupby("part").map_groups(part_distinct, batch_format="pyarrow")
            .select_columns(cols))


def pagerank(edges_ds, iters: int = 5, damping_pct: int = 85,
             rank_scale: int = 1_000_000):
    """Integer PageRank over a (subj, obj) edge Dataset.

    Per iteration: ``r'(v) = base + (damping_pct · Σ_{u→v} r(u)//d(u)) // 100``
    with ``base = (rank_scale · (100 - damping_pct)) // 100``; dangling
    mass is dropped (the standard simplification). Returns the
    (node, rank_micro) Dataset after ``iters`` fixed iterations.
    """
    from ray.data.aggregate import Sum

    edges = _distinct(edges_ds, ["subj", "obj"]).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [c.combine_chunks() for c in (t["subj"], t["obj"])])})

    nodes = _distinct(edges.map_batches(both_ends, batch_format="pyarrow"),
                      ["node"]).materialize()
    n_join = _safe_join_partitions(nodes.count())

    # out-degree, joined onto the edge list ONCE (the edge table then
    # carries (subj, obj, d) through every iteration — no per-round
    # degree join)
    from ray.data.aggregate import Count

    deg = edges.groupby("subj").aggregate(Count())
    deg = deg.map_batches(
        lambda t: t.rename_columns(["dsubj", "d"]), batch_format="pyarrow")
    e3 = edges.join(deg, join_type="inner", num_partitions=n_join,
                    on=("subj",), right_on=("dsubj",)).materialize()

    base = (rank_scale * (100 - damping_pct)) // 100
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, rank_scale, dtype=np.int64))),
        batch_format="pyarrow").materialize()

    # nodes re-expressed as zero contributions: unioned into each round's
    # aggregate so in-link-less nodes keep their base rank without a
    # second (left-outer) join — one join + one groupby per iteration
    zero_rows = nodes.map_batches(
        lambda t: pa.table({
            "obj": t["node"],
            "inc": pa.array(np.zeros(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        side = e3.join(ranks, join_type="inner", num_partitions=n_join,
                       on=("subj",), right_on=("node",))

        def contrib(t: pa.Table) -> pa.Table:
            inc = pc.divide(t["r"], t["d"])  # int64 // int64 floor
            g = pa.table({"obj": t["obj"], "inc": inc}).group_by(
                ["obj"]).aggregate([("inc", "sum")])
            return g.rename_columns(["obj", "inc"])

        inc = (side.map_batches(contrib, batch_format="pyarrow")
               .union(zero_rows)
               .groupby("obj").aggregate(Sum("inc")))

        def apply_rank(t: pa.Table) -> pa.Table:
            r = pc.add(pa.scalar(base, pa.int64()),
                       pc.divide(pc.multiply(pa.scalar(damping_pct,
                                                       pa.int64()),
                                             t["sum(inc)"]),
                                 pa.scalar(100, pa.int64())))
            return pa.table({"node": t["obj"],
                             "r": pc.cast(r, pa.int64())})

        ranks = inc.map_batches(apply_rank,
                                batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: t.rename_columns(["node", "rank_micro"]),
        batch_format="pyarrow")
