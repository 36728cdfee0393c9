"""Graph algorithms over the KG adjacency (entity→entity edges).

PageRank is the canonical "wide iterative" workload a KG engine owes its
users (the reference stops at materializing the graph; ranking its nodes
is the first thing a consumer does with it). Two execution modes:

- ``broadcast`` (default while the rank table fits a worker — it is
  #nodes ≈ #entities scale, orders of magnitude below the corpus): per
  iteration the rank table is ``ray.put`` once and every edge task reads
  it zero-copy (``pc.index_in`` + take — a vectorized broadcast join),
  then one combiner-bounded groupby sums contributions. One exchange
  per iteration; the edge list never re-shuffles. Measured 6× faster
  than the join mode at 500k edges (Ray 2.49's hash join costs ~14 s a
  round at that size).
- ``join``: fully Dataset-native hash-join rounds, no driver-side rank
  table anywhere — the path for graphs whose node set outgrows worker
  heap. Same arithmetic, bit-identical output (equivalence-tested).

All arithmetic is INTEGER (micro-units, floor division): integer sums
are order-independent, so the distributed result is bit-identical to the
sequential reference and to the unrolled DuckDB oracle — float PageRank
would hash-drift under Ray's nondeterministic reduce order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .canonicalize import _safe_join_partitions


def _distinct(ds, cols: list[str], n_parts: int | None = None):
    """Distinct rows via per-batch combiner → hash-partition → one
    vectorized Arrow group_by per partition (same shape as
    ``unique_norms`` — never one Python call per key)."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(0.5)
    from ..functions.hashing import fast_part_hash

    def batch_distinct(t: pa.Table) -> pa.Table:
        g = t.select(cols).group_by(cols).aggregate([])
        return g.append_column(
            "part", pa.array(fast_part_hash(g[cols[0]], n_parts)))

    def part_distinct(t: pa.Table) -> pa.Table:
        g = t.group_by(["part"] + cols).aggregate([])
        return g.rename_columns(["part"] + cols)

    return (ds.map_batches(batch_distinct, batch_format="pyarrow")
            .groupby("part").map_groups(part_distinct, batch_format="pyarrow")
            .select_columns(cols))


def _prepare(edges_ds):
    """Distinct edges, node set, and the edge table annotated with each
    subject's out-degree (joined ONCE — every iteration reuses it)."""
    from ray.data.aggregate import Count

    edges = _distinct(edges_ds, ["subj", "obj"]).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [c.combine_chunks() for c in (t["subj"], t["obj"])])})

    nodes = _distinct(edges.map_batches(both_ends, batch_format="pyarrow"),
                      ["node"]).materialize()
    n_join = _safe_join_partitions(nodes.count())
    deg = edges.groupby("subj").aggregate(Count())
    deg = deg.map_batches(
        lambda t: t.rename_columns(["dsubj", "d"]), batch_format="pyarrow")
    e3 = edges.join(deg, join_type="inner", num_partitions=n_join,
                    on=("subj",), right_on=("dsubj",)).materialize()
    return e3, nodes, n_join


def pagerank(edges_ds, iters: int = 5, damping_pct: int = 85,
             rank_scale: int = 1_000_000, mode: str = "auto",
             broadcast_max_nodes: int = 5_000_000, n_parts: int | None = None):
    """Integer PageRank over a (subj, obj) edge Dataset.

    Per iteration: ``r'(v) = base + (damping_pct · Σ_{u→v} r(u)//d(u)) // 100``
    with ``base = (rank_scale · (100 - damping_pct)) // 100``; dangling
    mass is dropped (the standard simplification). Returns the
    (node, rank_micro) Dataset after ``iters`` fixed iterations.
    """
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    e3, nodes, n_join = _prepare(edges_ds)
    if mode == "auto":
        mode = ("broadcast" if nodes.count() <= broadcast_max_nodes
                else "join")
    base = (rank_scale * (100 - damping_pct)) // 100
    if mode == "broadcast":
        ranks = _pagerank_broadcast(e3, nodes, iters, damping_pct,
                                    rank_scale, base, n_parts)
    else:
        ranks = _pagerank_join(e3, nodes, n_join, iters, damping_pct,
                               rank_scale, base)
    return ranks.map_batches(
        lambda t: t.rename_columns(["node", "rank_micro"]),
        batch_format="pyarrow")


def _collect_table(ds, schema: pa.Schema) -> pa.Table:
    """Concatenate a small Dataset's blocks into one Arrow table,
    skipping the schema-less zero-row blocks Ray emits for empty
    partitions (they break ``pa.concat_tables``). Ray 2.49's
    ``to_arrow_refs`` passes PANDAS blocks through unconverted (incl.
    the no-column empties pandas map stages emit) — convert those here.
    Every block is cast to ``schema`` so mixed-lineage blocks concat."""
    import pandas as pd

    tabs = []
    for b in ray.get(ds.to_arrow_refs()):
        if isinstance(b, pd.DataFrame):
            if not len(b) or not len(b.columns):
                continue
            b = pa.Table.from_pandas(b, preserve_index=False)
        if not b.num_rows or not b.num_columns:
            continue
        tabs.append(b.select(schema.names).cast(schema))
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs).combine_chunks()


def _part_of(col: pa.ChunkedArray, n_parts: int) -> pa.Array:
    from ..functions.hashing import fast_part_hash

    return pa.array(fast_part_hash(col, n_parts))


def _pagerank_broadcast(e3, nodes, iters, damping_pct, rank_scale, base,
                        n_parts):
    """Broadcast-rank rounds: rank table shipped via the object store
    once per iteration (#nodes scale), edges mapped in place, one
    part-hash exchange with a vectorized per-partition sum."""
    import ray.data as rd

    # in-link-less nodes as zero contributions (keeps them at base rank
    # without a second pass); partitioned once, reused every round
    zero_rows = nodes.map_batches(
        lambda t: pa.table({
            "obj": t["node"],
            "inc": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "part": _part_of(t["node"], n_parts)}),
        batch_format="pyarrow").materialize()

    rank_tbl = _collect_table(nodes, pa.schema([("node", pa.string())]))
    rank_tbl = rank_tbl.append_column(
        "r", pa.array(np.full(rank_tbl.num_rows, rank_scale,
                              dtype=np.int64)))

    def final_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["obj"]).aggregate([("inc", "sum")])
        g = g.rename_columns(["node", "s"])
        r = pc.add(pa.scalar(base, pa.int64()),
                   pc.divide(pc.multiply(pa.scalar(damping_pct, pa.int64()),
                                         g["s"]),
                             pa.scalar(100, pa.int64())))
        return pa.table({"node": g["node"], "r": pc.cast(r, pa.int64())})

    for _ in range(iters):
        rank_ref = ray.put(rank_tbl)

        def contrib(t: pa.Table) -> pa.Table:
            rt = ray.get(rank_ref)  # zero-copy object-store read
            idx = pc.index_in(t["subj"], value_set=rt["node"])
            inc = pc.divide(pc.take(rt["r"], idx), t["d"])  # floor div
            g = pa.table({"obj": t["obj"], "inc": inc}).group_by(
                ["obj"]).aggregate([("inc", "sum")])
            g = g.rename_columns(["obj", "inc"])
            return g.append_column("part", _part_of(g["obj"], n_parts))

        new_ranks = (e3.map_batches(contrib, batch_format="pyarrow",
                                    batch_size=None)
                     .union(zero_rows)
                     .groupby("part")
                     .map_groups(lambda t: final_sum(t),
                                 batch_format="pyarrow"))
        rank_tbl = _collect_table(
            new_ranks, pa.schema([("node", pa.string()),
                                  ("r", pa.int64())]))
    return rd.from_arrow(rank_tbl)


def _pagerank_join(e3, nodes, n_join, iters, damping_pct, rank_scale,
                   base):
    """Join-mode rounds: ranks stay a Dataset end-to-end (no driver-side
    rank table) — one hash join + one combiner groupby per iteration."""
    from ray.data.aggregate import Sum

    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, rank_scale, dtype=np.int64))),
        batch_format="pyarrow").materialize()

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

        inc = (side.map_batches(contrib, batch_format="pyarrow",
                                batch_size=None)
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
    return ranks


def degree_distribution(edges_ds, node_col: str = "subj"):
    """Graph DEGREE DISTRIBUTION: out-degree per node, then the
    histogram of degrees — the first profiling query over any extracted
    knowledge graph (power-law check, supernode detection for salt
    planning). Two chained partial/final aggregations: the edge stream
    is combined per batch before each exchange, and the second exchange
    carries at most one row per distinct degree per block — bytes, not
    edges, regardless of graph size."""
    from ray.data.aggregate import Sum

    import numpy as np

    def count_part(t: pa.Table) -> pa.Table:
        g = pa.table({
            node_col: t[node_col],
            "deg": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(node_col).aggregate([("deg", "sum")])
        return g.rename_columns([node_col, "deg"])

    degrees = (edges_ds.map_batches(count_part, batch_format="pyarrow")
               .groupby(node_col).aggregate(Sum("deg")))

    def hist_part(t: pa.Table) -> pa.Table:
        g = pa.table({
            "degree": t["sum(deg)"],
            "n_nodes": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by("degree").aggregate([("n_nodes", "sum")])
        return g.rename_columns(["degree", "n_nodes"])

    g = (degrees.map_batches(hist_part, batch_format="pyarrow")
         .groupby("degree").aggregate(Sum("n_nodes")))
    return g.map_batches(
        lambda t: t.rename_columns(["degree", "n_nodes"]),
        batch_format="pyarrow")


def bfs_reachability(facts_ds, seed_pred: str = "kg:acquired",
                     max_hops: int = 3, mode: str = "auto",
                     n_parts: int | None = None,
                     max_driver_frontier: int = 200_000):
    """Bounded multi-hop BFS over the entity graph: every node reachable
    within ``max_hops`` edges from the seed set (subjects of
    ``seed_pred`` facts), labeled with its MINIMUM hop distance — the
    "expand a seed list through the graph" primitive behind KG
    enrichment and taint/influence propagation.

    Auto-routed like ``minhash_clusters``: ``mode="driver"`` keeps the
    frontier on the driver (one ``ray.put`` broadcast + ``pc.is_in``
    semi-join per hop — lowest latency, right for seeded-entity
    queries whose frontier is entity-scale); ``mode="ds"`` keeps
    frontier AND visited set as Datasets end-to-end — per hop one
    co-partitioned tag-union semi-join (frontier rows ride the edge
    exchange, the ``_attach_val`` idiom) expands, and one node-hash
    anti-join exchange subtracts the visited set, so driver traffic is
    a per-hop COUNT scalar no matter how wide the frontier gets (a
    hop-2 web-graph frontier is not driver-sized). ``mode="auto"``
    routes by edge count vs ``max_driver_frontier`` (the frontier is
    bounded by the distinct-node count, itself edge-bounded).
    Output: ``(node, hops)`` with hops 0 for the seeds themselves;
    driver mode returns pandas, ds mode a Dataset."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(0.5)

    edges = facts_ds.map_batches(
        lambda t: pa.table({"a": t["subj"], "b": t["obj"]}),
        batch_format="pyarrow").materialize()

    def seed_partial(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["pred"], seed_pred))
        return pa.table({"node": pc.unique(m["subj"])})

    if mode == "auto":
        mode = "driver" if edges.count() <= max_driver_frontier else "ds"

    if mode == "ds":
        return _bfs_ds(edges,
                       facts_ds.map_batches(seed_partial,
                                            batch_format="pyarrow"),
                       max_hops, n_parts)

    seed_df = (facts_ds.map_batches(seed_partial, batch_format="pyarrow")
               .to_pandas())
    seeds = seed_df["node"] if "node" in seed_df.columns else []
    visited: dict[str, int] = {s: 0 for s in seeds}
    frontier = list(visited)

    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        fr_ref = ray.put(pa.array(frontier, pa.string()))

        def nxt(t: pa.Table) -> pa.Table:
            fr = ray.get(fr_ref)
            m = t.filter(pc.is_in(t["a"], value_set=fr))
            return pa.table({"node": pc.unique(m["b"])})

        cand = edges.map_batches(nxt, batch_format="pyarrow").to_pandas()
        found = (cand["node"].unique() if "node" in cand.columns else [])
        frontier = [n for n in found if n not in visited]
        for n in frontier:
            visited[n] = hop

    return pd.DataFrame({"node": list(visited),
                         "hops": pd.array(list(visited.values()),
                                          dtype="int64")})


def _bfs_ds(edges, seeds_ds, max_hops: int, n_parts: int):
    """Dataset-native bounded BFS: frontier and visited set never touch
    the driver. Per hop: (1) frontier rows tag-union onto the
    subj-hash edge exchange; each partition expands its local frontier
    members' out-edges to candidate nodes (distinct per partition);
    (2) candidates anti-join the visited set on a node-hash exchange
    (max-flag fold: a node seen with a visited row is dropped). Both
    visited and frontier are repartitioned before each per-hop
    materialize (bounded block counts in iterative loops)."""
    from ..functions.hashing import fast_part_hash

    seeds = _distinct(seeds_ds, ["node"], n_parts=n_parts)
    visited = seeds.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "hops": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow").repartition(n_parts).materialize()
    frontier = visited

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["a"], "pay": t["b"],
            "part": pa.array(fast_part_hash(t["a"], n_parts))})

    edges_tagged = edges.map_batches(tag_edge,
                                     batch_format="pyarrow").materialize()

    for hop in range(1, max_hops + 1):
        def tag_fr(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t["node"], "pay": pa.nulls(t.num_rows, pa.string()),
                "part": pa.array(fast_part_hash(t["node"], n_parts))})

        def expand(t: pa.Table) -> pa.Table:
            is_fr = pc.is_null(t["pay"])
            fr = pc.unique(t.filter(is_fr)["k"])
            e = t.filter(pc.invert(is_fr))
            got = pc.unique(e.filter(pc.is_in(e["k"],
                                              value_set=fr))["pay"])
            return pa.table({"node": got,
                             "vis": pa.array(np.zeros(len(got),
                                                      np.int8))})

        cand = (edges_tagged
                .union(frontier.map_batches(tag_fr,
                                            batch_format="pyarrow"))
                .groupby("part").map_groups(expand,
                                            batch_format="pyarrow"))

        def tag_vis(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "vis": pa.array(np.ones(t.num_rows, np.int8))})

        def unseen(t: pa.Table) -> pa.Table:
            g = (t.select(["node", "vis"]).group_by("node")
                 .aggregate([("vis", "max")]))
            return pa.table(
                {"node": g.filter(pc.equal(g["vis_max"], 0))["node"]})

        def tag_node(t: pa.Table) -> pa.Table:
            return t.append_column(
                "part", pa.array(fast_part_hash(t["node"], n_parts)))

        new = ((cand.union(visited.map_batches(tag_vis,
                                               batch_format="pyarrow")))
               .map_batches(tag_node, batch_format="pyarrow")
               .groupby("part").map_groups(unseen,
                                           batch_format="pyarrow")
               .repartition(n_parts)).materialize()
        if new.count() == 0:
            break
        new_lab = new.map_batches(
            lambda t, h=hop: pa.table({
                "node": t["node"],
                "hops": pa.array(np.full(t.num_rows, h, np.int64))}),
            batch_format="pyarrow")
        visited = (visited.union(new_lab)
                   .repartition(n_parts)).materialize()
        frontier = new_lab

    return visited


def connected_components(edges_ds, a_col: str = "norm_a",
                         b_col: str = "norm_b", n_parts: int | None = None,
                         levels: int = 3,
                         small_graph_edges: int = 200_000):
    """CONNECTED COMPONENTS of an undirected graph — the clustering
    closure behind near-dup group labeling and entity-graph community
    seeding. Component label = the MINIMUM node id in the component.

    Geometric-contraction distributed union-find (the classic
    contract-and-relabel scheme — cf. Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14):

    1. hash-partition the edges into ``n_parts`` groups; each group runs
       a LOCAL union-find (int-rank parent array over factorized names —
       O(E·α) per task) and emits its (node → local min-root) star map;
    2. CONTRACT: group the star map by node; a node seen with k > 1
       distinct roots emits k-1 (min-root, other-root) boundary edges —
       nodes whose roots already agree exit the loop here, so the edge
       set shrinks to boundary scale each level;
    3. the FINAL level runs one single-partition union-find over the
       fully-contracted boundary edges (exactness does not depend on
       how many contraction levels ran — whatever survives is glued
       here), then labels RELABEL back down through the saved per-level
       star maps via co-partitioned tag-union merges (key = root).

    Everything is lazy Datasets; total exchanges = ``levels`` groupbys
    up + ``levels - 1`` merges down, independent of graph diameter (the
    old min-label-flooding path needed O(diameter) rounds of shuffles —
    53 s on a 30-node path; this runs the same graph in ~8 s).

    SCALE ASSUMPTION (documented per the custom-operator rule): the
    final level funnels the twice-contracted boundary-edge set through
    one task — ~#cross-partition component links after two contractions,
    which for entity graphs is far below the corpus scale (same
    #entities-bound as SURVEY.md §7.4). Raise ``levels`` / ``n_parts``
    if a pathological graph (giant matching spread across partitions)
    keeps the contracted set large."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(0.5)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    def _tag(col_vals, parts: int) -> pa.Array:
        if parts == 1:
            return pa.array(np.zeros(len(col_vals), np.int32))
        return pa.array(fast_part_hash(col_vals, parts))

    def local_uf(df: pd.DataFrame) -> pd.DataFrame:
        """Union-find over one partition's edges → (node, root) for every
        distinct name; root = lexicographic-min name of the local
        component. Names are factorized to ints and compared by RANK
        (argsort of the uniques) so the hot loop never touches strings."""
        codes, uniques = pd.factorize(
            pd.concat([df["a"], df["b"]], ignore_index=True))
        names = np.asarray(uniques, dtype=object)
        order = np.argsort(names)
        rank_of_code = np.empty(len(names), dtype=np.int64)
        rank_of_code[order] = np.arange(len(names))
        n = len(df)
        ea = rank_of_code[codes[:n]]
        eb = rank_of_code[codes[n:]]
        parent = np.arange(len(names), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != x:
                parent[x], x = root, parent[x]
            return root

        for x, y in zip(ea.tolist(), eb.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                if ry < rx:
                    rx, ry = ry, rx
                parent[ry] = rx  # min-rank = min-name root

        roots = np.array([find(r) for r in range(len(names))],
                         dtype=np.int64)
        name_by_rank = names[order]
        return pd.DataFrame({"node": name_by_rank,
                             "root": name_by_rank[roots]})

    def boundary(df: pd.DataFrame) -> pd.DataFrame:
        """Contract, fused with the star-map dedup (both need the same
        node-keyed exchange): per node, anchor = min of its partition-
        local roots. Emits kind=1 (anchor, other-root) boundary edges
        for disagreeing roots — agreeing nodes exit the loop — AND
        kind=0 deduped (node, anchor) star rows, one per node, so the
        relabel pass later needs no final distinct."""
        anchor = df.groupby("node")["root"].transform("min")
        mask = (df["root"] != anchor).to_numpy()
        eout = pd.DataFrame({"node": anchor.to_numpy()[mask],
                             "root": df["root"].to_numpy()[mask]
                             }).drop_duplicates()
        eout["kind"] = np.ones(len(eout), dtype=np.int8)
        sout = df.assign(root=anchor).drop_duplicates("node")[
            ["node", "root"]]
        sout["kind"] = np.zeros(len(sout), dtype=np.int8)
        return pd.concat([sout, eout], ignore_index=True)

    def uf_level(edge_ds, parts: int):
        def tag_edges(t: pa.Table) -> pa.Table:
            return t.append_column("part", _tag(t["a"], parts))

        return (edge_ds.map_batches(tag_edges, batch_format="pyarrow")
                .groupby("part").map_groups(local_uf,
                                            batch_format="pandas"))

    def contract(star_ds):
        def tag_nodes(t: pa.Table) -> pa.Table:
            return t.append_column("part", _tag(t["node"], n_parts))

        both = (star_ds.map_batches(tag_nodes, batch_format="pyarrow")
                .groupby("part").map_groups(boundary,
                                            batch_format="pandas")
                .materialize())
        stars = both.map_batches(
            lambda t: (t.filter(pc.equal(t["kind"], 0))
                       .select(["node", "root"])),
            batch_format="pyarrow")
        edges = both.map_batches(
            lambda t: pa.table({
                "a": t.filter(pc.equal(t["kind"], 1))["node"],
                "b": t.filter(pc.equal(t["kind"], 1))["root"]}),
            batch_format="pyarrow")
        return stars, edges

    def relabel(star_ds, lab_ds):
        """node's final label = lab[root] (fallback: root itself — a root
        absent from the upper level had no cross-partition merge left).
        Co-partitioned tag-union merge keyed on root; no joins."""

        def tag_m(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t["root"], "node": t["node"],
                "lab": pa.nulls(t.num_rows, pa.string()),
                "part": _tag(t["root"], n_parts)})

        def tag_l(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t["node"], "node": pa.nulls(t.num_rows, pa.string()),
                "lab": t["root"],
                "part": _tag(t["node"], n_parts)})

        tagged = (star_ds.map_batches(tag_m, batch_format="pyarrow")
                  .union(lab_ds.map_batches(tag_l,
                                            batch_format="pyarrow")))

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            lab = (df.loc[df["lab"].notna(), ["k", "lab"]]
                   .drop_duplicates("k").set_index("k")["lab"])
            rows = df.loc[df["node"].notna(), ["k", "node"]]
            got = rows["k"].map(lab).fillna(rows["k"])
            return pd.DataFrame({"node": rows["node"].to_numpy(),
                                 "root": got.to_numpy()})

        return tagged.groupby("part").map_groups(merge,
                                                 batch_format="pandas")

    edges = edges_ds.map_batches(to_ab,
                                 batch_format="pyarrow").materialize()
    if edges.count() <= small_graph_edges:
        # SMALL-GRAPH FAST PATH: below ~10 MB of edges the contraction
        # pipeline's 2·levels exchange latencies dominate; one exact
        # single-task union-find (the same final-level primitive) does
        # the whole job in ONE exchange. Entity-scale graphs (alias
        # maps, per-corpus co-occurrence) all take this path; the
        # contraction path engages for web-scale edge lists.
        return uf_level(edges, 1).map_batches(
            lambda t: t.rename_columns(["node", "component"]),
            batch_format="pyarrow")

    star_maps = []
    for lvl in range(max(1, levels) - 1):
        raw_stars = uf_level(edges, n_parts)
        stars, edges = contract(raw_stars)  # stars: one row per node
        star_maps.append(stars)
    labels = uf_level(edges, 1)  # exact: all surviving edges in one task
    for stars in reversed(star_maps):
        labels = relabel(stars, labels)
    # star maps are node-unique (deduped inside contract), so relabel
    # output is already one row per node — rename and done
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")


def triangle_count(edges_ds, a_col: str = "norm_a", b_col: str = "norm_b",
                   n_parts: int | None = None):
    """Global TRIANGLE COUNT over an oriented (a < b) undirected edge
    set — the standard graph-quality / community-density metric over the
    entity co-occurrence graph.

    Wedge-then-verify, all co-partitioned merges (no join operator):

    1. distinct oriented edges, hash-partitioned on the LOW endpoint so
       each hub's full neighbor list co-locates;
    2. per hub, emit its wedges — all (v, w) neighbor pairs with v < w
       (numpy ``triu_indices`` per hub, vectorized);
    3. tag-union the wedges with the edge set keyed on the (v, w) pair,
       co-partition on the pair hash, count wedge rows whose pair exists
       as an edge (each triangle u<v<w is found exactly once: wedge at
       hub u, closing edge (v, w));
    4. one scalar Sum aggregate.

    SKEW NOTE: a hub of degree d emits d(d-1)/2 wedges, so a single hot
    entity inflates one partition. For corpora with power-law hubs,
    split hot neighbor lists (salt the wedge emit per neighbor-chunk
    pair) or cap/degree-sample hubs before this stage; on the test
    corpora the max co-occurrence degree is bounded by mentions-per-page
    fan-in and needs neither. Returns a 1-row pandas frame
    ``(n_triangles)``."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def tag_hub(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(fast_part_hash(t["a"], n_parts)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("a"):
            nb = np.sort(grp["b"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"v": nb[i], "w": nb[j]}))
        if not outs:
            return pd.DataFrame({"v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "is_edge": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["is_edge"] = np.zeros(len(out), dtype=np.int64)
        return out

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["a"], "w": t["b"],
                         "is_edge": pa.array(np.ones(t.num_rows, np.int64))})

    def tag_pair(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["v"], t["w"], "\x1f")
        return t.append_column(
            "part", pa.array(fast_part_hash(key, n_parts)))

    wedge_ds = (edges.map_batches(tag_hub, batch_format="pyarrow")
                .groupby("part").map_groups(wedges, batch_format="pandas"))
    tagged = (wedge_ds.map_batches(tag_pair, batch_format="pyarrow")
              .union(edges.map_batches(edge_rows, batch_format="pyarrow")
                     .map_batches(tag_pair, batch_format="pyarrow")))

    def close(df: pd.DataFrame) -> pd.DataFrame:
        have = df.loc[df["is_edge"] == 1, ["v", "w"]]
        keys = set(zip(have["v"], have["w"]))
        wdg = df.loc[df["is_edge"] == 0, ["v", "w"]]
        n = sum(1 for p in zip(wdg["v"], wdg["w"]) if p in keys)
        return pd.DataFrame({"n": pd.array([n], dtype="int64")})

    from ray.data.aggregate import Sum

    total = (tagged.groupby("part").map_groups(close, batch_format="pandas")
             .aggregate(Sum("n")))
    return pd.DataFrame({"n_triangles":
                         pd.array([total["sum(n)"] or 0], dtype="int64")})


def neighborhood_jaccard(edges_ds, a_col: str = "norm_a",
                         b_col: str = "norm_b", n_parts: int | None = None):
    """LINK-PREDICTION neighborhood overlap: for every existing edge
    (a, b), the number of common neighbors and the Jaccard similarity of
    the two endpoints' neighbor sets — the classic structural-relatedness
    score layered on the co-occurrence graph.

    All-integer contract: ``jaccard_micro = (1_000_000 · cn) // (deg(a)
    + deg(b) - cn)`` (common neighbors never include a or b themselves;
    the denominator is |N(a) ∪ N(b)| with both endpoints counted, as in
    the standard formulation over adjacency sets).

    Shape: wedge counting (same hub-partitioned ``triu_indices`` emit as
    ``triangle_count``, over the UNDIRECTED adjacency so wedges at every
    hub are seen) → one pair-keyed merge that counts wedges per existing
    edge (zero-filled) → two degree-attach co-partitioned merges. Four
    bounded exchanges; the hot-hub Σd² wedge bound and its salting
    mitigation are the same as ``triangle_count``."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def undirect(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([t["a"].combine_chunks(),
                                   t["b"].combine_chunks()]),
            "v": pa.concat_arrays([t["b"].combine_chunks(),
                                   t["a"].combine_chunks()])})

    und = edges.map_batches(undirect, batch_format="pyarrow").materialize()

    # --- degrees: combiner → one bounded exchange ---
    def deg_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"u": t["u"],
                      "d": pa.array(np.ones(t.num_rows, np.int64))}
                     ).group_by("u").aggregate([("d", "sum")])
        g = g.rename_columns(["u", "d"])
        return g.append_column("part", pa.array(fast_part_hash(g["u"],
                                                               n_parts)))

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("u", as_index=False)["d"].sum()

    deg = (und.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("part").map_groups(deg_final, batch_format="pandas")
           .materialize())

    # --- wedges at every hub of the undirected adjacency ---
    def tag_hub(t: pa.Table) -> pa.Table:
        return t.append_column("part",
                               pa.array(fast_part_hash(t["u"], n_parts)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("u"):
            nb = np.sort(grp["v"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"v": nb[i], "w": nb[j]}))
        if not outs:
            return pd.DataFrame({"v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "kind": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["kind"] = np.zeros(len(out), dtype=np.int64)
        return out

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["a"], "w": t["b"],
                         "kind": pa.array(np.ones(t.num_rows, np.int64))})

    def tag_pair(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["v"], t["w"], "\x1f")
        return t.append_column("part",
                               pa.array(fast_part_hash(key, n_parts)))

    tagged = (und.map_batches(tag_hub, batch_format="pyarrow")
              .groupby("part").map_groups(wedges, batch_format="pandas")
              .map_batches(tag_pair, batch_format="pyarrow")
              .union(edges.map_batches(edge_rows, batch_format="pyarrow")
                     .map_batches(tag_pair, batch_format="pyarrow")))

    def count_cn(df: pd.DataFrame) -> pd.DataFrame:
        wdg = df[df["kind"] == 0]
        cnt = wdg.groupby(["v", "w"]).size()
        ed = df.loc[df["kind"] == 1, ["v", "w"]]
        keys = pd.MultiIndex.from_frame(ed)
        cn = cnt.reindex(keys).fillna(0).astype("int64").to_numpy()
        return pd.DataFrame({"a": ed["v"].to_numpy(),
                             "b": ed["w"].to_numpy(), "cn": cn})

    with_cn = tagged.groupby("part").map_groups(count_cn,
                                                batch_format="pandas")

    def attach_deg(pairs_ds, key: str, out: str):
        def tag_p(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "k", pc.cast(t[key], pa.string()))
            return t.append_column(
                "part", pa.array(fast_part_hash(t["k"], n_parts)))

        def tag_d(t: pa.Table) -> pa.Table:
            cols = {"k": t["u"], "dd": pc.cast(t["d"], pa.int64()),
                    "part": pa.array(fast_part_hash(t["u"], n_parts))}
            return pa.table(cols)

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            dd = (df.loc[df["dd"].notna(), ["k", "dd"]]
                  .drop_duplicates("k").set_index("k")["dd"])
            rows = df[df["dd"].isna()].drop(columns=["dd", "part"])
            got = rows["k"].map(dd).astype("int64")
            rows = rows.drop(columns=["k"])
            rows[out] = got.to_numpy()
            return rows

        # pandas concat-union via tag columns: align schemas first
        def widen_p(t: pa.Table) -> pa.Table:
            return t.append_column("dd", pa.nulls(t.num_rows, pa.int64()))

        u = (pairs_ds.map_batches(tag_p, batch_format="pyarrow")
             .map_batches(widen_p, batch_format="pyarrow")
             .union(tag_d_ds(tag_d)))
        return u.groupby("part").map_groups(merge, batch_format="pandas")

    def tag_d_ds(fn):
        def widen_d(t: pa.Table) -> pa.Table:
            for name in extra_cols:
                t = t.append_column(name, pa.nulls(t.num_rows,
                                                   extra_cols[name]))
            return t

        return deg.map_batches(fn, batch_format="pyarrow").map_batches(
            widen_d, batch_format="pyarrow")

    extra_cols = {"a": pa.string(), "b": pa.string(), "cn": pa.int64()}
    step1 = attach_deg(with_cn, "a", "da")
    extra_cols = {"a": pa.string(), "b": pa.string(), "cn": pa.int64(),
                  "da": pa.int64()}
    step2 = attach_deg(step1, "b", "db")

    def finish(t: pa.Table) -> pa.Table:
        cn = t["cn"].to_numpy(zero_copy_only=False)
        da = t["da"].to_numpy(zero_copy_only=False)
        db = t["db"].to_numpy(zero_copy_only=False)
        denom = da + db - cn
        jm = np.where(denom > 0, (1_000_000 * cn) // np.maximum(denom, 1),
                      0).astype(np.int64)
        return pa.table({"norm_a": t["a"], "norm_b": t["b"],
                         "common_neighbors": pa.array(cn.astype(np.int64)),
                         "jaccard_micro": pa.array(jm)})

    return step2.map_batches(finish, batch_format="pyarrow")


def pagerank_weighted(edges_ds, a_col: str = "norm_a",
                      b_col: str = "norm_b", weight_col: str = "n_pages",
                      iters: int = 5, damping_pct: int = 85,
                      rank_scale: int = 1_000_000, n_parts: int | None = None):
    """EDGE-WEIGHTED integer PageRank over an UNDIRECTED weighted edge
    Dataset (e.g. the co-occurrence graph, weight = co-mention count) —
    the relatedness-ranking variant: a neighbor reached through many
    shared pages receives proportionally more rank mass.

    Per iteration: ``r'(v) = base + (d · Σ_{u→v} (r(u)·w(u,v)) // W(u))
    // 100`` with ``W(u) = Σ_x w(u,x)`` — per-edge floor division, so
    the distributed sum replays bit-exactly in the unrolled SQL oracle.

    Same broadcast shape as ``pagerank``: the rank table (#nodes scale)
    ships once per round via ``ray.put``; the weighted edge table with
    its precomputed out-weight never re-shuffles; one combiner-bounded
    exchange per round."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import ray.data as rd

    from ..functions.hashing import fast_part_hash

    def undirect(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.string())
        b = pc.cast(t[b_col], pa.string())
        w = pc.cast(t[weight_col], pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(),
                                     a.combine_chunks()]),
            "w": pa.concat_arrays([w.combine_chunks(),
                                   w.combine_chunks()])})

    und = (edges_ds.map_batches(undirect, batch_format="pyarrow")
           .materialize())

    # out-weight per src, attached to the edges via one co-partitioned
    # tag-union merge (key = src)
    def wdeg_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"src": t["src"], "W": t["w"]})
             .group_by("src").aggregate([("W", "sum")]))
        g = g.rename_columns(["src", "W"])
        return g.append_column("part",
                               pa.array(fast_part_hash(g["src"], n_parts)))

    def tag_edges(t: pa.Table) -> pa.Table:
        cols = {"src": t["src"], "dst": t["dst"], "w": t["w"],
                "W": pa.nulls(t.num_rows, pa.int64()),
                "part": pa.array(fast_part_hash(t["src"], n_parts))}
        return pa.table(cols)

    def tag_wdeg(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"],
                         "dst": pa.nulls(t.num_rows, pa.string()),
                         "w": pa.nulls(t.num_rows, pa.int64()),
                         "W": t["W"], "part": t["part"]})

    def wdeg_final(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t["W"])
        lut = t.filter(mask)
        # sum the per-batch partials per src, then attach
        lsum = (pa.table({"src": lut["src"], "W": lut["W"]})
                .group_by("src").aggregate([("W", "sum")])
                .rename_columns(["src", "W"]))
        rows = t.filter(pc.invert(mask))
        idx = pc.index_in(rows["src"], value_set=lsum["src"].combine_chunks())
        return pa.table({"src": rows["src"], "dst": rows["dst"],
                         "w": rows["w"],
                         "W": pc.take(lsum["W"].combine_chunks(), idx)})

    e3 = (und.map_batches(tag_edges, batch_format="pyarrow")
          .union(und.map_batches(wdeg_partial, batch_format="pyarrow")
                 .map_batches(tag_wdeg, batch_format="pyarrow"))
          .groupby("part").map_groups(wdeg_final, batch_format="pyarrow")
          .materialize())

    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"]})

    nodes = _distinct(und.map_batches(node_rows, batch_format="pyarrow"),
                      ["node"]).materialize()
    base = (rank_scale * (100 - damping_pct)) // 100

    zero_rows = nodes.map_batches(
        lambda t: pa.table({
            "obj": t["node"],
            "inc": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "part": _part_of(t["node"], n_parts)}),
        batch_format="pyarrow").materialize()

    rank_tbl = _collect_table(nodes, pa.schema([("node", pa.string())]))
    rank_tbl = rank_tbl.append_column(
        "r", pa.array(np.full(rank_tbl.num_rows, rank_scale,
                              dtype=np.int64)))

    def final_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["obj"]).aggregate([("inc", "sum")])
        g = g.rename_columns(["node", "s"])
        r = pc.add(pa.scalar(base, pa.int64()),
                   pc.divide(pc.multiply(pa.scalar(damping_pct, pa.int64()),
                                         g["s"]),
                             pa.scalar(100, pa.int64())))
        return pa.table({"node": g["node"], "r": pc.cast(r, pa.int64())})

    for _ in range(iters):
        rank_ref = ray.put(rank_tbl)

        def contrib(t: pa.Table) -> pa.Table:
            rt = ray.get(rank_ref)
            idx = pc.index_in(t["src"], value_set=rt["node"])
            r = pc.take(rt["r"], idx)
            inc = pc.divide(pc.multiply(r, t["w"]), t["W"])  # per-edge floor
            g = pa.table({"obj": t["dst"], "inc": inc}).group_by(
                ["obj"]).aggregate([("inc", "sum")])
            g = g.rename_columns(["obj", "inc"])
            return g.append_column("part", _part_of(g["obj"], n_parts))

        new_ranks = (e3.map_batches(contrib, batch_format="pyarrow",
                                    batch_size=None)
                     .union(zero_rows)
                     .groupby("part")
                     .map_groups(lambda t: final_sum(t),
                                 batch_format="pyarrow"))
        rank_tbl = _collect_table(
            new_ranks, pa.schema([("node", pa.string()),
                                  ("r", pa.int64())]))
    return rd.from_arrow(rank_tbl).map_batches(
        lambda t: t.rename_columns(["node", "rank_micro"]),
        batch_format="pyarrow")


def kcore_nodes(edges_ds, k: int = 3, a_col: str = "norm_a",
                b_col: str = "norm_b", max_rounds: int = 20,
                n_parts: int | None = None, small_graph_edges: int = 200_000):
    """k-CORE decomposition by BOUNDED SIMULTANEOUS PEEL: nodes of the
    maximal subgraph where every node keeps degree ≥ k, computed as
    ``max_rounds`` Jacobi peel iterations (each round computes ALL
    degrees, then drops every node below k at once). Input must be
    distinct undirected pairs (a < b), e.g. the co-occurrence edges.

    The SQL oracle runs the IDENTICAL bounded peel (a recursive CTE
    carrying a round counter), so engine and oracle agree even on a
    pathological graph that has not converged at the bound; real
    graphs converge in a handful of rounds and both sides early-stay
    at the fixpoint.

    Distributed shape per round: per-batch degree combiner over both
    endpoint columns → ONE node-keyed exchange → the DROPPED node set
    (bounded by that round's drops) broadcasts back to filter edges.
    Graphs at or below ``small_graph_edges`` short-circuit to one
    exact single-task peel — the same small-graph rule as
    ``connected_components``."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(0.5)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    def peel_local(df: pd.DataFrame) -> pa.Table:
        df = df[["a", "b"]]
        for _ in range(max_rounds):
            if not len(df):
                break
            deg = pd.concat([df["a"], df["b"]],
                            ignore_index=True).value_counts()
            bad = deg[deg < k].index
            if not len(bad):
                break
            bad = set(bad)
            keep = ~(df["a"].isin(bad) | df["b"].isin(bad))
            df = df[keep]
        nodes = pd.unique(pd.concat([df["a"], df["b"]],
                                    ignore_index=True))
        # explicit Arrow schema so an EMPTY k-core still carries the
        # 'node' column (empty pandas blocks lose their schema)
        return pa.table({"node": pa.array(
            np.sort(nodes.astype(object)), pa.string())})

    edges = edges_ds.map_batches(to_ab,
                                 batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.string())}))
    if n_edges <= small_graph_edges:
        tagged = edges.map_batches(
            lambda t: t.append_column(
                "part", pa.array(np.zeros(t.num_rows, np.int32))),
            batch_format="pyarrow")
        return (tagged.groupby("part")
                .map_groups(peel_local, batch_format="pandas"))

    # distributed bounded peel
    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t["a"].combine_chunks(),
                                  t["b"].combine_chunks()])
        g = (pa.table({"node": nodes,
                       "deg": pa.array(np.ones(len(nodes), np.int64))})
             .group_by("node").aggregate([("deg", "sum")]))
        g = g.rename_columns(["node", "deg"])
        return g.append_column(
            "part", pa.array(fast_part_hash(g["node"], n_parts)))

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["deg"].sum()
        return g[g["deg"] < k][["node"]]  # the DROPPED set only

    for _ in range(max_rounds):
        dropped_ds = (edges.map_batches(deg_partial,
                                        batch_format="pyarrow")
                      .groupby("part").map_groups(deg_final,
                                                  batch_format="pandas"))
        tabs = [t for t in ray.get(dropped_ds.to_arrow_refs())
                if t.num_rows]
        if not tabs:
            break
        dropped = pa.concat_tables(tabs)["node"].combine_chunks()
        dref = ray.put(dropped)

        def drop_edges(t: pa.Table) -> pa.Table:
            bad = ray.get(dref)
            keep = pc.and_(
                pc.is_null(pc.index_in(t["a"], value_set=bad)),
                pc.is_null(pc.index_in(t["b"], value_set=bad)))
            return t.filter(keep)

        edges = edges.map_batches(drop_edges,
                                  batch_format="pyarrow").materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t["a"].combine_chunks(),
                                  t["b"].combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node").aggregate([])
        g = g.rename_columns(["node"])
        return g.append_column(
            "part", pa.array(fast_part_hash(g["node"], n_parts)))

    def node_distinct(df: pd.DataFrame) -> pa.Table:
        out = df.drop_duplicates("node")["node"]
        return pa.table({"node": pa.array(
            out.to_numpy(dtype=object), pa.string())})

    return (edges.map_batches(node_rows, batch_format="pyarrow")
            .groupby("part").map_groups(node_distinct,
                                        batch_format="pandas"))


def two_hop_scores(edges_ds, a_col: str = "norm_a", b_col: str = "norm_b",
                   n_parts: int | None = None):
    """LINK-PREDICTION candidate generation: every NON-adjacent node
    pair with ≥1 common neighbor, scored by common-neighbor count over
    the undirected graph — the 2-hop complement of
    ``neighborhood_jaccard`` (which scores EXISTING edges).

    Shape: undirect → hub-hash-partition → per-hub wedge emit
    (vectorized ``triu_indices``) → tag-union with the edge set
    co-partitioned on the (v, w) pair → per-partition count wedges and
    DROP pairs that close an edge. Same hot-hub Σd² wedge bound (and
    salting mitigation) as ``triangle_count``. Returns
    (norm_a, norm_b, n_common) with norm_a < norm_b."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def undirect(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([t["a"].combine_chunks(),
                                   t["b"].combine_chunks()]),
            "v": pa.concat_arrays([t["b"].combine_chunks(),
                                   t["a"].combine_chunks()])})

    def tag_hub(t: pa.Table) -> pa.Table:
        return t.append_column("part",
                               pa.array(fast_part_hash(t["u"], n_parts)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("u"):
            nb = np.sort(grp["v"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"v": nb[i], "w": nb[j]}))
        if not outs:
            return pd.DataFrame({"v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "kind": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        # partial count inside the partition: the exchange ships one row
        # per (v, w) per partition, not one per wedge
        out = out.groupby(["v", "w"], as_index=False).size()
        out = out.rename(columns={"size": "kind"})
        out["kind"] = out["kind"].astype("int64")  # >0 ⇒ wedge count
        return out

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["a"], "w": t["b"],
                         "kind": pa.array(np.full(t.num_rows, -1,
                                                  np.int64))})

    def tag_pair(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["v"], t["w"], "\x1f")
        return t.append_column("part",
                               pa.array(fast_part_hash(key, n_parts)))

    und = edges.map_batches(undirect, batch_format="pyarrow")
    tagged = (und.map_batches(tag_hub, batch_format="pyarrow")
              .groupby("part").map_groups(wedges, batch_format="pandas")
              .map_batches(tag_pair, batch_format="pyarrow")
              .union(edges.map_batches(edge_rows, batch_format="pyarrow")
                     .map_batches(tag_pair, batch_format="pyarrow")))

    def open_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["v", "w"], as_index=False)["kind"].agg(["sum",
                                                                "min"])
        # min < 0 ⇒ an edge row is present ⇒ the pair is closed
        g = g[g["min"] > 0]
        return pd.DataFrame({"norm_a": g["v"].to_numpy(),
                             "norm_b": g["w"].to_numpy(),
                             "n_common": g["sum"].astype("int64")
                                                 .to_numpy()})

    return tagged.groupby("part").map_groups(open_pairs,
                                             batch_format="pandas")


def _tarjan_scc(df) -> "pd.DataFrame":
    """Exact SCC labels for a small edge list (iterative Tarjan);
    scc_id = the minimum node id of each component (the same
    convention the distributed FB path and the SQL oracle use)."""
    import pandas as pd

    adj: dict = {}
    nodes: set = set()
    for a, b in zip(df["a"].to_numpy(), df["b"].to_numpy()):
        adj.setdefault(a, []).append(b)
        nodes.add(a)
        nodes.add(b)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    comp: dict = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        # iterative DFS: work stack of (node, child iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            children = adj.get(v, ())
            for i in range(pi, len(children)):
                w = children[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                cid = min(members)
                for w in members:
                    comp[w] = cid
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    keys = sorted(comp)
    return pd.DataFrame({"node": keys, "scc_id": [comp[k] for k in keys]})


def _directed_fixpoint(adj, labels0, n_parts: int, reduce: str = "min",
                       local_rounds: int = 64):
    """Run a directed message-passing fixpoint: each exchange sends
    every node's value along its out-edges (``adj`` rows (m, n, part)
    pre-partitioned by m ONCE) and folds incoming values into the
    current one with ``reduce`` (min or max — MONOTONE folds only).

    Inside each send partition the propagation runs a LOCAL multi-hop
    fixpoint over that partition's edges first (monotonicity makes
    transitively-derived values safe — they are folded with the true
    current value at the receiver), so the number of distributed
    exchanges is the cross-partition hop count of the longest
    propagation path, not the graph diameter. Convergence is detected
    with one sum over the labels-sized Dataset per exchange. Returns
    the converged (node, val) Dataset (an extra ``chg`` column may be
    present; callers should select (node, val))."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def tag_label_for_send(t: pa.Table) -> pa.Table:
        return pa.table({
            "m": t["node"], "n": pa.nulls(t.num_rows, pa.string()),
            "val": t["val"],
            "part": pa.array(fast_part_hash(t["node"], n_parts))})

    def send(df: pd.DataFrame) -> pd.DataFrame:
        lbl = df.loc[df["val"].notna(), ["m", "val"]].drop_duplicates("m")
        vals = dict(zip(lbl["m"], lbl["val"]))
        adjr = df.loc[df["val"].isna(), ["m", "n"]]
        # local multi-hop: propagate through THIS partition's edges to
        # a local fixpoint before emitting (safe: fold is monotone)
        for _ in range(local_rounds):
            mv = adjr["m"].map(vals)
            cand = pd.DataFrame({"n": adjr["n"], "v": mv}).dropna()
            if not len(cand):
                break
            agg = cand.groupby("n")["v"]
            new = agg.min() if reduce == "min" else agg.max()
            improved = False
            for k, v in new.items():
                c = vals.get(k)
                if c is None or (v < c if reduce == "min" else v > c):
                    vals[k] = v
                    improved = True
            if not improved:
                break
        mv = adjr["m"].map(vals)
        out = pd.DataFrame({"n": adjr["n"], "val": mv}).dropna()
        agg = out.groupby("n", as_index=False)["val"]
        return agg.min() if reduce == "min" else agg.max()

    def tag_msg(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["n"], "val": t["val"],
            "is_cur": pa.array(np.zeros(t.num_rows, np.int8)),
            "part": pa.array(fast_part_hash(t["n"], n_parts))})

    def tag_cur(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"], "val": t["val"],
            "is_cur": pa.array(np.ones(t.num_rows, np.int8)),
            "part": pa.array(fast_part_hash(t["node"], n_parts))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cur = df[df["is_cur"] == 1].set_index("node")["val"]
        agg = df.groupby("node")["val"]
        new = agg.min() if reduce == "min" else agg.max()
        chg = (new != cur.reindex(new.index)).astype("int64")
        return pd.DataFrame({"node": new.index.to_numpy(),
                             "val": new.to_numpy(),
                             "chg": chg.to_numpy()})

    labels = labels0.materialize()
    while True:
        msgs = (labels.map_batches(tag_label_for_send,
                                   batch_format="pyarrow")
                .union(adj)
                .groupby("part").map_groups(send, batch_format="pandas"))
        # repartition BEFORE materialize: sort-shuffle output block
        # count tracks input block count, so an iterative union+groupby
        # loop explodes blocks (and per-exchange latency) without a
        # bounded coalesce here
        merged = (msgs.map_batches(tag_msg, batch_format="pyarrow")
                  .union(labels.map_batches(tag_cur,
                                            batch_format="pyarrow"))
                  .groupby("part").map_groups(merge,
                                              batch_format="pandas")
                  .repartition(n_parts)).materialize()
        n_chg = merged.sum("chg") or 0
        labels = merged
        if n_chg == 0:
            return labels.map_batches(
                lambda t: t.select(["node", "val"]),
                batch_format="pyarrow")


def _attach_val(edges, vals, key_col: str, out_col: str, n_parts: int):
    """Attach ``vals`` (node, val) onto ``edges`` rows by
    ``edges[key_col]`` — the broadcast-free merge: both sides hash to
    the same partition, one exchange, vectorized map inside."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    schema = edges.schema()
    edge_cols = [c for c in schema.names if c != "part"]
    base = getattr(schema, "base_schema", None)
    arrow_base = base if isinstance(base, pa.Schema) else None
    edge_types = {c: (arrow_base.field(c).type if arrow_base is not None
                      else None)
                  for c in edge_cols}

    def tag_edge(t: pa.Table) -> pa.Table:
        t = t.select(edge_cols)
        out = t.append_column("__v", pa.nulls(t.num_rows, pa.string()))
        return out.append_column(
            "part", pa.array(fast_part_hash(t[key_col], n_parts)))

    def tag_val(t: pa.Table) -> pa.Table:
        # null filler columns must carry the EDGE side's types, or the
        # union's schema unification fails on non-string edge columns
        cols = {c: pa.nulls(t.num_rows, edge_types.get(c)
                            or pa.string()) for c in edge_cols}
        cols[key_col] = t["node"]
        cols["__v"] = t["val"]
        out = pa.table(cols)
        return out.append_column(
            "part", pa.array(fast_part_hash(t["node"], n_parts)))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        vmap = (df.loc[df["__v"].notna(), [key_col, "__v"]]
                .drop_duplicates(key_col).set_index(key_col)["__v"])
        rows = df[df["__v"].isna()][edge_cols].copy()
        rows[out_col] = rows[key_col].map(vmap).to_numpy()
        return rows

    return (edges.map_batches(tag_edge, batch_format="pyarrow")
            .union(vals.map_batches(tag_val, batch_format="pyarrow"))
            .groupby("part").map_groups(merge, batch_format="pandas"))


def scc_labels(edges_ds, a_col: str = "subj", b_col: str = "obj",
               max_rounds: int = 30, n_parts: int | None = None,
               small_graph_edges: int = 200_000):
    """STRONGLY CONNECTED COMPONENTS of a directed edge Dataset, by
    forward-backward coloring (Orzan-style FB decomposition, the
    standard Pregel-model SCC): per round (1) a TRIM fixpoint peels
    nodes with no in-edges or no out-edges (they sit on no cycle →
    singleton SCCs; web graphs are mostly DAG tail, so this removes
    the bulk without label propagation), (2) forward min-label
    fixpoint gives every surviving node the min id among its
    ancestors-and-self (its *color*; SCCs never span colors), (3) a
    backward mark fixpoint inside each color finds the nodes that
    reach their color root — exactly the root's SCC — which are
    emitted and removed, with cross-color edges dropped. Each round
    removes at least one SCC per color class, so rounds ≤ #SCC-levels;
    exchanges per fixpoint are bounded by the cross-partition hop
    count (see ``_directed_fixpoint``'s local acceleration).

    Above the Tarjan cutoff a PER-PARTITION TARJAN CONDENSATION runs
    first (the directed mirror of ``connected_components``' local-UF
    contraction): any cycle living inside one a-hash edge partition is
    already part of a global SCC, and same-SCC is an equivalence
    relation, so the per-partition (node → local scc root) star maps
    glue across partitions with one UNDIRECTED components closure
    (``connected_components`` over the star pairs — boundary-scale,
    not edge-scale). Local SCCs collapse to min-id supernodes and
    self-loops drop BEFORE any FB-Trim round, so the live fixpoints
    run on the condensation skeleton — diameter-independent local
    discovery, exactly the trick that made CC contraction fast
    (round-4 kg_scc stress: 281 s for 1M edges of 4-cycles; the
    condensation removes every such local cycle up front).

    scc_id = min node id of the component (Tarjan short-circuit at or
    below ``small_graph_edges`` edges and the SQL closure oracle use
    the same convention). Returns (node, scc_id) covering every node
    incident to an edge; isolated original nodes are their own
    singleton SCCs by construction."""
    import ray.data as rd

    from ..runtime import default_parts
    n_parts = n_parts or default_parts(0.5)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        ns = pa.concat_arrays([t["a"].combine_chunks(),
                               t["b"].combine_chunks()])
        g = pa.table({"node": ns}).group_by("node").aggregate([])
        return g.rename_columns(["node"])

    nodes0 = _distinct(edges.map_batches(node_rows,
                                         batch_format="pyarrow"),
                       ["node"], n_parts=n_parts).materialize()

    import os
    dbg = os.environ.get("GRAFT_SCC_DEBUG")

    member_map = None  # (node, rep) for condensed-away members
    if edges.count() > small_graph_edges:
        # per-partition Tarjan condensation (see docstring). RANGE
        # partitioning, not hash: a hash of `a` scatters every cycle's
        # edges across partitions (a k-cycle lands whole with
        # probability P^-(k-1) — local Tarjan would find nothing), but
        # sorted source order co-locates them whenever ids share
        # locality — same-prefix synthetic ids, same-host urls, and
        # real web-graph links are overwhelmingly intra-host. Cycles
        # straddling a range boundary are simply not condensed and
        # fall through to the FB rounds (boundary scale, not
        # edge scale).
        def local_scc(df: pd.DataFrame) -> pa.Table:
            comp = _tarjan_scc(df)
            nz = comp[comp["node"] != comp["scc_id"]]
            return pa.table({
                "node": pa.array(nz["node"].to_numpy(dtype=object),
                                 pa.string()),
                "root": pa.array(nz["scc_id"].to_numpy(dtype=object),
                                 pa.string())})

        pairs = (edges.sort("a")
                 .map_batches(local_scc, batch_format="pandas",
                              batch_size=None)
                 .materialize())
        if pairs.count() > 0:
            # same-SCC is transitive: glue the per-partition star maps
            # with an undirected components closure (min-id labels)
            reps = connected_components(
                pairs, a_col="node", b_col="root",
                n_parts=n_parts).materialize()
            member_map = reps.map_batches(
                lambda t: pa.table({
                    "node": t.filter(pc.not_equal(
                        t["node"], t["component"]))["node"],
                    "rep": t.filter(pc.not_equal(
                        t["node"], t["component"]))["component"]}),
                batch_format="pyarrow").materialize()
            rep_vals = reps.map_batches(
                lambda t: pa.table({"node": t["node"],
                                    "val": t["component"]}),
                batch_format="pyarrow")
            e2 = _attach_val(edges, rep_vals, "a", "ra", n_parts)
            e2 = _attach_val(e2, rep_vals, "b", "rb", n_parts)

            def contract(t: pa.Table) -> pa.Table:
                # rep map is SPARSE: a partition where no edge endpoint
                # sits in a local SCC yields an all-null (null-typed)
                # attach column — cast before coalesce (no
                # (null, string) kernel)
                a = pc.coalesce(pc.cast(t["ra"], pa.string()), t["a"])
                b = pc.coalesce(pc.cast(t["rb"], pa.string()), t["b"])
                out_t = pa.table({"a": a, "b": b})
                return out_t.filter(pc.not_equal(out_t["a"],
                                                 out_t["b"]))

            edges = _distinct(
                e2.map_batches(contract, batch_format="pyarrow"),
                ["a", "b"], n_parts=n_parts).materialize()
            if dbg:
                import sys
                print(f"[scc] condensed to {edges.count()} edges",
                      file=sys.stderr, flush=True)

    empty = pa.table({"node": pa.array([], pa.string()),
                      "scc_id": pa.array([], pa.string())})
    out = rd.from_arrow(empty)

    for rnd in range(max_rounds):
        n_edges = edges.count()
        if dbg:
            import sys
            print(f"[scc] round {rnd}: {n_edges} edges",
                  file=sys.stderr, flush=True)
        if n_edges == 0:
            break
        if n_edges <= small_graph_edges:
            tagged = edges.map_batches(
                lambda t: t.append_column(
                    "part", pa.array(np.zeros(t.num_rows, np.int32))),
                batch_format="pyarrow")
            local = tagged.groupby("part").map_groups(
                _tarjan_scc, batch_format="pandas")
            out = out.union(local)
            edges = rd.from_arrow(
                pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())}))
            break

        # (1) TRIM: peel no-in/no-out nodes (singleton SCCs) to a
        # fixpoint — alive flags attached per endpoint, no broadcast
        def end_partial(t: pa.Table) -> pa.Table:
            ns = pa.concat_arrays([t["a"].combine_chunks(),
                                   t["b"].combine_chunks()])
            n_a = t.num_rows
            ho = np.zeros(len(ns), np.int8)
            ho[:n_a] = 1
            hi = np.zeros(len(ns), np.int8)
            hi[n_a:] = 1
            g = (pa.table({"node": ns, "ho": pa.array(ho),
                           "hi": pa.array(hi)})
                 .group_by("node").aggregate([("ho", "max"),
                                              ("hi", "max")]))
            g = g.rename_columns(["node", "ho", "hi"])
            return g.append_column(
                "part", pa.array(fast_part_hash(g["node"], n_parts)))

        def end_final(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", as_index=False)[["ho", "hi"]].max()
            return pd.DataFrame({
                "node": g["node"].to_numpy(),
                "val": np.where((g["ho"] > 0) & (g["hi"] > 0),
                                "1", "0")})

        trimmed = False
        for _t in range(max_rounds):
            flags = (edges.map_batches(end_partial,
                                       batch_format="pyarrow")
                     .groupby("part").map_groups(end_final,
                                                 batch_format="pandas")
                     .repartition(n_parts)).materialize()
            dead = flags.map_batches(
                lambda t: pa.table({
                    "node": t.filter(pc.equal(t["val"], "0"))["node"],
                    "scc_id": t.filter(pc.equal(t["val"], "0"))["node"]}),
                batch_format="pyarrow").materialize()
            n_dead = dead.count()
            if dbg:
                import sys
                print(f"[scc]  trim {_t}: {n_dead} dead",
                      file=sys.stderr, flush=True)
            if n_dead == 0:
                break
            trimmed = True
            out = out.union(dead)
            ef = _attach_val(edges, flags, "a", "fa", n_parts)
            ef = _attach_val(ef, flags, "b", "fb", n_parts)
            edges = ef.map_batches(
                lambda t: t.filter(pc.and_(pc.equal(t["fa"], "1"),
                                           pc.equal(t["fb"], "1")))
                           .select(["a", "b"]),
                batch_format="pyarrow").repartition(n_parts).materialize()
            if edges.count() == 0:
                break
        if trimmed:
            continue  # recount: the remainder may now short-circuit

        # (2) forward colors: min over ancestors-and-self
        def fwd_adj(t: pa.Table) -> pa.Table:
            out_t = pa.table({
                "m": t["a"], "n": t["b"],
                "val": pa.nulls(t.num_rows, pa.string())})
            return out_t.append_column(
                "part", pa.array(fast_part_hash(out_t["m"], n_parts)))

        cur_nodes = _distinct(edges.map_batches(node_rows,
                                                batch_format="pyarrow"),
                              ["node"], n_parts=n_parts).materialize()
        init = cur_nodes.map_batches(
            lambda t: pa.table({"node": t["node"], "val": t["node"]}),
            batch_format="pyarrow")
        adj = edges.map_batches(fwd_adj,
                                batch_format="pyarrow").materialize()
        colors = _directed_fixpoint(adj, init, n_parts, reduce="min")
        if dbg:
            import sys
            print("[scc]  colors done", file=sys.stderr, flush=True)

        # (3) same-color edges; backward mark from the color roots
        ec = _attach_val(edges, colors, "a", "ca", n_parts)
        ec = _attach_val(ec, colors, "b", "cb", n_parts)
        ecc = ec.map_batches(
            lambda t: t.filter(pc.equal(t["ca"], t["cb"])),
            batch_format="pyarrow").repartition(n_parts).materialize()
        if dbg:
            import sys
            print(f"[scc]  ecc done: {ecc.count()} edges",
                  file=sys.stderr, flush=True)

        def bwd_adj(t: pa.Table) -> pa.Table:
            out_t = pa.table({
                "m": t["b"], "n": t["a"],
                "val": pa.nulls(t.num_rows, pa.string())})
            return out_t.append_column(
                "part", pa.array(fast_part_hash(out_t["m"], n_parts)))

        mark0 = colors.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "val": pc.if_else(pc.equal(t["node"], t["val"]),
                                  pa.array(["1"] * t.num_rows),
                                  pa.array(["0"] * t.num_rows))}),
            batch_format="pyarrow")
        radj = ecc.map_batches(bwd_adj,
                               batch_format="pyarrow").materialize()
        if dbg:
            import sys
            print("[scc]  radj done", file=sys.stderr, flush=True)
        marks = _directed_fixpoint(radj, mark0, n_parts, reduce="max")
        if dbg:
            import sys
            print("[scc]  marks done", file=sys.stderr, flush=True)

        # (4) emit the marked SCCs; keep only unmarked same-color edges
        with_mark = _attach_val(
            colors.map_batches(
                lambda t: pa.table({"node": t["node"], "color": t["val"]}),
                batch_format="pyarrow"),
            marks, "node", "mk", n_parts)
        emitted = with_mark.map_batches(
            lambda t: pa.table({
                "node": t.filter(pc.equal(t["mk"], "1"))["node"],
                "scc_id": t.filter(pc.equal(t["mk"], "1"))["color"]}),
            batch_format="pyarrow")
        out = out.union(emitted)

        em = _attach_val(ecc.map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"),
            marks, "a", "ma", n_parts)
        em = _attach_val(em, marks, "b", "mb", n_parts)
        edges = em.map_batches(
            lambda t: t.filter(pc.and_(pc.equal(t["ma"], "0"),
                                       pc.equal(t["mb"], "0")))
                       .select(["a", "b"]),
            batch_format="pyarrow").repartition(n_parts).materialize()

    # expand condensation: each condensed-away member takes its
    # supernode rep's label; a rep the loop never labeled (its whole
    # component was one local SCC with no external edges) defaults to
    # the rep itself — `singles` below then labels the rep identically
    if member_map is not None and member_map.count() > 0:
        # Arrow-native tag-union attach (not the pandas _attach_val:
        # its empty-partition merges emit schema-less pandas blocks
        # that poison the downstream groupby — the modularity_profile
        # lesson). Key = rep; fallback label = the rep itself.
        def tag_mm(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t["rep"], "node": t["node"],
                "lab": pa.nulls(t.num_rows, pa.string()),
                "part": pa.array(fast_part_hash(t["rep"], n_parts))})

        def tag_lab(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t["node"], "node": pa.nulls(t.num_rows, pa.string()),
                "lab": t["scc_id"],
                "part": pa.array(fast_part_hash(t["node"], n_parts))})

        def expand(t: pa.Table) -> pa.Table:
            lab_mask = pc.is_valid(t["lab"])
            lut = t.filter(lab_mask)
            rows = t.filter(pc.invert(lab_mask))
            idx = pc.index_in(rows["k"], value_set=lut["k"]
                              .combine_chunks())
            got = pc.take(lut["lab"].combine_chunks(), idx)
            return pa.table({"node": rows["node"],
                             "scc_id": pc.coalesce(got, rows["k"])})

        member_out = (member_map.map_batches(tag_mm,
                                             batch_format="pyarrow")
                      .union(out.map_batches(tag_lab,
                                             batch_format="pyarrow"))
                      .groupby("part").map_groups(
                          expand, batch_format="pyarrow"))
        out = out.union(member_out)

    # singletons: original nodes never emitted (their edges were
    # cross-color or their component was a single node)
    out = out.materialize()

    def singles(df: pd.DataFrame) -> pd.DataFrame:
        got = df[df["scc_id"].notna()]
        missing = df.loc[~df["node"].isin(set(got["node"])), "node"]
        uniq = pd.unique(missing).astype(object)
        return pd.DataFrame({"node": pd.Series(uniq, dtype=object),
                             "scc_id": pd.Series(uniq, dtype=object)})

    def tag_out(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(fast_part_hash(t["node"], n_parts)))

    node_side = nodes0.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "scc_id": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")
    singles_ds = (out.union(node_side)
                  .map_batches(tag_out, batch_format="pyarrow")
                  .groupby("part").map_groups(singles,
                                              batch_format="pandas"))

    def to_out(t: pa.Table) -> pa.Table:
        # normalize EVERY block to typed Arrow: the union mixes arrow
        # blocks with pandas map_groups blocks (including schema-less
        # empties), and a downstream sort/groupby asserts on mixed
        # block types (Ray 2.49 delegating_block_builder)
        if t.num_rows == 0 or "node" not in t.schema.names:
            return pa.table({"node": pa.array([], pa.string()),
                             "scc_id": pa.array([], pa.string())})
        return pa.table({"node": pc.cast(t["node"], pa.string()),
                         "scc_id": pc.cast(t["scc_id"], pa.string())})

    return out.union(singles_ds).map_batches(to_out,
                                             batch_format="pyarrow")


def bowtie_regions(edges_ds, a_col: str = "subj", b_col: str = "obj",
                   n_parts: int | None = None, **scc_kw):
    """BOW-TIE DECOMPOSITION of a directed graph (Broder et al. 2000,
    the canonical web-graph macro-structure): CORE = the largest SCC
    (ties → min scc_id), IN = nodes that reach the core but are not in
    it, OUT = nodes the core reaches, OTHER = tendrils/disconnected.

    Shape: ``scc_labels`` → single-row top-1 component pick (per-block
    partial top-1, bounded driver data) → TWO monotone reachability
    fixpoints over the full edge set (backward for IN, forward for
    OUT, seeds = core members) → one attach pass per flag. Returns
    (node, region)."""
    import ray.data as rd

    from ..runtime import default_parts
    n_parts = n_parts or default_parts(0.5)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    small_cutoff = scc_kw.get("small_graph_edges", 200_000)
    if edges.count() <= small_cutoff:
        # single exact task: Tarjan + BFS both ways from the core
        def local(df: pd.DataFrame) -> pd.DataFrame:
            comp = _tarjan_scc(df)
            sizes = comp.groupby("scc_id").size()
            core = sizes.sort_index().sort_values(
                kind="stable", ascending=False).index[0]
            members = dict(zip(comp["node"], comp["scc_id"]))
            fwd: dict = {}
            bwd: dict = {}
            for a, b in zip(df["a"], df["b"]):
                fwd.setdefault(a, []).append(b)
                bwd.setdefault(b, []).append(a)
            seeds = [n for n, c in members.items() if c == core]

            def reach(adj):
                seen = set(seeds)
                stack = list(seeds)
                while stack:
                    for w in adj.get(stack.pop(), ()):
                        if w not in seen:
                            seen.add(w)
                            stack.append(w)
                return seen

            des, anc = reach(fwd), reach(bwd)
            region = [
                "CORE" if members[n] == core
                else "IN" if n in anc
                else "OUT" if n in des
                else "OTHER"
                for n in comp["node"]]
            return pd.DataFrame({"node": comp["node"],
                                 "region": region})

        tagged = edges.map_batches(
            lambda t: t.append_column(
                "part", pa.array(np.zeros(t.num_rows, np.int32))),
            batch_format="pyarrow")
        return tagged.groupby("part").map_groups(local,
                                                 batch_format="pandas")

    sccs = scc_labels(edges, a_col="a", b_col="b", n_parts=n_parts,
                      **scc_kw).materialize()

    # core = largest SCC, ties -> min scc_id; per-block partial top-1
    # keeps driver data bounded
    from ray.data.aggregate import Count

    counts = sccs.groupby("scc_id").aggregate(Count())
    counts = counts.map_batches(
        lambda t: t.rename_columns(["scc_id", "c"]),
        batch_format="pyarrow")

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (df.sort_values(["c", "scc_id"],
                               ascending=[False, True]).head(1))

    head = (counts.map_batches(top1, batch_format="pandas")
            .repartition(1)
            .map_batches(top1, batch_format="pandas")).take(1)
    core_id = head[0]["scc_id"]

    def seed_marks(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "val": pc.if_else(pc.equal(t["scc_id"], core_id),
                              pa.array(["1"] * t.num_rows),
                              pa.array(["0"] * t.num_rows))})

    seeds = sccs.map_batches(seed_marks, batch_format="pyarrow")

    def fwd_adj(t: pa.Table) -> pa.Table:
        o = pa.table({"m": t["a"], "n": t["b"],
                      "val": pa.nulls(t.num_rows, pa.string())})
        return o.append_column(
            "part", pa.array(fast_part_hash(o["m"], n_parts)))

    def bwd_adj(t: pa.Table) -> pa.Table:
        o = pa.table({"m": t["b"], "n": t["a"],
                      "val": pa.nulls(t.num_rows, pa.string())})
        return o.append_column(
            "part", pa.array(fast_part_hash(o["m"], n_parts)))

    reaches_core = _directed_fixpoint(
        edges.map_batches(bwd_adj, batch_format="pyarrow").materialize(),
        seeds, n_parts, reduce="max")
    core_reaches = _directed_fixpoint(
        edges.map_batches(fwd_adj, batch_format="pyarrow").materialize(),
        seeds, n_parts, reduce="max")

    tagged = _attach_val(sccs, reaches_core, "node", "ra", n_parts)
    tagged = _attach_val(tagged, core_reaches, "node", "rd", n_parts)

    def classify(t: pa.Table) -> pa.Table:
        is_core = pc.equal(t["scc_id"], core_id)
        region = pc.if_else(
            is_core, "CORE",
            pc.if_else(pc.equal(t["ra"], "1"), "IN",
                       pc.if_else(pc.equal(t["rd"], "1"), "OUT",
                                  "OTHER")))
        return pa.table({"node": t["node"], "region": region})

    return tagged.map_batches(classify, batch_format="pyarrow")


def resource_alloc_scores(edges_ds, a_col: str = "norm_a",
                          b_col: str = "norm_b",
                          weight_scale: int = 1_000_000_000,
                          n_parts: int | None = None):
    """LINK PREDICTION by the resource-allocation index (Zhou, Lü &
    Zhang 2009): for every NON-adjacent pair (a, b), RA(a, b) =
    Σ_{z ∈ N(a) ∩ N(b)} 1/deg(z) — common neighbors weighted inversely
    by their degree, so promiscuous hubs contribute less than selective
    bridges. Integer contract: each common neighbor z contributes
    ``weight_scale // deg(z)``, summed as int64, so the DuckDB oracle
    replays bit-for-bit (the kg_pagerank fixed-point trick).

    Shape is ``two_hop_scores`` with one addition: the hub-hash
    partition already co-locates EVERY neighbor of a hub, so deg(hub)
    is free inside the wedge pass (len of the neighbor list — no extra
    degree exchange). Returns (norm_a, norm_b, n_common, ra_score)."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def undirect(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([t["a"].combine_chunks(),
                                   t["b"].combine_chunks()]),
            "v": pa.concat_arrays([t["b"].combine_chunks(),
                                   t["a"].combine_chunks()])})

    def tag_hub(t: pa.Table) -> pa.Table:
        return t.append_column("part",
                               pa.array(fast_part_hash(t["u"], n_parts)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("u"):
            nb = np.sort(grp["v"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            # deg(hub) = its full neighbor count (co-located here)
            w = weight_scale // len(nb)
            outs.append(pd.DataFrame({"v": nb[i], "w": nb[j],
                                      "cnt": np.int64(1),
                                      "rw": np.int64(w)}))
        if not outs:
            return pd.DataFrame({"v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64"),
                                 "rw": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        # partial sums inside the partition: ship one row per (v, w)
        out = out.groupby(["v", "w"], as_index=False)[["cnt", "rw"]].sum()
        out["cnt"] = out["cnt"].astype("int64")
        out["rw"] = out["rw"].astype("int64")
        return out

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["a"], "w": t["b"],
                         "cnt": pa.array(np.full(t.num_rows, -1, np.int64)),
                         "rw": pa.array(np.zeros(t.num_rows, np.int64))})

    def tag_pair(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["v"], t["w"], "\x1f")
        return t.append_column("part",
                               pa.array(fast_part_hash(key, n_parts)))

    und = edges.map_batches(undirect, batch_format="pyarrow")
    tagged = (und.map_batches(tag_hub, batch_format="pyarrow")
              .groupby("part").map_groups(wedges, batch_format="pandas")
              .map_batches(tag_pair, batch_format="pyarrow")
              .union(edges.map_batches(edge_rows, batch_format="pyarrow")
                     .map_batches(tag_pair, batch_format="pyarrow")))

    def open_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["v", "w"], as_index=False).agg(
            s=("cnt", "sum"), mn=("cnt", "min"), rw=("rw", "sum"))
        g = g[g["mn"] > 0]  # an edge row (-1) marks the pair closed
        return pd.DataFrame({"norm_a": g["v"].to_numpy(),
                             "norm_b": g["w"].to_numpy(),
                             "n_common": g["s"].astype("int64").to_numpy(),
                             "ra_score": g["rw"].astype("int64")
                                                .to_numpy()})

    return tagged.groupby("part").map_groups(open_pairs,
                                             batch_format="pandas")


def label_prop_communities(edges_ds, a_col: str = "norm_a",
                           b_col: str = "norm_b", rounds: int = 4,
                           n_parts: int | None = None):
    """BOUNDED min-label propagation (synchronous, ``rounds`` Jacobi
    iterations): label_0(v) = v; label_{r+1}(v) = min over N(v) ∪ {v}
    of label_r — the diffusion/community primitive. Bounding BOTH sides
    to the same round count makes the fixpoint-free prefix exactly
    SQL-replayable (the same bounded-iteration-oracle trick as k-core);
    with enough rounds it converges to connected components, for which
    the exact O(levels) path is ``connected_components``.

    Per round: one label-by-neighbor co-partitioned merge (labels move,
    the undirected+self-loop adjacency is partitioned ONCE and reused)
    + one node-keyed partial-min exchange — 2 bounded exchanges/round,
    labels-sized traffic only."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def und_self(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks()
        b = t["b"].combine_chunks()
        m = pa.concat_arrays([a, b, a, b])
        n = pa.concat_arrays([b, a, a, b])  # + self-loops both ends
        out = pa.table({"m": m, "n": n})
        return out.append_column(
            "part", pa.array(fast_part_hash(out["m"], n_parts)))

    adj = edges.map_batches(und_self, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        g = pa.table({"node": t["m"]}).group_by("node").aggregate([])
        g = g.rename_columns(["node"])
        return pa.table({"node": g["node"], "label": g["node"]})

    labels = adj.map_batches(init_labels, batch_format="pyarrow")

    def tag_label(t: pa.Table) -> pa.Table:
        return pa.table({
            "m": t["node"], "n": pa.nulls(t.num_rows, pa.string()),
            "lbl": t["label"],
            "part": pa.array(fast_part_hash(t["node"], n_parts))})

    def widen_adj(t: pa.Table) -> pa.Table:
        return pa.table({"m": t["m"], "n": t["n"],
                         "lbl": pa.nulls(t.num_rows, pa.string()),
                         "part": t["part"]})

    def send_min(df: pd.DataFrame) -> pd.DataFrame:
        lbl = (df.loc[df["lbl"].notna(), ["m", "lbl"]]
               .groupby("m")["lbl"].min())  # dedup (labels arrive once)
        rows = df[df["lbl"].isna()]
        out = pd.DataFrame({"n": rows["n"].to_numpy(),
                            "lbl": rows["m"].map(lbl).to_numpy()})
        # partial min inside the partition before the node exchange
        return out.groupby("n", as_index=False)["lbl"].min()

    def tag_node(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(fast_part_hash(t["n"], n_parts)))

    def final_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n", as_index=False)["lbl"].min()
        return pd.DataFrame({"node": g["n"].to_numpy(),
                             "label": g["lbl"].to_numpy()})

    wide_adj = adj.map_batches(widen_adj, batch_format="pyarrow")
    for _ in range(rounds):
        msgs = (labels.map_batches(tag_label, batch_format="pyarrow")
                .union(wide_adj)
                .groupby("part").map_groups(send_min,
                                            batch_format="pandas"))
        labels = (msgs.map_batches(tag_node, batch_format="pyarrow")
                  .groupby("part").map_groups(final_min,
                                              batch_format="pandas")
                  ).materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "community": t["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def hits_scores(edges_ds, iters: int = 5, scale: int = 1_000_000,
                n_parts: int | None = None,
                small_graph_edges: int = 200_000):
    """Integer HITS (Kleinberg hubs & authorities) over a directed
    (subj, obj) edge Dataset — the classic web-graph ranking pair next
    to `pagerank` (the reference emits the static link graph these run
    over: relationship triples, ObjectProcessor.java:262-268).

    Per round, all-integer so the DuckDB oracle replays bit-for-bit:

      auth_raw(v) = Σ_{u→v} hub(u);  auth = auth_raw·scale // max(auth_raw)
      hub_raw(u)  = Σ_{u→v} auth(v); hub  = hub_raw·scale // max(hub_raw)

    starting from hub = ``scale`` everywhere; max-normalization keeps
    the fixed point in integers (an all-zero side collapses to 0).
    Overflow bound: raw·scale must fit int64, i.e. max in-degree ·
    scale² < 2^63 (≈9.2e6 at the default scale — lower ``scale`` for
    hotter authorities).

    Shape: distinct edges once; graphs at or below
    ``small_graph_edges`` short-circuit into ONE exact single-task
    vectorized run (the `kcore_nodes`/`scc_labels` small-graph rule —
    2·iters np.add.at passes, identical arithmetic). Above it, per
    round TWO broadcast half-steps (score table shipped via ``ray.put``
    at #nodes scale — the same documented ≤5M-node broadcast regime as
    `pagerank`; a join-mode mirror of `_pagerank_join` is the >5M-node
    path), each half a stateless edge map with a per-batch combiner →
    ONE part-hash exchange → vectorized per-partition sum. Returns
    (node, hub_scaled, auth_scaled).
    """
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)

    # repartition after the distinct exchanges: the half-step loop
    # re-reads these datasets 2·iters times, and sort-shuffle block
    # counts track INPUT block counts — without the collapse every
    # round's exchange pays for the distincts' empty-block debris
    # (the engine-wide iterative-loop lesson, BASELINE.md round 4)
    edges = (_distinct(edges_ds, ["subj", "obj"])
             .repartition(n_parts).materialize())

    def hits_local(df):
        import pandas as pd

        codes, uniq = pd.factorize(
            pd.concat([df["subj"], df["obj"]], ignore_index=True))
        m = len(df)
        si, oi = codes[:m], codes[m:]
        n = len(uniq)
        hub = np.full(n, scale, dtype=np.int64)
        auth = np.zeros(n, dtype=np.int64)
        for _ in range(iters):
            raw = np.zeros(n, dtype=np.int64)
            np.add.at(raw, oi, hub[si])
            mx = raw.max() if n else 0
            auth = (raw * scale) // mx if mx > 0 else raw
            raw = np.zeros(n, dtype=np.int64)
            np.add.at(raw, si, auth[oi])
            mx = raw.max() if n else 0
            hub = (raw * scale) // mx if mx > 0 else raw
        return pd.DataFrame({"node": uniq, "hub_scaled": hub,
                             "auth_scaled": auth})

    if edges.count() <= small_graph_edges:
        tagged = edges.map_batches(
            lambda t: t.append_column(
                "part", pa.array(np.zeros(t.num_rows, np.int32))),
            batch_format="pyarrow")
        return (tagged.groupby("part")
                .map_groups(lambda df: hits_local(df.drop(columns="part")),
                            batch_format="pandas"))

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [c.combine_chunks() for c in (t["subj"], t["obj"])])})

    nodes = _distinct(edges.map_batches(both_ends, batch_format="pyarrow"),
                      ["node"]).materialize()

    # endpoint-less nodes as zero contributions, partitioned once
    zero_rows = nodes.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "inc": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "part": _part_of(t["node"], n_parts)}),
        batch_format="pyarrow").repartition(
        max(8, n_parts // 4)).materialize()

    node_schema = pa.schema([("node", pa.string()), ("raw", pa.int64())])

    def half_step(score_tbl: pa.Table, from_col: str,
                  to_col: str) -> pa.Table:
        import ray

        ref = ray.put(score_tbl)

        def contrib(t: pa.Table) -> pa.Table:
            st = ray.get(ref)  # zero-copy object-store read
            idx = pc.index_in(t[from_col], value_set=st["node"])
            g = pa.table({"node": t[to_col],
                          "inc": pc.take(st["s"], idx)}).group_by(
                ["node"]).aggregate([("inc", "sum")])
            g = g.rename_columns(["node", "inc"])
            return g.append_column("part", _part_of(g["node"], n_parts))

        def psum(t: pa.Table) -> pa.Table:
            g = t.group_by(["node"]).aggregate([("inc", "sum")])
            return g.rename_columns(["node", "raw"])

        raw_ds = (edges.map_batches(contrib, batch_format="pyarrow",
                                    batch_size=None)
                  .union(zero_rows)
                  .groupby("part").map_groups(psum, batch_format="pyarrow"))
        tbl = _collect_table(raw_ds, node_schema)
        mx = pc.max(tbl["raw"]).as_py() or 0
        if mx > 0:
            s = pc.divide(pc.multiply(tbl["raw"],
                                      pa.scalar(scale, pa.int64())),
                          pa.scalar(mx, pa.int64()))
        else:
            s = pa.array(np.zeros(tbl.num_rows, dtype=np.int64))
        return pa.table({"node": tbl["node"],
                         "s": pc.cast(s, pa.int64())})

    hub = _collect_table(nodes, pa.schema([("node", pa.string())]))
    hub = pa.table({
        "node": hub["node"],
        "s": pa.array(np.full(hub.num_rows, scale, dtype=np.int64))})
    auth = None
    for _ in range(iters):
        auth = half_step(hub, "subj", "obj")
        hub = half_step(auth, "obj", "subj")

    import ray.data as rd

    idx = pc.index_in(hub["node"], value_set=auth["node"].combine_chunks())
    return rd.from_arrow(pa.table({
        "node": hub["node"],
        "hub_scaled": hub["s"],
        "auth_scaled": pc.take(auth["s"].combine_chunks(), idx)}))


def trust_rank(edges_ds, seeds, iters: int = 5, damping_pct: int = 85,
               rank_scale: int = 1_000_000, n_parts: int | None = None):
    """Seeded integer PageRank (TrustRank): the crawl-frontier /
    spam-demotion ranking where teleport mass lands ONLY on a curated
    seed set S, so trust decays with link distance from the seeds.
    All-integer so the DuckDB oracle replays bit-for-bit:

      r0(v) = rank_scale · [v ∈ S]
      r'(v) = base·[v ∈ S] + (damping_pct · Σ_{u→v} r(u)//d(u)) // 100

    with ``base = (rank_scale · (100 - damping_pct)) // 100`` — the
    `pagerank` arithmetic with the uniform teleport term masked to S.
    Nodes unreachable from S stay at exactly 0.

    Shape: identical to `_pagerank_broadcast` (the ≤5M-node broadcast
    regime): per round the rank table ships via ``ray.put``, edges map
    statelessly with a per-batch combiner, ONE part-hash exchange,
    vectorized per-partition sum. The seed set rides in the task
    closure — curated trust seeds are small by construction (document
    `ray.put` if a seed set ever approaches node scale). Returns
    (node, trust_micro).
    """
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import ray.data as rd

    e3, nodes, _ = _prepare(edges_ds)
    base = (rank_scale * (100 - damping_pct)) // 100
    seed_arr = pa.array(sorted(set(seeds)), pa.string())

    zero_rows = nodes.map_batches(
        lambda t: pa.table({
            "obj": t["node"],
            "inc": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "part": _part_of(t["node"], n_parts)}),
        batch_format="pyarrow").materialize()

    rank_tbl = _collect_table(nodes, pa.schema([("node", pa.string())]))
    seeded0 = pc.is_in(rank_tbl["node"], value_set=seed_arr)
    rank_tbl = rank_tbl.append_column("r", pc.if_else(
        seeded0, pa.scalar(rank_scale, pa.int64()),
        pa.scalar(0, pa.int64())))

    def final_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["obj"]).aggregate([("inc", "sum")])
        g = g.rename_columns(["node", "s"])
        seed_base = pc.if_else(pc.is_in(g["node"], value_set=seed_arr),
                               pa.scalar(base, pa.int64()),
                               pa.scalar(0, pa.int64()))
        r = pc.add(seed_base,
                   pc.divide(pc.multiply(pa.scalar(damping_pct, pa.int64()),
                                         g["s"]),
                             pa.scalar(100, pa.int64())))
        return pa.table({"node": g["node"], "r": pc.cast(r, pa.int64())})

    for _ in range(iters):
        rank_ref = ray.put(rank_tbl)

        def contrib(t: pa.Table) -> pa.Table:
            rt = ray.get(rank_ref)  # zero-copy object-store read
            idx = pc.index_in(t["subj"], value_set=rt["node"])
            inc = pc.divide(pc.take(rt["r"], idx), t["d"])  # floor div
            g = pa.table({"obj": t["obj"], "inc": inc}).group_by(
                ["obj"]).aggregate([("inc", "sum")])
            g = g.rename_columns(["obj", "inc"])
            return g.append_column("part", _part_of(g["obj"], n_parts))

        new_ranks = (e3.map_batches(contrib, batch_format="pyarrow",
                                    batch_size=None)
                     .union(zero_rows)
                     .groupby("part")
                     .map_groups(final_sum, batch_format="pyarrow"))
        rank_tbl = _collect_table(
            new_ranks, pa.schema([("node", pa.string()),
                                  ("r", pa.int64())]))
    return rd.from_arrow(rank_tbl.rename_columns(["node", "trust_micro"]))


def deterministic_walks(edges_ds, length: int = 4,
                        n_parts: int | None = None,
                        broadcast_max_edges: int = 2_000_000):
    """GRAPH-WALK CORPUS generation (the node2vec/DeepWalk ingest:
    random walks become training sentences for graph embeddings) with a
    DETERMINISTIC next-hop rule so the DuckDB oracle replays exactly:
    at step i, a walk started at ``s`` standing on ``u`` moves to

        ns(u)[ md5_60(s + '|' + str(i)) % d(u) ]

    where ``ns(u)`` is u's SORTED out-neighbor list and ``d(u)`` its
    out-degree (functions/hashing.md5_hash60 — the engine's published
    SQL-replayable hash family). One walk starts at every node; walks
    stop early at sinks. Returns (start, step, node), step 0..length.

    Shape: ``length`` rounds. At or below ``broadcast_max_edges`` the
    adjacency (CSR-style numpy triple: sorted subj array, offsets, flat
    sorted neighbors) ships ONCE via ``ray.put`` and every round is a
    stateless map over the walk Dataset (#nodes rows, materialized per
    round — no loop-carried lineage). Above it, each round is ONE
    co-partition exchange: walks keyed by hash(cur) union the edge set
    keyed by hash(subj), with the nth-smallest-neighbor selection done
    vectorized per partition (sort + prefix offsets). The md5 runs once
    per (walk, step) — not per edge. Per-walk-step md5 is the same
    published-contract loop as ta_split's content addressing.
    """
    from ..functions.hashing import fast_part_hash, md5_hash60
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import ray.data as rd

    edges = _distinct(edges_ds, ["subj", "obj"]).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [c.combine_chunks() for c in (t["subj"], t["obj"])])})

    nodes = _distinct(edges.map_batches(both_ends, batch_format="pyarrow"),
                      ["node"]).materialize()

    outs = [nodes.map_batches(
        lambda t: pa.table({
            "start": t["node"],
            "step": pa.array(np.zeros(t.num_rows, np.int64)),
            "node": t["node"]}),
        batch_format="pyarrow")]

    def pick_next(starts, curs, step, subj_sorted, offsets, flat_obj):
        """Vectorized next-hop for walk rows (md5 once per row)."""
        if not len(subj_sorted) or not len(curs):
            empty = np.array([], dtype=object)
            return empty, empty
        idx = np.searchsorted(subj_sorted, curs)
        idx = np.clip(idx, 0, len(subj_sorted) - 1)
        alive = subj_sorted[idx] == curs  # cur has out-edges
        starts, idx = starts[alive], idx[alive]
        d = offsets[idx + 1] - offsets[idx]
        h = np.fromiter((md5_hash60(f"{s}|{step}") for s in starts),
                        dtype=np.int64, count=len(starts))
        nxt = flat_obj[offsets[idx] + (h % d)]
        return starts, nxt

    if edges.count() <= broadcast_max_edges:
        et = _collect_table(edges, pa.schema([("subj", pa.string()),
                                              ("obj", pa.string())]))
        subj = et["subj"].to_numpy(zero_copy_only=False)
        obj = et["obj"].to_numpy(zero_copy_only=False)
        order = np.lexsort((obj, subj))
        subj, obj = subj[order], obj[order]
        subj_sorted, starts_idx = np.unique(subj, return_index=True)
        offsets = np.append(starts_idx, len(subj))
        adj_ref = ray.put((subj_sorted, offsets, obj))

        state = nodes.map_batches(
            lambda t: pa.table({"start": t["node"], "cur": t["node"]}),
            batch_format="pyarrow").materialize()
        for i in range(length):
            def step_fn(t: pa.Table, _i=i) -> pa.Table:
                ss, oo, ff = ray.get(adj_ref)
                starts = t["start"].to_numpy(zero_copy_only=False)
                curs = t["cur"].to_numpy(zero_copy_only=False)
                s2, nxt = pick_next(starts, curs, _i, ss, oo, ff)
                return pa.table({"start": pa.array(s2.tolist(),
                                                   pa.string()),
                                 "cur": pa.array(nxt.tolist(),
                                                 pa.string())})

            state = state.map_batches(step_fn,
                                      batch_format="pyarrow").materialize()
            outs.append(state.map_batches(
                lambda t, _i=i: pa.table({
                    "start": t["start"],
                    "step": pa.array(np.full(t.num_rows, _i + 1,
                                             np.int64)),
                    "node": t["cur"]}),
                batch_format="pyarrow"))
        res = outs[0]
        for o in outs[1:]:
            res = res.union(o)
        return res

    # co-partitioned mode: edges keyed by hash(subj) once; each round
    # unions the walk frontier (keyed by hash(cur)) with the edge set
    # and resolves next hops inside the partition
    adj = edges.map_batches(
        lambda t: pa.table({
            "subj": t["subj"], "obj": t["obj"],
            "start": pa.nulls(t.num_rows, pa.string()),
            "part": _part_of(t["subj"], n_parts)}),
        batch_format="pyarrow").materialize()

    state = nodes.map_batches(
        lambda t: pa.table({"start": t["node"], "cur": t["node"]}),
        batch_format="pyarrow").materialize()
    for i in range(length):
        frontier = state.map_batches(
            lambda t: pa.table({
                "subj": t["cur"],
                "obj": pa.nulls(t.num_rows, pa.string()),
                "start": t["start"],
                "part": _part_of(t["cur"], n_parts)}),
            batch_format="pyarrow")

        def local_step(df, _i=i):
            import pandas as pd

            e = df[df["obj"].notna()].sort_values(["subj", "obj"])
            w = df[df["obj"].isna()]
            if not len(e) or not len(w):
                return pd.DataFrame({"start": [], "cur": []})
            subj_sorted, starts_idx = np.unique(
                e["subj"].to_numpy(), return_index=True)
            offsets = np.append(starts_idx, len(e))
            s2, nxt = pick_next(w["start"].to_numpy(),
                                w["subj"].to_numpy(), _i,
                                subj_sorted, offsets,
                                e["obj"].to_numpy())
            return pd.DataFrame({"start": s2, "cur": nxt})

        state = (frontier.union(adj)
                 .groupby("part")
                 .map_groups(local_step, batch_format="pandas")
                 .repartition(n_parts).materialize())
        outs.append(state.map_batches(
            lambda t, _i=i: pa.table({
                "start": t["start"],
                "step": pa.array(np.full(t.num_rows, _i + 1, np.int64)),
                "node": t["cur"]}),
            batch_format="pyarrow"))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def modularity_profile(edges_ds, labels_ds, a_col: str = "norm_a",
                       b_col: str = "norm_b",
                       n_parts: int | None = None):
    """NEWMAN MODULARITY profile of a community partition — the
    quality metric every community-detection run is judged by. Per
    community: node count, intra-community edge count, degree mass,
    and the EXACT integer numerator of its modularity contribution,
    ``q_num = 4·m·e_in − deg_sum²`` over the common denominator
    ``4·m²`` (total Q = Σ q_num / (4 m²)) — no division anywhere, so
    the result is bit-exact and SQL-replayable with BIGINT arithmetic.

    Shape: the undirected distinct-pair edge table is materialized
    once and reused three ways — ONE tiny count aggregate for ``m``,
    then community labels attach to each endpoint via two
    co-partitioned tag-union merges (`_attach_val`; labels move,
    never broadcast). The doubly-labeled edges emit composable
    (community, e_in, deg) partials per batch, unioned with
    label-side node counts into ONE community-hash exchange.
    Returns (community, n_nodes, e_in, deg_sum, q_num).
    """
    import numpy as np
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)

    # endpoint columns only: the weight column would ride through two
    # pandas-block merges (whose null fillers are typed off the FIRST
    # attach's lost Arrow schema) and is not part of modularity anyway
    edges = edges_ds.map_batches(
        lambda t: t.select([a_col, b_col]),
        batch_format="pyarrow").materialize()
    m = edges.count()

    vals = labels_ds.map_batches(
        lambda t: pa.table({"node": t["node"], "val": t["community"]}),
        batch_format="pyarrow")
    labeled = _attach_val(
        _attach_val(edges, vals, a_col, "ca", n_parts),
        vals, b_col, "cb", n_parts)

    def edge_partials(df: pd.DataFrame) -> pd.DataFrame:
        ein = (df["ca"].to_numpy() == df["cb"].to_numpy()).astype(np.int64)
        part = pd.DataFrame({
            "community": np.concatenate([df["ca"].to_numpy(),
                                         df["cb"].to_numpy()]),
            "n_nodes": np.zeros(2 * len(df), np.int64),
            "e_in": np.concatenate([ein, np.zeros(len(df), np.int64)]),
            "deg": np.ones(2 * len(df), np.int64)})
        g = part.groupby("community", as_index=False).sum()
        g["part"] = fast_part_hash(g["community"], n_parts)
        return g

    def node_partials(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("community", as_index=False)
             .agg(n_nodes=("node", "count")))
        g["n_nodes"] = g["n_nodes"].astype("int64")
        g["e_in"] = np.zeros(len(g), np.int64)
        g["deg"] = np.zeros(len(g), np.int64)
        g["part"] = fast_part_hash(g["community"], n_parts)
        return g

    tagged = (labeled.map_batches(edge_partials, batch_format="pandas")
              .union(labels_ds.map_batches(node_partials,
                                           batch_format="pandas"))
              .repartition(n_parts))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("community", as_index=False)[
            ["n_nodes", "e_in", "deg"]].sum()
        out = pd.DataFrame({
            "community": g["community"],
            "n_nodes": g["n_nodes"].astype("int64"),
            "e_in": g["e_in"].astype("int64"),
            "deg_sum": g["deg"].astype("int64")})
        out["q_num"] = (4 * m * out["e_in"]
                        - out["deg_sum"] * out["deg_sum"]).astype("int64")
        return out

    return tagged.groupby("part").map_groups(fold, batch_format="pandas")


def clustering_coefficients(edges_ds, a_col: str = "norm_a",
                            b_col: str = "norm_b",
                            n_parts: int | None = None):
    """PER-NODE local clustering coefficient — the triangle-density
    profile behind every "is this neighborhood a community or a hub
    spray" judgment: for each node, its degree, the number of triangles
    through it, and ``cc_micro = ⌊10⁶ · tri / C(deg, 2)⌋`` (0 when
    deg < 2), all-integer via ``(2·10⁶·tri) // (deg·(deg−1))``.

    Same wedge-then-verify shape as `triangle_count` with the hub
    CARRIED on each wedge: verified closings credit all three corners
    (hub, v, w) as composable (node, tri) partials, which meet the
    degree partials (one per edge endpoint) in ONE node-hash exchange.
    The skew note from `triangle_count` applies unchanged (a degree-d
    hub emits d(d−1)/2 wedges). Returns (node, degree, n_tri,
    cc_micro)."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def tag_hub(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(fast_part_hash(t["a"], n_parts)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for hub, grp in df.groupby("a"):
            nb = np.sort(grp["b"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"u": np.full(len(i), hub,
                                                   dtype=object),
                                      "v": nb[i], "w": nb[j]}))
        if not outs:
            return pd.DataFrame({"u": pd.Series([], dtype=object),
                                 "v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "is_edge": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["is_edge"] = np.zeros(len(out), dtype=np.int64)
        return out

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"u": pa.nulls(t.num_rows, pa.string()),
                         "v": t["a"], "w": t["b"],
                         "is_edge": pa.array(np.ones(t.num_rows,
                                                     np.int64))})

    def tag_pair(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["v"], t["w"], "\x1f")
        return t.append_column(
            "part", pa.array(fast_part_hash(key, n_parts)))

    wedge_ds = (edges.map_batches(tag_hub, batch_format="pyarrow")
                .groupby("part").map_groups(wedges, batch_format="pandas"))
    tagged = (wedge_ds.map_batches(tag_pair, batch_format="pyarrow")
              .union(edges.map_batches(edge_rows, batch_format="pyarrow")
                     .map_batches(tag_pair, batch_format="pyarrow")))

    def close_corners(df: pd.DataFrame) -> pd.DataFrame:
        have = df.loc[df["is_edge"] == 1, ["v", "w"]]
        keys = set(zip(have["v"], have["w"]))
        wdg = df.loc[df["is_edge"] == 0, ["u", "v", "w"]]
        hit = np.fromiter((p in keys for p in zip(wdg["v"], wdg["w"])),
                          dtype=bool, count=len(wdg))
        tri = wdg[hit]
        corners = pd.DataFrame({
            "node": np.concatenate([tri["u"].to_numpy(),
                                    tri["v"].to_numpy(),
                                    tri["w"].to_numpy()]),
            "deg": np.zeros(3 * len(tri), np.int64),
            "tri": np.ones(3 * len(tri), np.int64)})
        g = corners.groupby("node", as_index=False).sum()
        g["p2"] = fast_part_hash(g["node"], n_parts)
        return g

    def deg_rows(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t["a"].combine_chunks(),
                                 t["b"].combine_chunks()])
        g = (pa.table({"node": node,
                       "deg": pa.array(np.ones(len(node), np.int64)),
                       "tri": pa.array(np.zeros(len(node), np.int64))})
             .group_by("node").aggregate([("deg", "sum"), ("tri", "sum")]))
        g = g.rename_columns(["node", "deg", "tri"])
        return g.append_column(
            "p2", pa.array(fast_part_hash(g["node"], n_parts)))

    corners = (tagged.groupby("part").map_groups(close_corners,
                                                 batch_format="pandas")
               # normalize to Arrow blocks: a pandas+arrow mixed union
               # trips Ray 2.49's inferred-block-type assert downstream
               .map_batches(lambda t: t, batch_format="pyarrow"))
    merged = (corners
              .union(edges.map_batches(deg_rows, batch_format="pyarrow"))
              .repartition(n_parts))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)[["deg", "tri"]].sum()
        deg = g["deg"].astype("int64")
        tri = g["tri"].astype("int64")
        denom = (deg * (deg - 1)).to_numpy()
        cc = np.where(denom > 0,
                      (2_000_000 * tri.to_numpy()) // np.maximum(denom, 1),
                      0)
        return pd.DataFrame({"node": g["node"], "degree": deg,
                             "n_tri": tri,
                             "cc_micro": cc.astype(np.int64)})

    return merged.groupby("p2").map_groups(fold, batch_format="pandas")


def degree_mixing_stats(edges_ds, a_col: str = "norm_a",
                        b_col: str = "norm_b",
                        n_parts: int | None = None):
    """DEGREE-MIXING sufficient statistics — the exact-integer inputs
    to Newman's degree assortativity: over the distinct undirected
    edges, the edge count ``m`` and the sums Σ j·k, Σ (j+k) and
    Σ (j²+k²) of endpoint degrees. The float coefficient
    ``r = (Σjk/m − (Σ(j+k)/2m)²) / (Σ(j²+k²)/2m − (Σ(j+k)/2m)²)``
    is one driver-side division away — publishing the integer sums
    keeps the distributed result bit-exact and SQL-replayable (the
    same numerator-contract idea as `modularity_profile`).

    Shape: distinct oriented edges → per-node degree partials → the
    degree table attaches to both endpoints via two co-partitioned
    tag-union merges (degrees move, never broadcast) → per-batch
    partial sums → ONE scalar fold. Returns a one-row frame
    (m, sum_jk, sum_j_plus_k, sum_jj_plus_kk)."""
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    import pandas as pd

    from ..functions.hashing import fast_part_hash

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["a", "b"], n_parts=n_parts).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t["a"].combine_chunks(),
                                 t["b"].combine_chunks()])
        g = (pa.table({"node": node,
                       "d": pa.array(np.ones(len(node), np.int64))})
             .group_by("node").aggregate([("d", "sum")]))
        g = g.rename_columns(["node", "d"])
        return g.append_column(
            "part", pa.array(fast_part_hash(g["node"], n_parts)))

    def deg_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["d"].sum()
        # _attach_val carries the value as a string column
        return pd.DataFrame({"node": g["node"],
                             "val": g["d"].astype("int64").astype(str)})

    degs = (edges.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("part").map_groups(deg_fold, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))

    labeled = _attach_val(
        _attach_val(edges, degs, "a", "dj", n_parts),
        degs, "b", "dk", n_parts)

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        j = df["dj"].astype("int64").to_numpy()
        k = df["dk"].astype("int64").to_numpy()
        return pd.DataFrame({
            "m": pd.array([len(df)], dtype="int64"),
            "sum_jk": pd.array([int((j * k).sum())], dtype="int64"),
            "sum_j_plus_k": pd.array([int((j + k).sum())], dtype="int64"),
            "sum_jj_plus_kk": pd.array([int((j * j + k * k).sum())],
                                       dtype="int64")})

    from ray.data.aggregate import Sum

    parts = labeled.map_batches(sums, batch_format="pandas")
    agg = parts.aggregate(Sum("m"), Sum("sum_jk"), Sum("sum_j_plus_k"),
                          Sum("sum_jj_plus_kk"))
    return pd.DataFrame({
        "m": pd.array([agg["sum(m)"] or 0], dtype="int64"),
        "sum_jk": pd.array([agg["sum(sum_jk)"] or 0], dtype="int64"),
        "sum_j_plus_k": pd.array([agg["sum(sum_j_plus_k)"] or 0],
                                 dtype="int64"),
        "sum_jj_plus_kk": pd.array([agg["sum(sum_jj_plus_kk)"] or 0],
                                   dtype="int64")})


def bgp_join(facts_ds, p1: str = "kg:acquired", p2: str = "kg:basedIn",
             subj_col: str = "subj", pred_col: str = "pred",
             obj_col: str = "obj", n_parts: int | None = None):
    """Basic-graph-pattern join — the 2-pattern SPARQL-style BGP
    ``?a p1 ?b . ?b p2 ?c`` evaluated over the constructed KG's fact
    stream; returns the DISTINCT binding set ``(a, b, c)``. This is the
    query-side counterpart of the extraction pipeline (the reference's
    output feeds a Jena resource index the same way —
    Extract.java:96-100's ``#ri`` graph).

    Shape: each pattern side filters its predicate and emits per-batch
    DISTINCT (key, val) pairs (the combiner — duplicate assertions from
    many pages collapse before the exchange), both sides ride ONE
    hash-partition exchange on the shared variable ``b`` (tag union, no
    join operator), and the per-partition merge emits a-values ×
    c-values per b. Distinctness is global because all rows of a given
    b co-locate. Skew note: a head entity with many a- and c-bindings
    produces |a|·|c| rows — that is the query RESULT size, not a plan
    artifact; cap upstream if a bounded preview is wanted."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts

    n_parts = n_parts or default_parts(1.0)

    def side(pred, key_col, val_col, tag):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t[pred_col], pred))
            g = (pa.table({"key": t[key_col], "val": t[val_col]})
                 .group_by(["key", "val"]).aggregate([]))
            return pa.table({
                "key": g["key"],
                "val": g["val"],
                "tag": pa.array(np.full(g.num_rows, tag, np.int8)),
                "part": pa.array(fast_part_hash(g["key"], n_parts)),
            })
        return fn

    lhs = facts_ds.map_batches(side(p1, obj_col, subj_col, 0),
                               batch_format="pyarrow")
    rhs = facts_ds.map_batches(side(p2, subj_col, obj_col, 1),
                               batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        av = df[df["tag"] == 0][["key", "val"]].drop_duplicates()
        cv = df[df["tag"] == 1][["key", "val"]].drop_duplicates()
        out = av.merge(cv, on="key", suffixes=("_a", "_c"))
        return pd.DataFrame({"a": out["val_a"], "b": out["key"],
                             "c": out["val_c"]})

    return (lhs.union(rhs).groupby("part")
            .map_groups(merge, batch_format="pandas"))


def bgp_optional(facts_ds, p1: str = "kg:acquired",
                 p2: str = "kg:basedIn", subj_col: str = "subj",
                 pred_col: str = "pred", obj_col: str = "obj",
                 n_parts: int | None = None):
    """SPARQL OPTIONAL — the left-join BGP ``?a p1 ?b . OPTIONAL { ?b
    p2 ?c }``: every DISTINCT (a, b) binding of the required pattern
    survives; where the optional pattern matches b it fans out to its
    c-bindings, otherwise c is the empty string (the engine's
    no-binding marker — '' is never a term, and it keeps the oracle's
    ``coalesce`` exact without a NULL-representation contract).

    Same physical shape as `bgp_join` (one tag-union exchange on the
    shared variable, per-batch DISTINCT combiners on both sides, no
    join operator); only the per-partition merge differs (left merge
    instead of inner). Distinctness is global because all rows of a
    given b co-locate."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts

    n_parts = n_parts or default_parts(1.0)

    def side(pred, key_col, val_col, tag):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t[pred_col], pred))
            g = (pa.table({"key": t[key_col], "val": t[val_col]})
                 .group_by(["key", "val"]).aggregate([]))
            return pa.table({
                "key": g["key"],
                "val": g["val"],
                "tag": pa.array(np.full(g.num_rows, tag, np.int8)),
                "part": pa.array(fast_part_hash(g["key"], n_parts)),
            })
        return fn

    lhs = facts_ds.map_batches(side(p1, obj_col, subj_col, 0),
                               batch_format="pyarrow")
    rhs = facts_ds.map_batches(side(p2, subj_col, obj_col, 1),
                               batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        av = df[df["tag"] == 0][["key", "val"]].drop_duplicates()
        cv = df[df["tag"] == 1][["key", "val"]].drop_duplicates()
        out = av.merge(cv, on="key", how="left", suffixes=("_a", "_c"))
        return pd.DataFrame({
            "a": out["val_a"], "b": out["key"],
            "c": out["val_c"].fillna("")})

    return (lhs.union(rhs).groupby("part")
            .map_groups(merge, batch_format="pandas"))


def harmonic_2hop(edges_ds, a_col: str = "subj", b_col: str = "obj",
                  n_parts: int | None = None):
    """Bounded-radius HARMONIC CENTRALITY (Boldi & Vigna 2014) at ≤2
    hops over the DIRECTED graph, integer-scaled ×2 so both distance
    weights stay exact: ``harmonic_x2(v) = 2·|{u: d(u→v)=1}| +
    |{u: d(u→v)=2}|`` (the 1/1 and 1/2 terms of Σ 1/d truncated at
    radius 2).

    Shape (every stage a combiner + ONE exchange):
      1. distinct edges, distinct nodes,
      2. distance-2 candidates: in-rows and out-rows co-partitioned on
         the MID node (one exchange), per-mid vectorized cross merge —
         the directed analog of ``two_hop_scores``' wedge emit, same
         Σ(d_in·d_out) hub bound,
      3. pairs tag-unioned with the distance-1 edge set on the (u, v)
         pair hash (one exchange) — pairs that close a direct edge are
         distance 1, not 2,
      4. per-node counts for both rings and a final tag-union sum on
         the node hash, zero-filled from the node set.

    Returns (node, harmonic_x2), one row per graph node."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts

    n_parts = n_parts or default_parts(1.0)

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"u": pc.cast(t[a_col], pa.string()),
                         "v": pc.cast(t[b_col], pa.string())})

    edges = _distinct(edges_ds.map_batches(to_ab, batch_format="pyarrow"),
                      ["u", "v"], n_parts=n_parts).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()])})

    nodes = _distinct(edges.map_batches(both_ends, batch_format="pyarrow"),
                      ["node"], n_parts=n_parts)

    # --- distance-2 candidate pairs, co-partitioned on the mid node
    def in_rows(t: pa.Table) -> pa.Table:  # u -> mid
        out = pa.table({"mid": t["v"], "node": t["u"],
                        "role": pa.array(np.zeros(t.num_rows, np.int8))})
        return out.append_column(
            "part", pa.array(fast_part_hash(out["mid"], n_parts)))

    def out_rows(t: pa.Table) -> pa.Table:  # mid -> v
        out = pa.table({"mid": t["u"], "node": t["v"],
                        "role": pa.array(np.ones(t.num_rows, np.int8))})
        return out.append_column(
            "part", pa.array(fast_part_hash(out["mid"], n_parts)))

    def cross(df: pd.DataFrame) -> pd.DataFrame:
        ins = df[df["role"] == 0][["mid", "node"]].rename(
            columns={"node": "u"})
        outs = df[df["role"] == 1][["mid", "node"]].rename(
            columns={"node": "v"})
        m = ins.merge(outs, on="mid")[["u", "v"]]
        m = m[m["u"] != m["v"]].drop_duplicates()
        return m

    pairs = (edges.map_batches(in_rows, batch_format="pyarrow")
             .union(edges.map_batches(out_rows, batch_format="pyarrow"))
             .groupby("part").map_groups(cross, batch_format="pandas"))

    # --- drop pairs that are direct edges (distance 1 wins)
    def tag_pair(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(t["u"], t["v"], "\x1f")
            out = pa.table({"u": t["u"], "v": t["v"],
                            "kind": pa.array(np.full(t.num_rows, kind,
                                                     np.int64))})
            return out.append_column(
                "part", pa.array(fast_part_hash(key, n_parts)))
        return fn

    def open_only(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u", "v"], as_index=False)["kind"].min()
        g = g[g["kind"] > 0]  # no edge row ⇒ genuine distance-2
        return g[["u", "v"]]

    loop_free = edges.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["u"], t["v"]))),
        batch_format="pyarrow").materialize()
    d2 = (pairs.map_batches(tag_pair(1), batch_format="pyarrow")
          .union(loop_free.map_batches(tag_pair(-1),
                                       batch_format="pyarrow"))
          .groupby("part").map_groups(open_only, batch_format="pandas"))

    # --- per-node ring counts -> one zero-filled tag-union sum
    def count_v(weight: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("v", as_index=False).size()
            return pd.DataFrame({
                "node": g["v"].to_numpy(),
                "inc": (g["size"] * weight).astype("int64").to_numpy()})
        return fn

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "inc": pa.array(np.zeros(t.num_rows, np.int64))})

    def tag_node(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(fast_part_hash(t["node"], n_parts)))

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["inc"].sum()
        return pd.DataFrame({"node": g["node"].to_numpy(),
                             "harmonic_x2": g["inc"].astype("int64")
                                             .to_numpy()})

    d1_counts = loop_free.map_batches(
        lambda t: pa.table({"node": t["v"],
                            "inc": pa.array(np.full(t.num_rows, 2,
                                                    np.int64))}),
        batch_format="pyarrow")
    d2_counts = d2.map_batches(
        lambda t: pa.table({"node": t["v"],
                            "inc": pa.array(np.ones(t.num_rows,
                                                    np.int64))}),
        batch_format="pyarrow")

    return (nodes.map_batches(zero_rows, batch_format="pyarrow")
            .union(d1_counts, d2_counts)
            .map_batches(tag_node, batch_format="pyarrow")
            .groupby("part").map_groups(final_sum, batch_format="pandas"))


def wedge_pairs(ds, block_cols, item_col, min_count: int = 1,
                max_df: int | None = None,
                out_cols=("d1", "d2", "n"),
                n_parts: int | None = None):
    """Shared BLOCKING-KEY PAIR COUNTER — the wedge shape
    `sameas_candidates`, `winnowing_pairs` and `host_cocitation` all
    instantiate: count, for every unordered pair of ITEMS, the number
    of distinct BLOCKS containing both.

    Shape: per-batch DISTINCT (item, block) combiner → ONE block-hash
    exchange co-locating each block's item list (blocks wider than
    ``max_df`` items are DROPPED there — the quadratic-wedge guard) →
    per-block vectorized cross merge emits C(n, 2) pair PARTIALS (a
    block lives in exactly one partition, so partials are disjoint) →
    ONE pair-hash exchange sums and thresholds at ``min_count``. Cost
    is Σ n_items² over blocks — `two_hop_scores`' bound. Input batches
    must carry ``block_cols`` + ``item_col``; items must be mutually
    orderable (the pair is emitted as (min, max))."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)
    block_cols = list(block_cols)
    c1, c2, cn = out_cols

    # internal exchange columns: prefixed so no out_cols / block_cols
    # / item_col choice can collide with them (a caller naming an
    # output column "p2" must not clobber the pair-hash routing)
    P1, P2 = "__wp_part", "__wp_part2"

    def combine(t: pa.Table) -> pa.Table:
        g = (t.select([item_col] + block_cols)
             .group_by([item_col] + block_cols).aggregate([]))
        key = g[block_cols[0]].cast(pa.string())
        for c in block_cols[1:]:
            key = pc.binary_join_element_wise(
                key, g[c].cast(pa.string()), "\x1f")
        return g.append_column(
            P1, pa.array(fast_part_hash(key, n_parts)))

    def cross(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([item_col] + block_cols)
        if max_df is not None:
            sz = df.groupby(block_cols)[item_col].transform("size")
            df = df[sz <= max_df]
        m = df[[item_col] + block_cols].merge(
            df[[item_col] + block_cols], on=block_cols)
        a, b = item_col + "_x", item_col + "_y"
        m = m[m[a] < m[b]]
        g = (m.groupby([a, b], as_index=False).size()
             .rename(columns={a: c1, b: c2, "size": "n"}))
        g["n"] = g["n"].astype("int64")
        key = g[c1].astype(str) + "\x1f" + g[c2].astype(str)
        g[P2] = fast_part_hash(list(key), n_parts)
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([c1, c2], as_index=False)["n"].sum()
        if min_count > 1:
            g = g[g["n"] >= min_count]
        g["n"] = g["n"].astype("int64")
        return g.rename(columns={"n": cn})

    return (ds.map_batches(combine, batch_format="pyarrow")
            .groupby(P1).map_groups(cross, batch_format="pandas")
            .groupby(P2).map_groups(fold, batch_format="pandas"))


def sameas_candidates(facts_ds, min_shared: int = 2,
                      subj_col: str = "subj", pred_col: str = "pred",
                      obj_col: str = "obj", n_parts: int | None = None):
    """ENTITY-RESOLUTION CANDIDATES by shared assertions: subject pairs
    (e1 < e2) asserting at least ``min_shared`` identical (pred, obj)
    slots are owl:sameAs candidates — the structural step AFTER
    string canonicalization (`build_entity_map` merges surface forms;
    this surfaces aliases with DIFFERENT surfaces that behave
    identically in the graph). Classic blocking-key ER: the block key
    is the (pred, obj) slot itself.

    Shape: `wedge_pairs` on block = the (pred, obj) slot, item = the
    subject — per-batch distinct combiner, ONE slot-hash exchange with
    the per-slot cross merge, ONE pair-hash threshold sum. Cost is
    Σ n_subj² over slots; a slot shared by a true hub
    ('rdf:type kg:WebPage'-class predicates) must be excluded upstream
    or df-capped, exactly as `ngram_pairs` caps df.

    Returns (e1, e2, n_shared) with n_shared ≥ min_shared."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"s": t[subj_col], "p": t[pred_col],
                         "o": t[obj_col]})

    return wedge_pairs(
        facts_ds.map_batches(project, batch_format="pyarrow"),
        block_cols=["p", "o"], item_col="s", min_count=min_shared,
        out_cols=("e1", "e2", "n_shared"), n_parts=n_parts)


def property_path(facts_ds, pred: str = "kg:acquired", max_len: int = 3,
                  subj_col: str = "subj", pred_col: str = "pred",
                  obj_col: str = "obj", n_parts: int | None = None):
    """SPARQL property-path reachability ``a (p)+ d`` bounded at
    ``max_len`` hops: all DISTINCT ordered pairs connected by a chain
    of ``pred`` edges of length 1..max_len, each with its SHORTEST
    chain length — the acquisition-chain / ownership-chain query a KG
    consumer runs ("what does a transitively own, and how directly").

    Shape: the distinct ``pred`` edge set is materialized once; then
    ``max_len − 1`` rounds, each ONE tag-union co-partition exchange
    joining the frontier's tail to edge heads (the `bgp_join` merge),
    with per-round DISTINCT combiners. Pairs carry their first
    (= shortest, by BFS order) length; the final node-pair exchange
    keeps the min. Diameter-bounded by construction — max_len is a
    query parameter, not an iteration guess."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts
    n_parts = n_parts or default_parts(1.0)

    def edge_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t[pred_col], pred))
        g = (pa.table({"a": t[subj_col], "b": t[obj_col]})
             .group_by(["a", "b"]).aggregate([]))
        return g

    # GLOBAL distinct before materializing: the same edge is asserted
    # by many docs across many batches, and this table rides every
    # round's exchange — shuffle volume must scale with distinct
    # edges, not assertion count
    edges = _distinct(
        facts_ds.map_batches(edge_rows, batch_format="pyarrow"),
        ["a", "b"], n_parts=n_parts).materialize()

    def tag(col, vals_tbl_cols, tagv):
        def fn(t: pa.Table) -> pa.Table:
            out = pa.table(dict(vals_tbl_cols(t)))
            out = out.append_column(
                "tag", pa.array(np.full(out.num_rows, tagv, np.int8)))
            return out.append_column(
                "part", pa.array(fast_part_hash(out[col], n_parts)))
        return fn

    # paths: (a, d, length); frontier starts as the edges themselves
    frontier = edges.map_batches(
        lambda t: pa.table({"a": t["a"], "d": t["b"],
                            "length": pa.array(
                                np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow").materialize()
    all_paths = [frontier]

    for _ in range(max_len - 1):
        lhs = frontier.map_batches(
            tag("key", lambda t: {"key": t["d"], "val": t["a"]}, 0),
            batch_format="pyarrow")
        rhs = edges.map_batches(
            tag("key", lambda t: {"key": t["a"], "val": t["b"]}, 1),
            batch_format="pyarrow")
        def extend(df: pd.DataFrame) -> pd.DataFrame:
            av = df[df["tag"] == 0][["key", "val"]].drop_duplicates()
            bv = df[df["tag"] == 1][["key", "val"]].drop_duplicates()
            m = av.merge(bv, on="key", suffixes=("_a", "_d"))
            out = pd.DataFrame({"a": m["val_a"], "d": m["val_d"]})
            return out.drop_duplicates()

        nxt = (lhs.union(rhs).groupby("part")
               .map_groups(extend, batch_format="pandas"))
        k = len(all_paths) + 1
        frontier = nxt.map_batches(
            lambda t, _k=k: t.append_column(
                "length", pa.array(np.full(t.num_rows, _k, np.int64))),
            batch_format="pyarrow").materialize()
        all_paths.append(frontier)

    def min_len(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "d"], as_index=False)["length"].min()
        g["length"] = g["length"].astype("int64")
        return g

    union = all_paths[0]
    for p in all_paths[1:]:
        union = union.union(p)
    tagged = union.map_batches(
        lambda t: t.append_column("part", pa.array(fast_part_hash(
            pc.binary_join_element_wise(t["a"], t["d"], "\x1f"),
            n_parts))),
        batch_format="pyarrow")
    return tagged.groupby("part").map_groups(min_len,
                                             batch_format="pandas")


def star_join(facts_ds, p1: str = "kg:worksWith",
              p2: str = "kg:acquired", subj_col: str = "subj",
              pred_col: str = "pred", obj_col: str = "obj",
              n_parts: int | None = None):
    """STAR-shaped BGP ``?s p1 ?a . ?s p2 ?b`` — the subject-join
    companion of `bgp_join`'s chain: DISTINCT bindings (s, a, b) for
    subjects asserting BOTH predicates. Star queries are the entity-
    card shape (all properties of one subject at once); the chain is
    the path shape.

    Same physical plan as `bgp_join` with the shared variable being
    the SUBJECT on both sides: per-side per-batch DISTINCT combiners,
    ONE tag-union exchange on s, per-partition cross merge. Result
    size per subject is |a|·|b| — the query's own output, as with the
    chain."""
    import pandas as pd

    from ..functions.hashing import fast_part_hash
    from ..runtime import default_parts

    n_parts = n_parts or default_parts(1.0)

    def side(pred, tag):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t[pred_col], pred))
            g = (pa.table({"key": t[subj_col], "val": t[obj_col]})
                 .group_by(["key", "val"]).aggregate([]))
            return pa.table({
                "key": g["key"], "val": g["val"],
                "tag": pa.array(np.full(g.num_rows, tag, np.int8)),
                "part": pa.array(fast_part_hash(g["key"], n_parts))})
        return fn

    lhs = facts_ds.map_batches(side(p1, 0), batch_format="pyarrow")
    rhs = facts_ds.map_batches(side(p2, 1), batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        av = df[df["tag"] == 0][["key", "val"]].drop_duplicates()
        bv = df[df["tag"] == 1][["key", "val"]].drop_duplicates()
        out = av.merge(bv, on="key", suffixes=("_a", "_b"))
        return pd.DataFrame({"s": out["key"], "a": out["val_a"],
                             "b": out["val_b"]})

    return (lhs.union(rhs).groupby("part")
            .map_groups(merge, batch_format="pandas"))
