"""Entity canonicalization — the wide shuffle stage (north rule).

Flow (SURVEY.md §7.1 step 5):

1. per-batch combiner: unique normalized surfaces → (norm, sip64) —
   bounds every shuffle key to ≤ #blocks rows before the exchange;
2. salted groupby on the SipHash-64 key (explicit skew handling for head
   entities: ``salt = sip64(src-dependent) % n_salts``, two-phase
   aggregate — min-ID is associative so partial→final is exact);
3. alias-dictionary + embedding linking (broadcast small side via
   ``ray.put`` once, read per actor in ``__init__`` — never re-shipped
   per batch);
4. min-ID union-find cluster resolution across keys (two surfaces linked
   to one entity merge; cluster id = lexicographic min candidate IRI).
   Cluster edges are (norm, candidate) pairs — #unique-entities scale,
   tiny next to the corpus — resolved driver-side; the iterate-to-
   fixpoint Dataset variant is the stated 100TB path (SURVEY.md §7.4).
5. resolution map applied back to quads either as a broadcast lookup
   (default; mapping ≈ #entities) or a Ray-native hash join
   (``resolve_quads_join`` — the at-scale path when the map outgrows a
   worker's heap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..runtime import pool as _pool
from ..functions.hashing import siphash64_batch
from ..functions.normalize import skolem_iri
from .extract import SURF_PREFIX


def _batch_unique_norms(t: pa.Table) -> pa.Table:
    """Combiner: extract unresolved surfaces from a quads batch, unique
    them within the batch, attach the SipHash-64 shuffle key."""
    chunks = []
    for col in ("subj", "obj"):
        c = t[col]
        if isinstance(c, pa.Array):
            c = pa.chunked_array([c])
        filtered = c.filter(pc.starts_with(c, SURF_PREFIX))
        chunks.extend(filtered.chunks)
    arr = pa.chunked_array(chunks or [pa.array([], pa.string())])
    uniq = pc.unique(arr)
    norms = pc.utf8_slice_codeunits(uniq, len(SURF_PREFIX), 2**31 - 1)
    h = siphash64_batch(norms.to_pylist())
    return pa.table({
        "norm": norms,
        "sip64": pa.array(h.astype(np.int64), pa.int64()),  # int64 for stable groupby
    })


def unique_norms(quads_ds, n_salts: int = 4):
    """Distinct (norm, sip64) via salted two-phase groupby.

    Phase 1 groups on (sip64, salt, norm) — a head key's duplicate rows
    split across ``n_salts`` reducers; phase 2 collapses the salts.
    Distinct is idempotent so the two-phase result is exact. Both phases
    use the builtin Count aggregate (vectorized block accumulation — no
    per-group Python call)."""
    from ray.data.aggregate import Count

    ds = quads_ds.map_batches(_batch_unique_norms, batch_format="pyarrow")

    def add_salt(t: pa.Table) -> pa.Table:
        salt = np.arange(t.num_rows, dtype=np.int64) % n_salts
        return t.append_column("salt", pa.array(salt.astype(np.int32)))

    ds = ds.map_batches(add_salt, batch_format="pyarrow")
    p1 = ds.groupby(["sip64", "salt", "norm"]).aggregate(Count())
    p2 = p1.groupby(["sip64", "norm"]).aggregate(Count())
    return p2.select_columns(["norm", "sip64"])


class AliasLinkStage:
    """Actor stage: (norm, sip64) → (norm, candidate_id).

    The alias dictionary (+ embedding matrix) is fetched from the object
    store once per actor (``ray.get`` in ``__init__``), mirroring the
    reference's per-worker interned vocabulary (RdfVocabulary.java:45-81).
    Surfaces missing from the dictionary fall back to embedding-cosine
    match against alias embeddings when close enough, else a skolem IRI.
    """

    def __init__(self, alias_ref, emb_threshold: float = 0.99):
        alias_tbl: pa.Table = ray.get(alias_ref)
        self.alias: dict[str, str] = dict(
            zip(alias_tbl["surface"].to_pylist(), alias_tbl["entity_id"].to_pylist())
        )
        emb = np.asarray(alias_tbl["embedding"].to_pylist(), dtype=np.float64)
        if emb.size:
            self.emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        else:
            self.emb = emb
        self.emb_ids = alias_tbl["entity_id"].to_pylist()
        self.emb_threshold = emb_threshold

    @staticmethod
    def _surface_embedding(norm: str) -> np.ndarray:
        """Deterministic 16-dim char-ngram hash embedding of a surface."""
        from ..functions.hashing import siphash64_str

        v = np.zeros(16, dtype=np.float64)
        for i in range(len(norm) - 2):
            v[siphash64_str(norm[i : i + 3]) % 16] += 1.0
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, t: pa.Table) -> pa.Table:
        norms = t["norm"].to_pylist()
        cands = []
        for norm in norms:
            hit = self.alias.get(norm)
            if hit is None and len(self.emb):
                sims = self.emb @ self._surface_embedding(norm)
                j = int(np.argmax(sims))
                if sims[j] >= self.emb_threshold:
                    hit = self.emb_ids[j]
            cands.append(hit if hit is not None else skolem_iri(norm))
        return pa.table({
            "norm": t["norm"],
            "candidate_id": pa.array(cands, pa.string()),
        })


def union_find_min_id(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Min-ID cluster resolution over bipartite (norm, candidate) edges.
    Two norms merge when they share a candidate id; the cluster's
    canonical IRI is the lexicographic min candidate. Driver-side —
    edges are #entities-scale (SURVEY.md §7.4 documents the Dataset
    iterate-to-fixpoint variant for when they are not)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for norm, cand in pairs:
        union("n\x00" + norm, "c\x00" + cand)

    # canonical candidate per cluster root = min candidate id
    best: dict[str, str] = {}
    for _, cand in pairs:
        r = find("c\x00" + cand)
        if r not in best or cand < best[r]:
            best[r] = cand
    out: dict[str, str] = {}
    for norm, _ in pairs:
        out[norm] = best[find("n\x00" + norm)]
    return out


def build_entity_map(quads_ds, alias_table: pa.Table, n_salts: int = 4) -> dict[str, str]:
    """norm → canonical IRI for every unresolved surface in ``quads_ds``."""
    norms = unique_norms(quads_ds, n_salts=n_salts)
    alias_ref = ray.put(alias_table)
    linked = norms.map_batches(
        AliasLinkStage,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        concurrency=_pool(0.5),
    )
    # The edge list is #unique-entities scale — a small result; collecting
    # it on the driver is the documented design (SURVEY.md §7.4).
    rows = linked.take_all()
    pairs = [(r["norm"], r["candidate_id"]) for r in rows]
    return union_find_min_id(pairs)


def _resolve_col(col: pa.ChunkedArray, mapping: dict[str, str]) -> pa.Array:
    vals = col.to_pylist()
    plen = len(SURF_PREFIX)
    out = [mapping.get(v[plen:], skolem_iri(v[plen:])) if v.startswith(SURF_PREFIX) else v
           for v in vals]
    return pa.array(out, pa.string())


def resolve_quads(quads_ds, mapping: dict[str, str]):
    """Broadcast-apply the canonical map (ray.put once; each actor reads it
    from the object store in __init__ — never re-shipped per batch)."""
    map_ref = ray.put(mapping)

    class Resolver:
        def __init__(self):
            self.mapping = ray.get(map_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.set_column(t.schema.get_field_index("subj"), "subj",
                             _resolve_col(t["subj"], self.mapping))
            t = t.set_column(t.schema.get_field_index("obj"), "obj",
                             _resolve_col(t["obj"], self.mapping))
            return t

    return quads_ds.map_batches(Resolver, batch_format="pyarrow",
                                concurrency=_pool(0.75))


def resolve_quads_join(quads_ds, mapping: dict[str, str], num_partitions: int = 8):
    """At-scale path: resolve via Ray-native hash joins on the surface key
    instead of a broadcast dict (for when the mapping outgrows worker
    heaps). Semantically identical to ``resolve_quads`` (tested)."""
    import ray.data as rd

    map_ds_s = rd.from_items(
        [{"subj": SURF_PREFIX + k, "subj_canon": v} for k, v in mapping.items()]
    )
    map_ds_o = rd.from_items(
        [{"obj": SURF_PREFIX + k, "obj_canon": v} for k, v in mapping.items()]
    )
    ds = quads_ds.join(map_ds_s, join_type="left_outer", num_partitions=num_partitions,
                       on=("subj",))
    ds = ds.join(map_ds_o, join_type="left_outer", num_partitions=num_partitions,
                 on=("obj",))

    def finish(t: pa.Table) -> pa.Table:
        subj = pc.coalesce(t["subj_canon"], t["subj"])
        obj = pc.coalesce(t["obj_canon"], t["obj"])
        t = t.set_column(t.schema.get_field_index("subj"), "subj", subj)
        t = t.set_column(t.schema.get_field_index("obj"), "obj", obj)
        return t.drop_columns(["subj_canon", "obj_canon"])

    return ds.map_batches(finish, batch_format="pyarrow")
