"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once via ``ray.put`` (read per actor in ``__init__``, never re-shipped
  per batch); each batch computes a float64 matmul against it and emits
  its local top-k per query; a final tiny merge (candidates are
  #blocks × #queries × k) picks the global top-k. Scores are emitted in
  micro-units (floor ×1e6, int64) so the DuckDB oracle compares exactly.
- ``knn_ivf`` — the scale path: a deterministic coarse quantizer
  (seeded k-means on a sample) buckets vectors; queries probe the
  ``n_probe`` nearest centroids only. Approximate; recall vs brute
  force is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _unit(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


class BruteForceTopKStage:
    """embeddings batch → local top-k candidates per query."""

    def __init__(self, queries_ref, k: int, id_col="vec_id", vec_col="embedding"):
        q = ray.get(queries_ref)  # dict: query_id -> vector
        self.qids = list(q.keys())
        self.Q = np.asarray([q[i] for i in self.qids], dtype=np.float64)
        self.qn = np.sqrt((self.Q * self.Q).sum(axis=1))
        self.qn[self.qn == 0] = 1.0
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t[self.id_col].to_pylist(), dtype=np.int64)
        V = np.asarray(t[self.vec_col].to_pylist(), dtype=np.float64)
        vn = np.sqrt((V * V).sum(axis=1))
        vn[vn == 0] = 1.0
        # dot / (|q|·|v|) — the same formula shape as the SQL oracle so
        # floor(×1e6) agrees bit-for-bit in practice
        sims = (self.Q @ V.T) / (self.qn[:, None] * vn[None, :])
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])  # +1 to survive self-match removal
        for qi, qid in enumerate(self.qids):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            for j in idx:
                out_q.append(qid)
                out_n.append(int(ids[j]))
                out_s.append(int(np.floor(sims[qi, j] * 1e6)))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos_micro": pa.array(out_s, pa.int64()),
        })


def _merge_topk(cands: pd.DataFrame, k: int, exclude_self: bool) -> pd.DataFrame:
    if exclude_self:
        cands = cands[cands["query_id"] != cands["neighbor_id"]]
    cands = cands.sort_values(
        ["query_id", "cos_micro", "neighbor_id"],
        ascending=[True, False, True],
    )
    return cands.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


def knn_bruteforce(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5,
                   id_col="vec_id", vec_col="embedding", exclude_self=True,
                   concurrency=None):
    """Exact cosine top-k. Returns (query_id, neighbor_id, cos_micro).
    Ties broken by neighbor_id ascending (deterministic, oracle-safe)."""
    from ..runtime import pool

    q_ref = ray.put(query_vectors)
    cand_ds = emb_ds.map_batches(
        BruteForceTopKStage,
        fn_constructor_kwargs={"queries_ref": q_ref, "k": k,
                               "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=concurrency or pool(0.5),
    )
    # candidate set is #blocks × #queries × (k+1) — a small reduce; the
    # driver-side merge is the documented tree-reduce stand-in
    cands = cand_ds.to_pandas()
    return _merge_topk(cands, k, exclude_self)


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant — the at-scale path

def _kmeans_lite(X: np.ndarray, n_clusters: int, n_iter: int = 10,
                 seed: int = 99) -> np.ndarray:
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(_unit(X) @ _unit(C).T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


class IVFAssignStage:
    def __init__(self, centroids_ref, id_col="vec_id", vec_col="embedding"):
        self.C = _unit(ray.get(centroids_ref))
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t[self.id_col].to_pylist(), dtype=np.int64)
        V = _unit(np.asarray(t[self.vec_col].to_pylist(), dtype=np.float64))
        assign = np.argmax(V @ self.C.T, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(assign.astype(np.int64), pa.int64()),
            "unit_vec": pa.array(V.tolist(), pa.list_(pa.float64())),
        })


def knn_ivf(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5,
            n_clusters: int = 16, n_probe: int = 4, sample_size: int = 2048,
            id_col="vec_id", vec_col="embedding", exclude_self=True):
    """IVF top-k: train a coarse quantizer on a limited sample (seeded,
    deterministic), bucket all vectors via an actor-pool assign stage,
    then search only the ``n_probe`` buckets nearest each query."""
    from ..runtime import pool

    sample = emb_ds.limit(sample_size).to_pandas()
    X = np.asarray(sample[vec_col].tolist(), dtype=np.float64)
    C = _kmeans_lite(X, n_clusters)
    c_ref = ray.put(C)
    assigned = emb_ds.map_batches(
        IVFAssignStage,
        fn_constructor_kwargs={"centroids_ref": c_ref, "id_col": id_col,
                               "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=pool(0.5),
    )
    qids = list(query_vectors.keys())
    Q = _unit(np.asarray([query_vectors[i] for i in qids], dtype=np.float64))
    Cn = _unit(C)
    probe = np.argsort(-(Q @ Cn.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    wanted_buckets = sorted({int(b) for row in probe for b in row})

    import pyarrow.compute as pc

    hits = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"],
                                    value_set=pa.array(wanted_buckets, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()

    rows = []
    by_bucket = {b: g for b, g in hits.groupby("bucket")}
    for qi, qid in enumerate(qids):
        frames = [by_bucket[b] for b in probe[qi] if b in by_bucket]
        if not frames:
            continue
        g = pd.concat(frames)
        V = np.asarray(g["unit_vec"].tolist(), dtype=np.float64)
        sims = V @ Q[qi]
        g = pd.DataFrame({
            "query_id": qid,
            "neighbor_id": g["vec_id"].to_numpy(),
            "cos_micro": np.floor(sims * 1e6).astype(np.int64),
        })
        rows.append(g)
    cands = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        {"query_id": pd.Series([], dtype="int64"),
         "neighbor_id": pd.Series([], dtype="int64"),
         "cos_micro": pd.Series([], dtype="int64")})
    return _merge_topk(cands, k, exclude_self)
