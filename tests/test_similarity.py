"""Similarity search: brute-force exactness + IVF recall."""

import numpy as np
import pyarrow as pa


def _emb_ds(n=200, dim=16, seed=3):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    V = rng.randn(n, dim)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(V.tolist(), pa.list_(pa.float64())),
    })
    return rd.from_arrow(t).repartition(4), V


def test_knn_bruteforce_matches_numpy():
    from fcrepo3_rdf_extractor_ray.stages.similarity import knn_bruteforce

    ds, V = _emb_ds()
    queries = {0: V[0], 7: V[7]}
    out = knn_bruteforce(ds, queries, k=3)
    # exact reference computed densely
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for qid in queries:
        sims = Vn @ Vn[qid]
        sims[qid] = -np.inf  # exclude self
        want = set(np.argsort(-sims)[:3])
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        assert got == want, qid
    # deterministic ordering columns present
    assert list(out.columns) == ["query_id", "neighbor_id", "cos_micro"]


def test_knn_ivf_recall_vs_brute():
    from fcrepo3_rdf_extractor_ray.stages.similarity import (knn_bruteforce,
                                                             knn_ivf)

    ds, V = _emb_ds(n=300)
    queries = {i: V[i] for i in range(8)}
    brute = knn_bruteforce(ds, queries, k=5)
    ivf = knn_ivf(ds, queries, k=5, n_clusters=8, n_probe=4)
    hits = tot = 0
    for qid in queries:
        b = set(brute[brute["query_id"] == qid]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == qid]["neighbor_id"])
        hits += len(a & b)
        tot += len(b)
    recall = hits / tot
    assert recall >= 0.6, recall  # n_probe=4 of 8 buckets


def test_knn_ivf_deterministic():
    from fcrepo3_rdf_extractor_ray.stages.similarity import knn_ivf

    ds, V = _emb_ds(n=100)
    queries = {1: V[1]}
    a = knn_ivf(ds, queries, k=4, n_clusters=4)
    b = knn_ivf(ds, queries, k=4, n_clusters=4)
    assert a.equals(b)
