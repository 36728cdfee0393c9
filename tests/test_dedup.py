"""Dedup operator tests: exact set semantics + planted near-duplicates
for MinHash/SimHash/embedding paths (FIXTURES.md duplicate-assertion
fixture; set semantics per SidoraExamplesIT.java:105)."""

import numpy as np
import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.stages.dedup import (
    dedup_exact_docs,
    embedding_neardup_pairs,
    minhash_clusters,
    simhash_pairs,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun " * 3)


def _docs_table():
    texts = {
        0: BASE,
        1: BASE,                       # exact dup of 0
        2: BASE.replace("lazy", "sleepy"),  # near dup of 0
        3: "completely different content about databases and sharding",
        4: "another unrelated document mentioning ray data pipelines",
        5: BASE.replace("afternoon", "morning"),  # near dup of 0
    }
    return pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    })


def test_dedup_exact_docs():
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(3)
    out = dedup_exact_docs(ds).to_pandas()
    dup_group = out[out["n_dups"] == 2]
    assert len(dup_group) == 1
    assert dup_group.iloc[0]["keep_id"] == 0  # min-ID kept
    assert len(out) == 5  # 6 docs, one exact pair collapsed


def test_minhash_clusters_find_near_dups():
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(2)
    clusters = minhash_clusters(ds, threshold=0.5)
    got = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    # 0,1 identical; 2 and 5 near — all should cluster to min-ID 0
    assert got.get(0) == 0 and got.get(1) == 0
    assert got.get(2) == 0 and got.get(5) == 0
    assert 3 not in got and 4 not in got


def test_minhash_clusters_ds_equivalent_to_driver_path():
    """The Dataset-native clustering (distributed min-label fixpoint)
    must produce exactly the driver union-find's (doc_id, cluster_id)
    assignment."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import minhash_clusters_ds

    ds = rd.from_arrow(_docs_table()).repartition(2)
    drv = minhash_clusters(ds, threshold=0.5)
    got = minhash_clusters_ds(ds, threshold=0.5).to_pandas()
    a = dict(zip(drv["doc_id"], drv["cluster_id"]))
    b = dict(zip(got["doc_id"], got["cluster_id"]))
    assert a == b and a  # non-trivial clusters, identical assignment


def test_minhash_clusters_ds_empty_when_no_neardups():
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import minhash_clusters_ds

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["totally unrelated words here on one side",
                          "different vocabulary over there entirely now"]),
    })
    out = minhash_clusters_ds(rd.from_arrow(t), threshold=0.5)
    # schema asserted on the Dataset: Ray's to_pandas drops columns on
    # an empty dataset
    assert out.schema().names == ["doc_id", "cluster_id"]
    assert out.count() == 0


def test_simhash_pairs():
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(2)
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    pairset = {tuple(p) for p in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (0, 1) in pairset  # identical docs: hamming 0
    assert all(a < b for a, b in pairset)
    assert not any({3, 4} & {a, b} for a, b in pairset)


def test_sim_candidate_pairs_lossless():
    """_sim_candidate_pairs must be a SUPERSET of every hamming<=3 pair even
    when every bucket overflows max_bucket (the former head(max_bucket)
    truncation dropped such pairs — the sf0.1 dedup_simhash regression)."""
    from fcrepo3_rdf_extractor_ray.stages.dedup import _sim_candidate_pairs

    rng = np.random.RandomState(7)
    sigs = rng.randint(0, 2**63, size=400, dtype=np.int64).view(np.uint64)
    # plant clones and near pairs: identical run (hamming 0) + 1..3-bit flips
    sigs[50:90] = sigs[50]
    for k, bits in [(101, [3]), (202, [5, 40]), (303, [1, 17, 63])]:
        s = sigs[k - 1]
        for b in bits:
            s = s ^ np.uint64(1 << b)
        sigs[k] = s
    want = set()
    ia, ja = np.triu_indices(len(sigs), k=1)
    x = sigs[ia] ^ sigs[ja]
    d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
    for a, b in zip(ia[d <= 3], ja[d <= 3]):
        want.add((int(a), int(b)))
    assert len(want) >= 780 + 3  # C(40,2) clones + 3 planted
    cand = _sim_candidate_pairs(np.arange(len(sigs)), sigs,
                                list(range(64)), 16, 3)
    got = set()
    for pa_, pb_ in cand:
        got.update(zip(pa_.tolist(), pb_.tolist()))
    assert want <= got
    assert all(a < b for a, b in got)


def test_simhash_pairs_overflow_bucket_exact():
    """End-to-end: with max_bucket far below the planted clone-run size the
    output must still equal the brute-force all-pairs answer."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.functions.hashing import (
        md5_token_hashes, simhash64_batch)

    base = ["tok%d" % i for i in range(120)]
    texts = [" ".join(base)] * 12  # identical docs: one mega bucket
    for i in range(12):            # near variants: swap one token
        v = list(base)
        v[7] = "rare%d" % i
        texts.append(" ".join(v))
    texts += [" ".join("other%d_%d" % (i, j) for j in range(30))
              for i in range(6)]   # unrelated
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    pairs = simhash_pairs(rd.from_arrow(t).repartition(3),
                          max_hamming=3, max_bucket=4).to_pandas()
    got = {(a, b): h for a, b, h in
           pairs[["doc_a", "doc_b", "hamming"]].itertuples(index=False)}
    sigs = simhash64_batch([s.split() for s in texts], memo={},
                           hash_fn=md5_token_hashes)
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            d = int(bin(int(sigs[a]) ^ int(sigs[b])).count("1"))
            if d <= 3:
                want[(a, b)] = d
    assert len(want) >= 66  # at least the C(12,2) identical-doc pairs
    assert got == want


def test_embedding_neardup_pairs():
    import ray.data as rd

    rng = np.random.RandomState(0)
    base = rng.randn(5, 32)
    vecs = np.vstack([base, base[0] + 0.001 * rng.randn(32)])  # 5 ~ dup of 0
    t = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(2)
    pairs = embedding_neardup_pairs(ds, dim=32, threshold=0.999).to_pandas()
    pairset = {tuple(p) for p in pairs[["vec_a", "vec_b"]].itertuples(index=False)}
    assert (0, 5) in pairset
    assert len(pairset) == 1


def test_ngram_jaccard_exact_pairs():
    import ray.data as rd
    import pyarrow as pa

    from fcrepo3_rdf_extractor_ray.stages.dedup import ngram_jaccard_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e",   # trigrams: abc bcd cde
            "a b c d x",   # shares abc bcd → J = 2/4 = 0.5
            "q r s t u",   # disjoint
            "a b",         # < k tokens → no ngrams
        ]),
    })
    out = ngram_jaccard_pairs(rd.from_arrow(t).repartition(2),
                              threshold=0.5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_a"], r["doc_b"], r["jaccard_micro"]) == (1, 2, 500000)
