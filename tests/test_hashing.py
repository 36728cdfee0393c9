"""SipHash known-answer vectors + hashing kernel properties
(the 'SipHash-64 known-answer vectors' micro-fixtures, FIXTURES.md)."""

import numpy as np

from fcrepo3_rdf_extractor_ray.functions.hashing import (
    hamming64,
    minhash_signature,
    rolling_fingerprint,
    shingle_hashes,
    simhash64,
    siphash24,
    siphash64_batch,
    siphash64_str,
)

# Official SipHash-2-4 reference test vectors (Aumasson & Bernstein),
# key = 00 01 .. 0f, input = first n bytes of 00 01 02 ...
SIP_VECTORS = {
    0: 0x726FDB47DD0E0E31,
    1: 0x74F839C593DC67FD,
    2: 0x0D6C8009D9A94F5A,
    3: 0x85676696D7FB7E2D,
    7: 0xAB0200F58B01D137,
    8: 0x93F5F5799A932462,
    9: 0x9E0082DF0BA9E4B0,
    15: 0xA129CA6149BE45E5,
}


def test_siphash_known_vectors():
    for n, expect in SIP_VECTORS.items():
        data = bytes(range(n))
        assert siphash24(data) == expect, f"vector len {n}"


def test_siphash_batch_matches_scalar():
    strs = ["", "a", "hello world", "entity7", "hello world"]
    out = siphash64_batch(strs)
    assert list(out) == [siphash64_str(s) for s in strs]
    memo = {}
    out2 = siphash64_batch(strs, memo=memo)
    assert list(out2) == list(out)
    assert "entity7" in memo


def test_minhash_identical_and_similar():
    a = "the quick brown fox jumps over the lazy dog again and again".split()
    sig_a = minhash_signature(shingle_hashes(a))
    sig_a2 = minhash_signature(shingle_hashes(list(a)))
    assert (sig_a == sig_a2).all()
    b = a[:-1] + ["cat"]
    sig_b = minhash_signature(shingle_hashes(b))
    est = (sig_a == sig_b).mean()
    assert 0.3 < est < 1.0  # similar but not identical
    c = "completely different words entirely unrelated content here".split()
    sig_c = minhash_signature(shingle_hashes(c))
    assert (sig_a == sig_c).mean() < 0.2


def test_simhash_similarity():
    a = ("the quick brown fox jumps over the lazy dog " * 5).split()
    b = a[:-2] + ["cat", "dog"]
    c = "alpha beta gamma delta epsilon zeta eta theta".split()
    assert hamming64(simhash64(a), simhash64(a)) == 0
    assert hamming64(simhash64(a), simhash64(b)) <= hamming64(
        simhash64(a), simhash64(c)
    )


def test_rolling_fingerprint_order_sensitive():
    assert rolling_fingerprint(["a", "b"]) != rolling_fingerprint(["b", "a"])
    assert rolling_fingerprint(["a", "b"]) == rolling_fingerprint(["a", "b"])
    assert rolling_fingerprint([]) == 0


def test_simhash64_batch_bit_identical():
    from fcrepo3_rdf_extractor_ray.functions.hashing import (simhash64,
                                                             simhash64_batch)

    docs = [
        "the quick brown fox jumps over the lazy dog".split(),
        [],
        ["single"],
        "a b c a b c a b c d e f".split(),
        "Η γρήγορη καφέ αλεπού".split(),
    ]
    got = simhash64_batch(docs, memo={})
    for toks, g in zip(docs, got):
        assert int(g) == simhash64(toks, memo={})


def test_token_counts_bpe_piece_semantics(ray_session):
    """Arrow RE2 piece counts match the leftmost-first reference split."""
    import re

    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import (
        BPE_PIECE_RE, token_counts_bpe)

    texts = ["Hello world", "a1b2", "  double  space", "", "x!!y 42",
             "trailing ", "UPPER lower 007 ..."]
    expected = [len(re.findall(BPE_PIECE_RE, t)) for t in texts]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = token_counts_bpe(ds).to_pandas().sort_values("doc_id")
    assert out["n_pieces"].tolist() == expected
    assert out["n_ws"].tolist() == [len(t.split(" ")) - t.split(" ").count("")
                                    for t in texts]
