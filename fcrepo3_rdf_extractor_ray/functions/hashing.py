"""Deterministic hashing kernels.

- SipHash-2-4 (64-bit) — the canonicalization shuffle key demanded by the
  north rule; conceptual ancestor in the reference is the deterministic
  MD5 hash-path key of ``HashPathIdMapper.java:145-160``.
- Karp-Rabin rolling fingerprint over token streams.
- MinHash signatures / SimHash for near-dup detection.

All hashes are seeded with fixed constants — runs are reproducible across
processes and nodes (Python's builtin ``hash`` is salted per-process and
must never be used for shuffle keys).
"""

from __future__ import annotations

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF

# Fixed SipHash key (the 16-byte sequence 00..0f — the key used by the
# SipHash reference test vectors, so known-answer tests apply directly).
SIP_KEY = bytes(range(16))


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & MASK64


def siphash24(data: bytes, key: bytes = SIP_KEY) -> int:
    """SipHash-2-4 of ``data`` → unsigned 64-bit int. Pure-Python reference
    implementation of the public algorithm (Aumasson & Bernstein, 2012)."""
    k0 = int.from_bytes(key[:8], "little")
    k1 = int.from_bytes(key[8:], "little")
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    def sipround(v0, v1, v2, v3):
        v0 = (v0 + v1) & MASK64
        v1 = _rotl(v1, 13) ^ v0
        v0 = _rotl(v0, 32)
        v2 = (v2 + v3) & MASK64
        v3 = _rotl(v3, 16) ^ v2
        v0 = (v0 + v3) & MASK64
        v3 = _rotl(v3, 21) ^ v0
        v2 = (v2 + v1) & MASK64
        v1 = _rotl(v1, 17) ^ v2
        v2 = _rotl(v2, 32)
        return v0, v1, v2, v3

    b = len(data) & 0xFF
    w = len(data) // 8
    for i in range(w):
        m = int.from_bytes(data[8 * i : 8 * i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0 ^= m
    tail = data[8 * w :]
    m = (b << 56) | int.from_bytes(tail + b"\x00" * (8 - len(tail)), "little")
    v3 ^= m
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & MASK64


def siphash64_str(s: str) -> int:
    return siphash24(s.encode("utf-8"))


def siphash64_batch(strings, memo: dict | None = None) -> np.ndarray:
    """SipHash-2-4 over a sequence of strings → uint64 array.

    Hashes each *unique* string once (pandas factorize) — in KG batches the
    same entity surface repeats many times, so this amortizes the
    per-string Python cost; callers holding state (actor stages) can pass a
    cross-batch ``memo`` dict for further reuse.

    PRECONDITION: inputs must not contain embedded NUL (``\\x00``) —
    pandas' hashtable truncates object strings at the first NUL, so
    NUL-distinct strings would be merged and take the hash of whichever
    full string the batch saw first (non-deterministic across batches).
    Composite keys should join with ``\\x1f``.
    """
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(strings, dtype=object))
    if memo is None:
        uh = np.fromiter(
            (siphash64_str(u) for u in uniques), dtype=np.uint64, count=len(uniques)
        )
    else:
        out = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            h = memo.get(u)
            if h is None:
                h = siphash64_str(u)
                memo[u] = h
            out[i] = h
        uh = out
    if len(uh) == 0:
        return np.empty(0, dtype=np.uint64)
    return uh[codes]


# ---------------------------------------------------------------------------
# Rolling (Karp-Rabin) document fingerprint

_KR_BASE = 1_000_003
_KR_MOD = (1 << 61) - 1


def rolling_fingerprint(tokens) -> int:
    """Polynomial rolling hash of a token stream mod 2^61-1 (order-sensitive
    document fingerprint)."""
    h = 0
    for t in tokens:
        th = siphash64_str(t) % _KR_MOD
        h = (h * _KR_BASE + th) % _KR_MOD
    return h


# ---------------------------------------------------------------------------
# md5-derived token hashes — the SQL-REPLAYABLE family. DuckDB exposes
# md5() but no SipHash, so query surfaces that want an exact DuckDB oracle
# (ta_fingerprint_rolling, dedup_simhash) hash tokens with md5 prefixes;
# SipHash remains the internal shuffle/content-hash family.

def md5_hash64(s: str) -> int:
    """First 16 hex chars of md5 → unsigned 64-bit int.
    SQL mirror: CAST('0x' || substring(md5(s), 1, 16) AS UBIGINT)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def md5_hash60(s: str) -> int:
    """First 15 hex chars of md5 → 60-bit int (< 2^61-1, so usable mod-p
    without bias handling). SQL mirror: CAST('0x' || substring(md5(s),
    1, 15) AS BIGINT)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_token_hashes(tokens: list[str], memo: dict | None = None) -> np.ndarray:
    """uint64 md5-prefix hash per token, memoized across calls (same
    amortization as ``token_hashes``, different — SQL-replayable — family)."""
    if memo is None:
        return np.fromiter((md5_hash64(t) for t in tokens),
                           dtype=np.uint64, count=len(tokens))
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = memo.get(t)
        if h is None:
            h = md5_hash64(t)
            memo[t] = h
        out[i] = h
    return out


_M31 = (1 << 31) - 1


def md5_hash31(s: str) -> int:
    """First 8 md5 hex chars mod 2^31-1 — the SQL-replayable 31-bit
    family: ``CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) %
    2147483647``. 31 bits keeps ``(a*h + b)`` under 2^62, so the mod-p
    MinHash permutations are EXACT in both int64 (DuckDB) and uint64
    (numpy) — no wrap, no HUGEINT."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % _M31


def md5_minhash_perms(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic mod-2^31-1 permutation constants, derived from md5
    of 'mh_a:<j>' / 'mh_b:<j>' (a_j nonzero). PUBLISHED CONTRACT: the
    dedup_minhash SQL oracle embeds these exact values as literals."""
    a = np.fromiter((1 + md5_hash60(f"mh_a:{j}") % (_M31 - 1)
                     for j in range(num_perm)), dtype=np.uint64,
                    count=num_perm)
    b = np.fromiter((md5_hash60(f"mh_b:{j}") % _M31
                     for j in range(num_perm)), dtype=np.uint64,
                    count=num_perm)
    return a, b


def md5_minhash_signature(shingles: list[str], num_perm: int = 64,
                          memo: dict | None = None) -> np.ndarray:
    """MinHash signature in the md5-31 family: base = md5_hash31 per
    DISTINCT shingle, perm_j = (a_j*h + b_j) mod 2^31-1, sig_j = min
    (or the sentinel 2^31-1 for shingle-less docs). All-integer and
    exact — replays bit-for-bit in DuckDB."""
    key = f"perms:{num_perm}"
    cached = _MD5_MINHASH_PERMS.get(key)
    if cached is None:
        cached = md5_minhash_perms(num_perm)
        _MD5_MINHASH_PERMS[key] = cached
    a, b = cached
    if memo is None:
        hs = np.fromiter((md5_hash31(s) for s in shingles),
                         dtype=np.uint64, count=len(shingles))
    else:
        hs = np.empty(len(shingles), dtype=np.uint64)
        for i, s in enumerate(shingles):
            h = memo.get(s)
            if h is None:
                h = md5_hash31(s)
                memo[s] = h
            hs[i] = h
    if hs.size == 0:
        return np.full(num_perm, _M31, dtype=np.uint64)
    vals = (hs[:, None] * a[None, :] + b[None, :]) % np.uint64(_M31)
    return vals.min(axis=0)


_MD5_MINHASH_PERMS: dict[str, tuple] = {}


def word_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """DISTINCT contiguous word k-shingles; shorter-than-k docs yield the
    single full-join shingle, empty docs none. SQL mirror: tokens via
    regexp_split '\\s+', shingles via generate_series windows."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return list({" ".join(tokens[i:i + k])
                 for i in range(len(tokens) - k + 1)})


def md5_rolling_fingerprint(tokens, memo: dict | None = None) -> int:
    """Polynomial rolling hash (base 1000003, mod 2^61-1) over md5-prefix
    token hashes — bit-identical to the DuckDB recursive-CTE replay in
    ``oracle_sql()['ta_fingerprint_rolling']``."""
    h = 0
    if memo is None:
        for t in tokens:
            h = (h * _KR_BASE + md5_hash60(t)) % _KR_MOD
    else:
        for t in tokens:
            th = memo.get(t)
            if th is None:
                th = md5_hash60(t)
                memo[t] = th
            h = (h * _KR_BASE + th) % _KR_MOD
    return h


# ---------------------------------------------------------------------------
# MinHash / SimHash

def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    mersenne = (1 << 61) - 1
    a = rng.randint(1, mersenne, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, mersenne, size=num_perm, dtype=np.uint64)
    return a, b, np.uint64(mersenne)


_PERM_CACHE: dict[int, tuple] = {}


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """MinHash signature from base shingle hashes (uint64) via the standard
    (a*h + b) mod p permutation family; vectorized: shingles × perms."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b, p = _PERM_CACHE[num_perm]
    if len(shingle_hashes) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = shingle_hashes.astype(np.uint64) % p
    # (n_shingles, num_perm) — fine for docs with <= a few thousand shingles
    vals = (h[:, None] * a[None, :] + b[None, :]) % p
    return vals.min(axis=0)


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """uint64 hashes of word k-shingles (contiguous k-grams)."""
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.fromiter(
        (siphash64_str(s) for s in set(joined)), dtype=np.uint64, count=len(set(joined))
    )


_SHINGLE_A = np.uint64(0x9E3779B97F4A7C15)


def token_hashes(tokens: list[str], memo: dict | None = None) -> np.ndarray:
    """uint64 SipHash per token, memoized across calls (vocabulary repeats
    heavily across documents — a per-actor memo makes this near-free)."""
    if memo is None:
        return np.fromiter((siphash64_str(t) for t in tokens),
                           dtype=np.uint64, count=len(tokens))
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = memo.get(t)
        if h is None:
            h = siphash64_str(t)
            memo[t] = h
        out[i] = h
    return out


def shingle_hashes_fast(tokens: list[str], k: int = 3,
                        memo: dict | None = None) -> np.ndarray:
    """Vectorized k-shingle hashes: per-token SipHash (memoized) combined
    by a numpy polynomial window — numerically different from
    ``shingle_hashes`` but an equally uniform deterministic family, and
    ~50× faster on long documents."""
    if len(tokens) < k:
        if not tokens:
            return np.empty(0, dtype=np.uint64)
        h = token_hashes(tokens, memo)
        acc = np.uint64(0)
        for v in h:
            acc = acc * _SHINGLE_A + v
        return np.unique(np.array([acc], dtype=np.uint64))
    th = token_hashes(tokens, memo)
    n = len(tokens) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * _SHINGLE_A + th[j : j + n]
    return np.unique(acc)


def simhash64(tokens: list[str], memo: dict | None = None) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if not tokens:
        return 0
    hs = token_hashes(tokens, memo)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash64_batch(token_lists: list[list[str]],
                    memo: dict | None = None,
                    hash_fn=None) -> np.ndarray:
    """Vectorized ``simhash64`` over many documents at once: one memoized
    token-hash pass over the concatenated tokens, one (total_tokens × 64)
    bit expansion, and a per-doc segment sum via ``np.add.reduceat`` —
    no per-document Python loop. Bit-identical to ``simhash64`` with the
    default (SipHash) family; pass ``hash_fn=md5_token_hashes`` for the
    SQL-replayable family used by the ``dedup_simhash`` oracle."""
    counts = np.array([len(ts) for ts in token_lists], dtype=np.int64)
    out = np.zeros(len(token_lists), dtype=np.uint64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    flat: list[str] = []
    for ts in token_lists:
        flat.extend(ts)
    H = (hash_fn or token_hashes)(flat, memo)
    shifts = np.arange(64, dtype=np.uint64)
    # little-endian byte view + bitorder='little' puts bit k of the uint64
    # at column k — an 8× smaller intermediate than a 64-wide shift matrix
    bits = np.unpackbits(H.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32)
    offsets = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
    ones = np.add.reduceat(bits, offsets, axis=0)  # (n_nonempty, 64)
    pos = ones * 2 > counts[nonempty, None]  # strict majority, as simhash64
    vals = (pos.astype(np.uint64) * (np.uint64(1) << shifts)[None, :]).sum(
        axis=1, dtype=np.uint64)
    out[nonempty] = vals
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & MASK64).count("1")


def fast_part_hash(values, n_parts: int) -> np.ndarray:
    """Vectorized PARTITION-ROUTING hash: pandas' C SipHash (fixed
    ``hash_key``, deterministic across processes) over the whole column
    at once — measured ~40× faster than the Python ``siphash64_batch``
    path on high-cardinality columns (no per-unique Python call).

    Use ONLY for partition assignment inside one pipeline; content
    fingerprints that must stay stable against the repo's published hash
    family keep using ``siphash64_batch``."""
    import pandas as pd

    if hasattr(values, "to_pandas"):  # pa.Array / pa.ChunkedArray
        s = values.to_pandas()
    else:
        s = pd.Series(values)
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()
    return (h % n_parts).astype(np.int32)
