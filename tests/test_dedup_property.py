"""Property-based dedup verification: on random quad tables, the Ray
dedup operator must agree with a DuckDB GROUP BY, for any salt/partition
configuration (hypothesis drives the shapes; the Ray round-trip runs on
a small deterministic subset of examples to keep session cost sane)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.schema import quads_table
from fcrepo3_rdf_extractor_ray.stages.dedup import dedup_quads


def _random_quads(seed: int, n: int) -> pa.Table:
    rng = np.random.RandomState(seed)
    subs = [f"s{rng.randint(5)}" for _ in range(n)]
    preds = [f"p{rng.randint(3)}" for _ in range(n)]
    objs = [f"o{rng.randint(4)}" for _ in range(n)]
    lits = [bool(rng.randint(2)) for _ in range(n)]
    dts = ["" if rng.randint(2) else "xsd:string" for _ in range(n)]
    srcs = [f"u{rng.randint(7)}" for _ in range(n)]
    return quads_table(["g"] * n, subs, preds, objs, lits, dts, srcs)


@pytest.mark.parametrize("seed,n,n_salts,n_parts", [
    (0, 50, 1, 4), (1, 200, 4, 8), (2, 333, 2, 16), (3, 10, 4, 64),
])
def test_dedup_matches_duckdb(seed, n, n_salts, n_parts):
    import ray.data as rd

    t = _random_quads(seed, n)
    ds = rd.from_arrow(t).repartition(3)
    got = dedup_quads(ds, n_salts=n_salts, n_parts=n_parts).to_pandas()

    con = duckdb.connect()
    con.register("q", t)
    want = con.execute("""
        SELECT graph, subj, pred, obj, obj_is_literal, obj_datatype,
               min(src_url) AS src_url, count(*) AS n_src
        FROM q GROUP BY 1,2,3,4,5,6
    """).df()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(w.astype(str)), (seed, n, n_salts, n_parts)


def test_ngram_jaccard_matches_bruteforce_reference():
    """Property: the distributed inverted-index Jaccard equals a naive
    all-pairs set computation on a random small corpus."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 15)))
             for _ in range(30)]
    t = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array(texts)})
    thr = 0.3
    got = ngram_jaccard_pairs(rd.from_arrow(t).repartition(3),
                              threshold=thr).to_pandas()
    got_set = {(r.doc_a, r.doc_b): r.jaccard_micro
               for r in got.itertuples()}

    def grams(s):
        toks = s.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a, b in itertools.combinations(range(30), 2):
        A, B = grams(texts[a]), grams(texts[b])
        if not A or not B:
            continue
        inter = len(A & B)
        if inter == 0:
            continue
        j = 1000000.0 * inter / (len(A) + len(B) - inter)
        if j >= thr * 1000000.0:
            want[(a, b)] = int(np.floor(j))
    assert got_set == want


def test_vocab_top_terms_matches_counter():
    """Property: distributed word count equals collections.Counter."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import vocab_top_terms

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(0, 30)))
             for _ in range(50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts)})
    got = vocab_top_terms(rd.from_arrow(t).repartition(4),
                          k=15).to_pandas()
    c = Counter(w for s in texts for w in s.split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(got["token"], got["n"])) == want
