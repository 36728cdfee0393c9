"""Benchmark decontamination (n-gram-overlap train/eval hygiene):
oracle parity at sf scale plus the planted/edge cases the sf corpus
can't exercise — exact distinct-hit counts, sub-n documents, shingles
never crossing document boundaries, and a clean corpus."""

import pandas as pd
import ray.data as rd

from conftest import assert_frames_equivalent, to_pandas


def test_decontam_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["ta_decontam"](sf_dir)
    expected = duck.execute(em.oracle_sql()["ta_decontam"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def _run(corpus_rows, bench_rows, n=4):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import decontaminate

    corpus = rd.from_pandas(pd.DataFrame(corpus_rows))
    bench = rd.from_pandas(pd.DataFrame(bench_rows))
    out = to_pandas(decontaminate(corpus, bench, n=n))
    if "doc_id" not in out.columns:  # fully-empty result materialization
        out = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                            "n_hits": pd.array([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def test_planted_contamination_counts_distinct_shingles(ray_session):
    # doc 10 contains the bench 4-gram "a b c d" twice -> ONE distinct
    # hit; doc 11 contains two different bench shingles -> two hits;
    # doc 12 shares only a 3-gram -> clean.
    bench = [{"doc_id": 0, "text": "a b c d e"}]  # shingles: abcd, bcde
    corpus = [
        {"doc_id": 10, "text": "x a b c d y a b c d z"},
        {"doc_id": 11, "text": "a b c d e"},
        {"doc_id": 12, "text": "b c d x y z w"},
    ]
    out = _run(corpus, bench)
    assert out.to_dict("records") == [
        {"doc_id": 10, "n_hits": 1},
        {"doc_id": 11, "n_hits": 2},
    ]


def test_short_docs_and_clean_corpus(ray_session):
    bench = [{"doc_id": 0, "text": "a b c d"}]
    corpus = [
        {"doc_id": 1, "text": "a b c"},        # shorter than n: no shingle
        {"doc_id": 2, "text": ""},             # empty text
        {"doc_id": 3, "text": "p q r s t u"},  # disjoint vocabulary
    ]
    out = _run(corpus, bench)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_hits"]


def test_shingles_do_not_cross_document_boundaries(ray_session):
    # "c d" ends doc 1 and "a b" starts doc 2 within the same batch;
    # the bench shingle "c d a b" must NOT match across the boundary.
    bench = [{"doc_id": 0, "text": "c d a b"}]
    corpus = [
        {"doc_id": 1, "text": "x x c d"},
        {"doc_id": 2, "text": "a b y y"},
    ]
    out = _run(corpus, bench)
    assert len(out) == 0
