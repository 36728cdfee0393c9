"""Sequence packing (token-budget context-window fill): oracle parity
plus the boundary cases the sf corpus can't pin down — exact-fit packs,
oversized singleton docs, and the at-least-one-doc-per-pack rule."""

import pandas as pd
import ray.data as rd

from conftest import assert_frames_equivalent, to_pandas


def test_pack_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["ta_pack"](sf_dir)
    expected = duck.execute(em.oracle_sql()["ta_pack"]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def _pack(rows, budget):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import pack_documents

    ds = rd.from_pandas(pd.DataFrame(rows))
    out = to_pandas(pack_documents(ds, budget=budget))
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def test_exact_fit_and_overflow_boundaries(ray_session):
    # budget 4: docs of 2+2 tokens fill pack 0 exactly; the next 1-token
    # doc must start pack 1 (fill+tok > budget is strict).
    rows = [
        {"doc_id": 1, "source": "s", "text": "a b"},
        {"doc_id": 2, "source": "s", "text": "c d"},
        {"doc_id": 3, "source": "s", "text": "e"},
        {"doc_id": 4, "source": "s", "text": "f g h"},
    ]
    out = _pack(rows, budget=4)
    assert out["pack_id"].tolist() == [0, 0, 1, 1]
    assert out["n_tokens"].tolist() == [2, 2, 1, 3]


def test_oversized_doc_gets_singleton_pack(ray_session):
    rows = [
        {"doc_id": 1, "source": "s", "text": "a b"},
        {"doc_id": 2, "source": "s", "text": "x1 x2 x3 x4 x5 x6"},  # > budget
        {"doc_id": 3, "source": "s", "text": "c"},
    ]
    out = _pack(rows, budget=4)
    assert out["pack_id"].tolist() == [0, 1, 2]


def test_groups_pack_independently(ray_session):
    rows = [
        {"doc_id": 1, "source": "a", "text": "w x y"},
        {"doc_id": 2, "source": "b", "text": "w x y"},
        {"doc_id": 3, "source": "a", "text": "w x y"},
        {"doc_id": 4, "source": "b", "text": "w x y"},
    ]
    out = _pack(rows, budget=6)
    by_src = out.groupby("source")["pack_id"].apply(list).to_dict()
    assert by_src == {"a": [0, 0], "b": [0, 0]}
