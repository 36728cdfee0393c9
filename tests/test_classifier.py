"""Model-scored quality filter (hashed-feature linear classifier):
oracle parity plus exactness of the per-doc reduce on crafted inputs."""

import hashlib

import pandas as pd
import ray.data as rd

from conftest import assert_frames_equivalent, to_pandas


def test_classifier_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["ta_classifier"](sf_dir)
    expected = duck.execute(em.oracle_sql()["ta_classifier"]).df()
    assert len(expected) > 0
    assert expected["keep"].nunique() == 2  # threshold actually splits
    assert_frames_equivalent(got, expected)


def _w(token: str) -> int:
    b = hashlib.md5(token.encode()).digest()[0] % 64
    return (b * 2654435761) % 97 - 48


def test_score_is_exact_token_weight_sum(ray_session):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import (
        classifier_scores)

    rows = [
        {"doc_id": 1, "text": "alpha beta alpha"},  # repeats count twice
        {"doc_id": 2, "text": ""},                  # one ''-token doc
    ]
    out = to_pandas(classifier_scores(rd.from_pandas(pd.DataFrame(rows))))
    out = out.sort_values("doc_id").reset_index(drop=True)
    exp1 = 2 * _w("alpha") + _w("beta")
    assert out["score"].tolist() == [exp1, _w("")]
    assert out["keep"].tolist() == [int(exp1 > 0), int(_w("") > 0)]
