"""Round-3 oracle additions, pinned as pytest (sf0.001): the md5
SQL-replayable hash family (rolling fingerprint, SimHash), the
all-integer aHash replays (phash dedup, scene change), the parse-once
backbone, the BPE-ish piece counter, and block-mean image resize."""
import pytest

from conftest import assert_frames_equivalent

ROUND3_ORACLE_QUERIES = [
    "ta_fingerprint_rolling",
    "dedup_simhash",
    "mm_phash_dups",
    "mm_scene_change",
    "kg_quads_parse_once",
    "kg_mentions_parse_once",
    "ta_token_bpe",
    "mm_image_resize",
    "ta_split",
]


@pytest.mark.parametrize("name", ROUND3_ORACLE_QUERIES)
def test_round3_oracle(name, sf_dir, duck, ray_session):
    import __ray_entry__ as em

    got = em.queries()[name](sf_dir)
    expected = duck.execute(em.oracle_sql()[name]).df()
    assert len(expected) > 0
    assert_frames_equivalent(got, expected)


def test_collocations_paths_bit_identical(sf_dir, ray_session):
    """The broadcast-vocab fast path and the tag-union scale path must
    produce identical rows (broadcast_vocab_limit=0 forces tag-union)."""
    import os

    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import collocations

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cols = ["w1", "w2", "n_pair", "lift_micro"]
    a = (collocations(docs).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (collocations(docs, broadcast_vocab_limit=0).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    assert a.equals(b)
