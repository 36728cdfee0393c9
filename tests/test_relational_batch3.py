"""ntile quartiles, degree distribution, inverted index, feature
hashing — unit tests against DuckDB oracles + edge cases, plus
JSONL/CSV source-format roundtrips."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from conftest import assert_frames_equivalent, to_pandas


def test_ntile_orders_oracle(sf_dir, duck):
    from fcrepo3_rdf_extractor_ray.pipelines.relational import ntile_orders

    expected = duck.execute("""
        SELECT o_orderkey,
               row_number() OVER (ORDER BY round(o_totalprice * 100)::BIGINT
                                  DESC, o_orderkey)::BIGINT AS rnk,
               ntile(4) OVER (ORDER BY round(o_totalprice * 100)::BIGINT
                              DESC, o_orderkey)::BIGINT AS tile
        FROM orders""").df()
    assert_frames_equivalent(ntile_orders(sf_dir), expected)


def test_ntile_uneven_split(ray_session, tmp_path, duck):
    """n=10, k=4 → SQL ntile gives tiles of 3,3,2,2 — the first n%k
    tiles take the extra row. The piecewise formula must agree."""
    from fcrepo3_rdf_extractor_ray.pipelines.relational import ntile_orders

    df = pd.DataFrame({
        "o_orderkey": np.arange(10, dtype=np.int64),
        "o_totalprice": np.linspace(10.0, 100.0, 10),
    })
    df.to_parquet(tmp_path / "orders.parquet")
    out = to_pandas(ntile_orders(str(tmp_path), k=4)).sort_values("rnk")
    assert out["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_degree_distribution_oracle(sf_dir, duck):
    import __ray_entry__ as em

    got = em.queries()["kg_degree"](sf_dir)
    expected = duck.execute(em.oracle_sql()["kg_degree"]).df()
    assert len(expected) > 1
    assert_frames_equivalent(got, expected)


def test_degree_distribution_tiny_graph(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import degree_distribution

    edges = rd.from_arrow(pa.table({
        "subj": pa.array(["a", "a", "a", "b", "c", "c"], pa.string()),
    }))
    out = to_pandas(degree_distribution(edges)).set_index("degree")
    # a has degree 3, b degree 1, c degree 2
    assert out.loc[3, "n_nodes"] == 1
    assert out.loc[1, "n_nodes"] == 1
    assert out.loc[2, "n_nodes"] == 1


def test_inverted_index_oracle(sf_dir, duck, docs_ds):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import inverted_index

    expected = duck.execute("""
        WITH t AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
                   FROM documents),
        d AS (SELECT DISTINCT tok, doc_id FROM t),
        r AS (SELECT tok, doc_id,
                     row_number() OVER (PARTITION BY tok
                                        ORDER BY doc_id) AS rn
              FROM d)
        SELECT tok AS token,
               string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings,
               count(*)::BIGINT AS n_docs_in_list
        FROM r WHERE rn <= 8 GROUP BY tok""").df()
    assert_frames_equivalent(inverted_index(docs_ds), expected)


def test_inverted_index_caps_posting_length(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import inverted_index

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array(["common word"] * 20, pa.string()),
    }))
    out = to_pandas(inverted_index(ds, k=5)).set_index("token")
    assert out.loc["common", "postings"] == "0,1,2,3,4"
    assert out.loc["common", "n_docs_in_list"] == 5


def test_feature_hash_oracle(sf_dir, duck, docs_ds):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import feature_hash

    expected = duck.execute("""
        WITH t AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
                   FROM documents),
        h AS (SELECT doc_id, md5(tok) AS hx FROM t),
        v AS (SELECT doc_id,
                     ((16 * (ascii(substr(hx, 1, 1)) - 48
                             - CASE WHEN ascii(substr(hx, 1, 1)) >= 97
                                    THEN 39 ELSE 0 END)
                       + (ascii(substr(hx, 2, 1)) - 48
                          - CASE WHEN ascii(substr(hx, 2, 1)) >= 97
                                 THEN 39 ELSE 0 END)) % 64)::BIGINT AS bucket
              FROM h)
        SELECT doc_id, bucket, count(*)::BIGINT AS n
        FROM v GROUP BY doc_id, bucket""").df()
    assert_frames_equivalent(feature_hash(docs_ds), expected)


def test_feature_hash_counts_sum_to_tokens(ray_session):
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import feature_hash

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c a"], pa.string()),
    }))
    out = to_pandas(feature_hash(ds))
    assert out["n"].sum() == 4  # every token occurrence lands somewhere
    assert (out["bucket"] < 64).all() and (out["bucket"] >= 0).all()


def test_feature_hash_rejects_oversized_buckets(sf_dir, docs_ds):
    from fcrepo3_rdf_extractor_ray.stages.text_analysis import feature_hash

    with pytest.raises(ValueError):
        feature_hash(docs_ds, n_buckets=512)


def test_jsonl_and_csv_source_roundtrip(ray_session, sf_dir, tmp_path):
    """The engine's tables are format-agnostic: documents written to
    JSONL and CSV read back value-identical, and an operator produces
    the same result over all three source formats."""
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import token_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    base = token_counts(docs).to_pandas().sort_values("doc_id").reset_index(
        drop=True)

    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    docs.write_json(jdir)
    docs.write_csv(cdir)

    for reader, path in ((rd.read_json, jdir), (rd.read_csv, cdir)):
        again = token_counts(reader(path)).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(base, again)
