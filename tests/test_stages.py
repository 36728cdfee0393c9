"""Stage-level tests on tiny Arrow tables (the operator unit layer:
SkipEmptyLiteralsStreamRDFTest / SingleGraphStreamRDFTest analogs)."""

import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.schema import quads_table
from fcrepo3_rdf_extractor_ray.stages.extract import (
    ExtractQuadsStage,
    page_quads_batch,
)
from fcrepo3_rdf_extractor_ray.stages.filters import (
    skip_empty_literals_table,
    tag_graph_table,
)


def _quads(rows):
    return quads_table(*zip(*rows))


def test_skip_empty_literals_truth_table():
    # mirrors SkipEmptyLiteralsStreamRDFTest.java:50-95: empty literal
    # blocked; non-empty literal and IRI (even empty-string IRI) pass
    t = _quads([
        ("g", "s", "p", "", True, "", "u"),      # empty literal → drop
        ("g", "s", "p", "x", True, "", "u"),     # non-empty literal → keep
        ("g", "s", "p", "", False, "", "u"),     # IRI-ish empty → keep
        ("g", "s", "p", "iri:o", False, "", "u"),
    ])
    out = skip_empty_literals_table(t)
    assert out.num_rows == 3
    assert "" not in out.filter(out["obj_is_literal"])["obj"].to_pylist()


def test_tag_graph_rehomes_foreign_graphs():
    # SingleGraphStreamRDFTest.java:45-75: quads from other graphs are
    # re-homed into the target graph
    t = _quads([
        ("other", "s", "p", "o", False, "", "u"),
        ("", "s2", "p", "o", False, "", "u"),
    ])
    out = tag_graph_table(t, "kg:web")
    assert out["graph"].to_pylist() == ["kg:web", "kg:web"]
    assert out["subj"].to_pylist() == ["s", "s2"]


def _pages_batch():
    from fcrepo3_rdf_extractor_ray.sources.pages import _page_html

    import datetime as dt

    rows = {
        "url": ["https://ex1.org/p/1", "https://ex0.org/p/97"],
        "warc_ts": [dt.datetime(2023, 11, 15, 22, 13, 20),
                    dt.datetime(2024, 2, 19, 22, 13, 20)],
        "html": [_page_html(1, "hello world"), _page_html(97, "bye")],  # 97 → malformed
        "lang": ["en", "de"],
    }
    return pa.table({
        "url": pa.array(rows["url"], pa.string()),
        "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
        "html": pa.array(rows["html"], pa.binary()),
        "lang": pa.array(rows["lang"], pa.string()),
    })


def test_page_quads_batch_constant_projection():
    out = page_quads_batch(_pages_batch())
    assert out.num_rows == 8  # 4 constant quads × 2 pages, even malformed
    d = out.to_pylist()
    fetched = [r for r in d if r["pred"] == "kg:fetchedAt"]
    assert fetched[0]["obj"] == "2023-11-15T22:13:20Z"
    assert fetched[0]["obj_datatype"] == "xsd:dateTime"
    domains = {r["obj"] for r in d if r["pred"] == "kg:domain"}
    assert domains == {"https://ex1.org/", "https://ex0.org/"}


def test_extract_quads_stage_error_containment():
    stage = ExtractQuadsStage()
    out = stage(_pages_batch())
    # malformed page contributes ONLY its 4 constant quads (P4 containment,
    # ObjectProcessor.java:172-176); good page adds meta+fact quads
    assert stage.errors == 1
    by_subj = {}
    for r in out.to_pylist():
        by_subj.setdefault(r["subj"], []).append(r)
    assert len(by_subj["https://ex0.org/p/97"]) == 4
    good = by_subj["https://ex1.org/p/1"]
    preds = {r["pred"] for r in good}
    assert {"kg:title", "kg:keywords", "kg:state", "kg:description"} <= preds
    # raw fact quads carry surf: markers
    facts = [r for r in out.to_pylist() if r["pred"] == "kg:acquired"]
    assert facts and facts[0]["subj"].startswith("surf:")


def test_extract_quads_stage_skips_empty_description():
    from fcrepo3_rdf_extractor_ray.sources.pages import _page_html

    t = pa.table({
        "url": pa.array(["https://ex0.org/p/22"], pa.string()),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([_page_html(22, "x")], pa.binary()),  # 22 % 11 == 0
        "lang": pa.array(["en"], pa.string()),
    })
    out = ExtractQuadsStage(skip_empty_literals=True)(t)
    assert "kg:description" not in out["pred"].to_pylist()
    out2 = ExtractQuadsStage(skip_empty_literals=False)(t)
    assert "kg:description" in out2["pred"].to_pylist()


def test_regex_extract_stats_no_match_and_counts():
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import (
        regex_extract_stats)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["big sort and slow scan", "NO MATCHES HERE",
                          "table tabletable"]),
    })
    out = (regex_extract_stats(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # first match only; '' (not null) when nothing matches — DuckDB parity
    assert out["first_match"].tolist() == ["sort", "", ""]
    assert out["n_count"].tolist() == [0, 0, 3]


def test_chunk_documents_overlap_and_edges():
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.text_analysis import chunk_documents

    toks = " ".join(f"t{i}" for i in range(50))  # 50 tokens
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([toks, "one two", ""]),
    })
    out = (chunk_documents(rd.from_arrow(t), chunk_tokens=32, stride=24)
           .to_pandas().sort_values(["doc_id", "chunk_no"])
           .reset_index(drop=True))
    d1 = out[out["doc_id"] == 1]
    # 50 tokens, stride 24 -> starts at 0, 24, 48 = 3 chunks
    assert d1["chunk_no"].tolist() == [0, 1, 2]
    assert d1["n_tokens"].tolist() == [32, 26, 2]
    # overlap: chunk 1 starts at token 24, inside chunk 0's [0, 32)
    assert d1["chunk_text"].iloc[1].split()[0] == "t24"
    assert d1["chunk_text"].iloc[0].split()[-1] == "t31"
    # short doc -> one chunk; empty doc -> one empty chunk (0 tokens)
    assert out[out["doc_id"] == 2]["n_tokens"].tolist() == [2]
    assert out[out["doc_id"] == 3]["chunk_text"].tolist() == [""]
    assert out[out["doc_id"] == 3]["n_tokens"].tolist() == [0]
