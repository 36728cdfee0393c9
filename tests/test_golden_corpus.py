"""Frozen multi-page golden conformance test — the
``SidoraExamplesIT.java:70-107`` analog: a checked-in input corpus
(``golden/pages_fixture.parquet``) and a checked-in expected N-Quads
answer file (``golden/expected_multi.nq``), compared by set-diff in BOTH
directions. Unlike the DuckDB oracles (which mirror the same synthesis
spec and would pass a shared spec bug silently), these files are frozen
artifacts: any drift in parser, extraction, canonicalization, dedup or
N-Quads serialization shows up as a named missing/extra line.

The 10 fixture pages cover the spec's edge cases: doc 0 malformed html
(containment → constant quads only), 11 empty description, 13/26
newline-in-literal keywords, 17/34 unlinked→skolem objects, 19 robots
tombstone (kg:Inactive), and the 7/48 alias-variant pair ('Entity 7' /
'Entity7') that must merge to one canonical entity."""

import os

import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _engine_lines(tmp_path) -> set[str]:
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.pipelines.kg import materialize_sorted
    from fcrepo3_rdf_extractor_ray.sources.pages import build_alias_table
    from fcrepo3_rdf_extractor_ray.stages.canonicalize import (
        build_entity_map, resolve_quads)
    from fcrepo3_rdf_extractor_ray.stages.dedup import dedup_quads
    from fcrepo3_rdf_extractor_ray.stages.extract import extract_quads_batch

    pages = rd.read_parquet(
        os.path.join(GOLD, "pages_fixture.parquet")).repartition(3)
    raw = pages.map_batches(
        extract_quads_batch, batch_format="pyarrow").materialize()
    mapping = build_entity_map(raw, build_alias_table())
    quads = dedup_quads(resolve_quads(raw, mapping))
    out = str(tmp_path / "golden_out")
    materialize_sorted(quads, out, write_nquads=True,
                       partition_by_subject_hash=False)
    lines: set[str] = set()
    nq_dir = os.path.join(out, "nquads")
    for f in sorted(os.listdir(nq_dir)):
        if f.endswith(".nq"):
            with open(os.path.join(nq_dir, f)) as fh:
                lines.update(l for l in fh.read().splitlines() if l)
    return lines


def test_frozen_corpus_set_diff_both_directions(tmp_path):
    got = _engine_lines(tmp_path)
    with open(os.path.join(GOLD, "expected_multi.nq")) as fh:
        want = {l for l in fh.read().splitlines() if l}
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing ({len(missing)}): {sorted(missing)[:5]}\n"
        f"extra ({len(extra)}): {sorted(extra)[:5]}")


def test_frozen_corpus_edge_cases_present():
    """Sanity on the fixture itself (guards against regenerating it from
    a broken engine): the hand-verified edge-case lines must be there."""
    with open(os.path.join(GOLD, "expected_multi.nq")) as fh:
        want = fh.read()
    # malformed doc 0 → constant quads only, no title/state
    assert "<https://ex0.org/p/0> <rdf:type> <kg:WebPage> <kg:web> ." in want
    assert "<https://ex0.org/p/0> <kg:title>" not in want
    # robots tombstone
    assert ("<https://ex19.org/p/19> <kg:state> <kg:Inactive> <kg:web> ."
            in want)
    # newline-in-literal escaping
    assert '"kw3,\\nalpha"' in want
    # alias-variant merge: docs 7 and 48 both canonicalize to ent:e7
    assert "<ent:e7> <kg:acquired> <ent:e11> <kg:web> ." in want
    assert "<ent:e7> <kg:worksWith> <ent:e11> <kg:web> ." in want
    # unlinked surface → skolem
    assert "<ent:sk:widget17>" in want
    # empty description dropped (doc 11), description present for doc 1
    assert "<https://ex11.org/p/11> <kg:description>" not in want
    assert ('<https://ex1.org/p/1> <kg:description> "About plain" <kg:web> .'
            in want)


def test_frozen_graph_operators(ray_session):
    """Graph operators vs the frozen, INDEPENDENTLY computed expectation
    (pure-Python union-find / brute-force triangles / set-intersection
    jaccard over the fixture's mention rows, checked in as
    ``golden/expected_graph.json``) — guards engine+oracle co-drift the
    same way the N-Quads golden file does for extraction."""
    import json

    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.graph import (
        connected_components, neighborhood_jaccard, triangle_count)
    from fcrepo3_rdf_extractor_ray.stages.ner import (detect_mentions,
                                                      mention_cooccurrence)

    with open(os.path.join(GOLD, "expected_graph.json")) as fh:
        want = json.load(fh)

    pages = rd.read_parquet(
        os.path.join(GOLD, "pages_fixture.parquet")).repartition(3)
    co = mention_cooccurrence(detect_mentions(pages)).materialize()

    got_edges = sorted([r["norm_a"], r["norm_b"], r["n_pages"]]
                       for r in co.take_all())
    assert got_edges == sorted(want["edges"])

    comp = {r["node"]: r["component"]
            for r in connected_components(co).take_all()}
    assert comp == want["components"]

    tri = triangle_count(co)
    assert tri["n_triangles"].tolist() == [want["n_triangles"]]

    lj = {f'{r["norm_a"]}|{r["norm_b"]}': [r["common_neighbors"],
                                           r["jaccard_micro"]]
          for r in neighborhood_jaccard(co).take_all()}
    assert lj == want["link_jaccard"]
