"""Per-row error containment covers the WHOLE per-page derivation.

The reference catches every Exception per object
(ObjectProcessor.java:172-176) so one bad record never fails the batch;
the engine must match — including data errors raised AFTER the parse,
e.g. an unmapped robots directive ('noindex, nofollow') hitting the
total enum mapping (schema.robots_state)."""

import datetime as dt

import pyarrow as pa

from fcrepo3_rdf_extractor_ray.sources.pages import _page_html
from fcrepo3_rdf_extractor_ray.stages.extract import (ExtractQuadsStage,
                                                      extract_quads_batch)
from fcrepo3_rdf_extractor_ray.functions.normalize import norm_surface


def _batch_with_bad_robots():
    # doc_id 19 → %19==0 → robots meta present; mutate its content to a
    # multi-directive value outside the total ROBOTS_STATE mapping
    bad = _page_html(19, "bad robots page").replace(
        b'content="noindex"', b'content="noindex, nofollow"')
    good = _page_html(1, "good page text")
    ts = dt.datetime(2024, 1, 1)
    return pa.table({
        "url": pa.array(["https://ex.org/p/19", "https://ex.org/p/1"]),
        "warc_ts": pa.array([ts, ts], pa.timestamp("us")),
        "html": pa.array([bad, good], pa.binary()),
        "lang": pa.array(["en", "en"]),
    })


def test_bad_robots_is_contained_not_fatal():
    out = extract_quads_batch(_batch_with_bad_robots())  # must not raise
    by_url = {}
    for r in out.to_pylist():
        by_url.setdefault(r["src_url"], set()).add(r["pred"])
    # the good page got its full derivation
    assert "kg:title" in by_url["https://ex.org/p/1"]
    # the bad page kept its constant quads (rdf:type etc.) but the
    # post-parse derivation was contained
    assert "rdf:type" in by_url["https://ex.org/p/19"]
    assert "kg:state" not in by_url["https://ex.org/p/19"]


def test_bad_robots_counted_as_error_in_stage():
    stage = ExtractQuadsStage()
    out = stage(_batch_with_bad_robots())
    assert stage.errors == 1
    assert out.num_rows > 0  # good page + constant quads survived


def test_norm_surface_nonlatin_no_collapse():
    a, b = norm_surface("Привет"), norm_surface("Κόσμος")
    assert a and b and a != b  # no empty-string collapse across scripts
    assert norm_surface(a) == a  # fallback is a fixed point (idempotent)
    assert norm_surface("Привет") == a  # deterministic
    # punctuation-only surfaces also hash (no shared-skolem collapse);
    # only the truly-empty string stays empty
    assert norm_surface("...") != "" and norm_surface("...") != a
    assert norm_surface("") == ""
