"""Secondary-fetch stage: batched range reads + per-row containment
(the ObjectProcessor.java:209-226 REDIRECT/EXTERNAL semantics)."""

import os

import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.stages.fetch import (SecondaryFetchStage,
                                                    local_opener, parse_ref)


@pytest.fixture()
def container(tmp_path):
    p = str(tmp_path / "shard0.bin")
    with open(p, "wb") as f:
        f.write(b"0123456789abcdefghij")
    return p


def _batch(refs):
    return pa.table({
        "url": pa.array([f"https://x/{i}" for i in range(len(refs))]),
        "content_ref": pa.array(refs, pa.string()),
    })


def test_range_reads_and_grouping(container):
    stage = SecondaryFetchStage()
    out = stage(_batch([f"{container}:0:4", f"{container}:10:5"]))
    assert out["payload"].to_pylist() == [b"0123", b"abcde"]
    assert out["fetch_ok"].to_pylist() == [True, True]
    assert stage.errors == 0


def test_per_row_containment(container):
    stage = SecondaryFetchStage()
    out = stage(_batch([
        f"{container}:0:4",          # good
        "not-a-ref",                 # malformed pointer
        f"{container}:15:99",        # short read (past EOF)
        "/nonexistent/file:0:4",     # unreachable container
        f"{container}:5:3",          # good — must survive its bad peers
    ]))
    assert out["fetch_ok"].to_pylist() == [True, False, False, False, True]
    assert out["payload"].to_pylist()[0] == b"0123"
    assert out["payload"].to_pylist()[4] == b"567"
    assert all(out["payload"].to_pylist()[i] is None for i in (1, 2, 3))
    assert stage.errors == 3


def test_custom_opener_counts_open_per_container(container):
    opens = []

    def opener(path):
        opens.append(path)
        return local_opener(path)

    stage = SecondaryFetchStage(opener=opener)
    stage(_batch([f"{container}:0:2", f"{container}:2:2",
                  f"{container}:4:2"]))
    assert opens == [container]  # one open for three ranges


def test_parse_ref_windows_safe():
    assert parse_ref("warc/seg-00.warc.gz:1024:512") == (
        "warc/seg-00.warc.gz", 1024, 512)
    with pytest.raises(ValueError):
        parse_ref("x:-1:4")


def test_distributed_stage(container, sf_dir):
    import ray.data as rd

    ds = rd.from_arrow(_batch([f"{container}:0:4", "bad", f"{container}:4:4"]))
    out = ds.map_batches(
        SecondaryFetchStage, batch_format="pyarrow",
        concurrency=2, batch_size=2,
    ).take_all()
    by_url = {r["url"]: r for r in out}
    assert by_url["https://x/0"]["payload"] == b"0123"
    assert by_url["https://x/1"]["fetch_ok"] is False
    assert by_url["https://x/2"]["payload"] == b"4567"
