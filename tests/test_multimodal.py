"""Multimodal plumbing: binary payload columns through actor-pool stages
with the decode kernel stubbed deterministically (the real codec slot
raises NotImplementedError, as documented)."""

import numpy as np
import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.stages.multimodal import (
    DecodeImageStage,
    FrameSampleStage,
    image_features,
)


def _items(n=10):
    import ray.data as rd

    rng = np.random.RandomState(5)
    payloads = [rng.bytes(100 + 10 * i) for i in range(n)]
    t = pa.table({
        "item_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    return rd.from_arrow(t).repartition(2), payloads


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        DecodeImageStage(real_decode=True)


def test_image_features_schema_and_determinism():
    ds, payloads = _items()
    out = image_features(ds, batch_size=4).to_pandas().sort_values("item_id")
    assert len(out) == len(payloads)
    assert list(out.columns) == ["item_id", "n_bytes", "width", "height",
                                 "feature"]
    assert out["n_bytes"].tolist() == [len(p) for p in payloads]
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic across independent executions
    out2 = image_features(ds, batch_size=4).to_pandas().sort_values("item_id")
    assert out["width"].tolist() == out2["width"].tolist()
    assert [list(f) for f in out["feature"]] == [list(f) for f in out2["feature"]]


def test_frame_sample_explode():
    stage = FrameSampleStage(k=4)
    t = pa.table({
        "item_id": pa.array([1], pa.int64()),
        "payload": pa.array([bytes(range(64))], pa.binary()),
    })
    out = stage(t)
    assert out.num_rows == 4
    assert out["byte_offset"].to_pylist() == [0, 16, 32, 48]
    assert out["frame_bytes"].to_pylist()[1] == bytes(range(16, 32))
