"""Multimodal column plumbing (image/audio as opaque binary + metadata).

The decode kernels themselves are STUBBED — the image/audio libraries are
not in this environment — but the Ray-side plumbing is real and tested:
schema handling for binary payload columns, small-batch actor-pool stages
(binary rows are wide — the same sizing concern as the html column,
SURVEY.md §7.4), deterministic fake features so tests are exact, and a
typed output layout.

``DecodeImageStage(real_decode=True)`` raises NotImplementedError at
construction, marking exactly where a PIL/libvips decode would slot in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import siphash24

IMAGE_FEATURES_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("n_bytes", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("feature", pa.list_(pa.float32(), 8)),
])


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decode: dimensions and an
    8-dim feature derived from the payload's SipHash (bit-stable across
    processes/nodes)."""
    h = siphash24(payload)
    width = 16 + (h & 0xFF)
    height = 16 + ((h >> 8) & 0xFF)
    rng = np.random.RandomState(h % (2**32))
    return int(width), int(height), rng.rand(8).astype(np.float32)


class DecodeImageStage:
    """binary-payload batch → typed image-feature rows.

    Actor-pool stage: pass ``real_decode=True`` once a real codec is
    available (raises NotImplementedError until then); the fake path is
    deterministic so the plumbing is testable end-to-end. Keep
    ``batch_size`` small for large payloads (binary rows dominate batch
    memory)."""

    def __init__(self, id_col="item_id", payload_col="payload",
                 real_decode: bool = False):
        if real_decode:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "plug PIL/libvips decode here")
        self.id_col, self.payload_col = id_col, payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, nb, ws, hs, feats = [], [], [], [], []
        for i, payload in zip(t[self.id_col].to_pylist(),
                              t[self.payload_col].to_pylist()):
            w, h, f = _fake_decode(payload)
            ids.append(i)
            nb.append(len(payload))
            ws.append(w)
            hs.append(h)
            feats.append(f.tolist())
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32(), 8)),
        })


class FrameSampleStage:
    """'video' (binary) → k deterministic frame offsets per item: the
    frame-sampling plumbing (explode: 1 row → k rows) with the decode
    stubbed to byte-slices."""

    def __init__(self, k: int = 4, id_col="item_id", payload_col="payload"):
        self.k, self.id_col, self.payload_col = k, id_col, payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_no, offsets, chunks = [], [], [], []
        for i, payload in zip(t[self.id_col].to_pylist(),
                              t[self.payload_col].to_pylist()):
            n = max(1, len(payload))
            for f in range(self.k):
                off = (f * n) // self.k
                ids.append(i)
                frame_no.append(f)
                offsets.append(off)
                chunks.append(payload[off:off + 16])
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_no": pa.array(frame_no, pa.int32()),
            "byte_offset": pa.array(offsets, pa.int64()),
            "frame_bytes": pa.array(chunks, pa.binary()),
        })


def image_features(items_ds, id_col="item_id", payload_col="payload",
                   batch_size: int = 64, concurrency=None):
    """Decode stage. Default is task form on warm workers (the stubbed
    codec has no per-actor setup worth a pool ramp); pass ``concurrency``
    to get the actor-pool form — the right shape once ``real_decode``
    loads an actual codec/model per actor."""
    if concurrency is not None:
        return items_ds.map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"id_col": id_col,
                                   "payload_col": payload_col},
            batch_format="pyarrow",
            batch_size=batch_size,  # binary payloads: small batches
            concurrency=concurrency,
        )

    def decode_batch(t: pa.Table) -> pa.Table:
        return DecodeImageStage(id_col=id_col, payload_col=payload_col)(t)

    return items_ds.map_batches(decode_batch, batch_format="pyarrow",
                                batch_size=batch_size)
