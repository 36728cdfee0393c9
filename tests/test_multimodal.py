"""Multimodal plumbing: binary payload columns through actor-pool stages.
P6 PPM decode is REAL (pure-numpy codec); compressed formats stay
stubbed (deterministic fake) since no image libs exist here."""

import numpy as np
import pyarrow as pa
import pytest

from fcrepo3_rdf_extractor_ray.stages.multimodal import (
    AudioWindowStage,
    DecodeImageStage,
    FrameSampleStage,
    PpmStatsStage,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    image_features,
    synthetic_ppm,
    synthetic_wav,
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


def test_ppm_roundtrip():
    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, size=(5, 9, 3)).astype(np.uint8)
    w, h, out = decode_ppm(encode_ppm(pix))
    assert (w, h) == (9, 5)
    assert np.array_equal(out, pix)


def test_ppm_header_comments_and_errors():
    pix = np.zeros((2, 2, 3), np.uint8)
    body = encode_ppm(pix)
    # netpbm comment lines inside the header must be skipped
    commented = b"P6\n# a comment\n2 2\n# another\n255\n" + body[11:]
    w, h, out = decode_ppm(commented)
    assert (w, h) == (2, 2) and np.array_equal(out, pix)
    for bad in (b"P5\n2 2\n255\n" + bytes(12),     # wrong magic
                body[:-1],                           # truncated plane
                b"P6\n2 2\n65535\n" + bytes(24),    # 16-bit maxval
                b"P6\n2 x\n255\n" + bytes(12)):     # non-numeric dim
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_ppm_stats_real_decode_and_containment():
    good = [synthetic_ppm(d, 8 + d % 9, 8 + (3 * d) % 9) for d in range(6)]
    t = pa.table({
        "item_id": pa.array(range(7), pa.int64()),
        "payload": pa.array(good + [b"JFIF not a ppm"], pa.binary()),
    })
    with pytest.raises(ValueError):
        PpmStatsStage()(t)                 # on_error="raise" is task-fatal
    stage = PpmStatsStage(on_error="skip")
    out = stage(t)
    assert out.num_rows == 6 and stage.error_count == 1
    # exact integer sums vs an independent recompute from raw pixels
    for row, d in zip(out.to_pylist(), range(6)):
        w, h, pix = decode_ppm(good[d])
        assert (row["width"], row["height"]) == (w, h)
        sums = pix.reshape(-1, 3).sum(axis=0)
        assert [row["sum_r"], row["sum_g"], row["sum_b"]] == sums.tolist()


def test_real_decode_image_features():
    t = pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([synthetic_ppm(1), synthetic_ppm(2)],
                            pa.binary()),
    })
    out = DecodeImageStage(real_decode=True)(t)
    assert out["width"].to_pylist() == [16, 16]
    feats = out["feature"].to_pylist()
    assert all(len(f) == 8 for f in feats)
    # channel means and histogram fractions are bounded [0, 1]
    assert all(0.0 <= v <= 1.0 for f in feats for v in f)
    # histogram fractions (last 4 dims) sum to 1
    assert all(abs(sum(f[4:]) - 1.0) < 1e-6 for f in feats)


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


def test_wav_roundtrip_and_chunk_skip():
    rng = np.random.RandomState(11)
    samples = rng.randint(-32768, 32768, size=777).astype(np.int16)
    rate, out = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000 and np.array_equal(out, samples)
    # unknown metadata chunks before data must be skipped (RIFF spec);
    # odd-sized chunks are word-aligned with a pad byte
    import struct
    wav = encode_wav(samples)
    meta = b"LIST" + struct.pack("<I", 5) + b"hello" + b"\x00"
    spliced = wav[:36] + meta + wav[36:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    rate, out = decode_wav(spliced)
    assert np.array_equal(out, samples)


def test_wav_errors():
    good = encode_wav(np.zeros(4, np.int16))
    import struct
    stereo = good[:22] + struct.pack("<H", 2) + good[24:]
    eightbit = good[:34] + struct.pack("<H", 8) + good[36:]
    for bad in (b"OggS" + good[4:],          # wrong magic
                good[:-3],                    # truncated data chunk
                stereo, eightbit,
                good[:12]):                   # no chunks at all
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_audio_window_stats_and_containment():
    # includes the int16 abs-overflow pitfall: a -32768 sample
    samples = np.array([-32768, 100, -5, 32767, 1, 2, 3, 4, 9],
                       np.int16)
    t = pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_wav(samples), b"not audio"],
                            pa.binary()),
    })
    with pytest.raises(ValueError):
        AudioWindowStage(window=4)(t)
    stage = AudioWindowStage(window=4, on_error="skip")
    out = stage(t)
    assert stage.error_count == 1
    assert out["window_no"].to_pylist() == [0, 1, 2]
    assert out["n_samples"].to_pylist() == [4, 4, 1]
    assert out["sum_abs"].to_pylist() == [32768 + 100 + 5 + 32767, 10, 9]
    assert out["peak"].to_pylist() == [32768, 4, 9]


def test_synthetic_wav_matches_formula():
    d = 37
    rate, s = decode_wav(synthetic_wav(d, 1024))
    expect = ((d * 2654435761) % 65536 + np.arange(1024)) % 65536 - 32768
    assert np.array_equal(s.astype(np.int64), expect)


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


def test_phash_neardup_planted(ray_session):
    """aHash near-dup: a brightness-shifted and a lightly-noised copy of
    a base image must pair with the base; the inverted image (aHash
    complement) must not pair with it."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.multimodal import (
        decode_ppm, encode_ppm, phash64, phash_neardup_pairs,
        synthetic_ppm)

    base = synthetic_ppm(7, 16, 12)
    w, h, px = decode_ppm(base)
    brighter = encode_ppm(np.clip(px.astype(np.int32) + 3, 0, 255)
                          .astype(np.uint8))
    noisy = px.copy()
    noisy[0, 0] = [255, 255, 255]  # single-pixel corruption
    noisy_b = encode_ppm(noisy)
    inverted = encode_ppm((255 - px).astype(np.uint8))

    items = pa.table({
        "item_id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array([base, brighter, noisy_b, inverted],
                            pa.binary()),
    })
    out = phash_neardup_pairs(rd.from_arrow(items).repartition(2),
                              max_hamming=6).to_pandas()
    pairs = set(map(tuple, out[["item_a", "item_b"]].values))
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 4) not in pairs
    # hash determinism: same payload, same hash
    assert phash64(base) == phash64(base)
    # inversion flips (nearly) every aHash bit
    d = bin(phash64(base) ^ phash64(inverted)).count("1")
    assert d > 32


def test_scene_change_planted_cut(ray_session):
    """Concatenated-PPM video with two shots (3 identical frames each):
    exactly one cut, at the shot boundary; identical consecutive frames
    have hamming 0; a malformed item is contained, not fatal."""
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.multimodal import (
        scene_changes, split_ppm_stream, synthetic_ppm)

    a = synthetic_ppm(1, 16, 16)
    b = synthetic_ppm(4242, 12, 20)  # different dims too
    video = a + a + a + b + b
    assert [len(f) for f in split_ppm_stream(video)] == [len(a)] * 3 + \
        [len(b)] * 2
    items = pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([video, b"not a ppm"], pa.binary()),
    })
    out = scene_changes(rd.from_arrow(items)).to_pandas()
    assert set(out["item_id"]) == {1}  # malformed item contained
    cuts = out[out["is_cut"]]
    assert cuts["frame_no"].tolist() == [3]
    assert (out[out["frame_no"].isin([1, 2, 4])]["hamming_prev"] == 0).all()


def test_split_ppm_stream_255_dimension_frame():
    """Regression: a frame whose height (or width) is 255 puts the bytes
    b'255\\n' inside the dimension tokens; frame boundaries must come
    from each frame's own header length + pixel-plane size, not from
    searching for a header substring."""
    from fcrepo3_rdf_extractor_ray.stages.multimodal import (
        split_ppm_stream, synthetic_ppm)

    tall = synthetic_ppm(7, 2, 255)   # header: P6\n2 255\n255\n
    wide = synthetic_ppm(9, 255, 2)
    small = synthetic_ppm(3, 4, 4)
    video = tall + small + wide + small
    frames = split_ppm_stream(video)
    assert [len(f) for f in frames] == [len(tall), len(small),
                                        len(wide), len(small)]
    # and a truncated tail frame raises (per-item containment upstream)
    import pytest

    with pytest.raises(ValueError):
        split_ppm_stream(video + small[:-10])


def test_resize_block_mean_identity_and_containment(ray_session):
    """Resizing an 8×8 image to 8×8 is the identity on pixel values
    (every block is one pixel); malformed payloads drop their rows."""
    import pyarrow as pa
    import ray.data as rd

    from fcrepo3_rdf_extractor_ray.stages.multimodal import (
        decode_ppm, resize_block_mean, resize_images, synthetic_ppm)

    img = synthetic_ppm(5, 8, 8)
    w, h, px = decode_ppm(img)
    grid = resize_block_mean(img, 8, 8)
    assert (grid == px.astype("int64")).all()

    items = pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([img, b"junk"], pa.binary()),
    })
    out = resize_images(rd.from_arrow(items)).to_pandas()
    assert set(out["item_id"]) == {1}
    assert len(out) == 64
    row = out[(out["y"] == 3) & (out["x"] == 4)].iloc[0]
    assert (row[["r", "g", "b"]].to_numpy() == px[3, 4]).all()
