"""Multimodal mapInPandas plumbing: image features/resize on REAL codec
output; audio on the documented deterministic stub."""

from __future__ import annotations

import numpy as np

from tor_spider_spark.fixtures.images import decode_png, encode_png, phash64
from tor_spider_spark.multimodal import (
    extract_audio_features,
    extract_image_features,
    resize_images,
)


def _images(spark, n=8, px=32):
    rows = []
    for i in range(n):
        arr = np.random.default_rng(i).integers(0, 256, (px, px, 3), dtype=np.uint8)
        rows.append((f"img{i}", encode_png(arr)))
    return spark.createDataFrame(rows, "image_id string, bytes binary"), rows


def test_extract_image_features(spark):
    df, rows = _images(spark)
    got = {r["image_id"]: r for r in extract_image_features(df).collect()}
    assert set(got) == {f"img{i}" for i in range(8)}
    for iid, blob in rows:
        px = decode_png(blob)
        r = got[iid]
        assert (r["w"], r["h"]) == (px.shape[1], px.shape[0])
        assert abs(r["mean_r"] - px[..., 0].mean()) < 1e-6
        assert r["phash"] == phash64(px)


def test_resize_images(spark):
    df, _ = _images(spark, n=4, px=48)
    out = {r["image_id"]: r for r in resize_images(df, target=16).collect()}
    for iid, r in out.items():
        assert (r["w"], r["h"]) == (16, 16)
        small = decode_png(bytes(r["bytes"]))
        assert small.shape == (16, 16, 3)


def test_audio_stub_plumbing(spark):
    pcm = (np.sin(np.linspace(0, 100, 32000)) * 10000).astype(np.int16)
    df = spark.createDataFrame([("clip0", pcm.tobytes()), ("clip1", None)], "clip_id string, bytes binary")
    rows = extract_audio_features(df).collect()
    assert len(rows) == 1  # null payload skipped
    r = rows[0]
    assert r["clip_id"] == "clip0"
    assert abs(r["duration_s"] - 2.0) < 1e-6
    assert 6000 < r["rms"] < 8000  # sine rms ≈ amplitude/sqrt(2)


def test_audio_wav_roundtrip_real_decode(spark):
    """WAV payloads decode for REAL via stdlib `wave` (VERDICT r3 next
    #7): duration honors the header's sample rate (not the stub's fixed
    16 kHz), multi-channel mixes down, and RMS matches the generated
    signal exactly — round trip through our own encode_wav."""
    from tor_spider_spark.multimodal import encode_wav

    sr = 8000
    t = np.linspace(0, 100, sr * 3)  # 3 s at 8 kHz — stub math would say 1.5 s
    mono = (np.sin(t) * 12000).astype(np.int16)
    stereo = np.stack([mono, np.zeros_like(mono)], axis=1)  # mixdown → mono/2
    df = spark.createDataFrame(
        [
            ("wav_mono", encode_wav(mono, sample_rate=sr)),
            ("wav_stereo", encode_wav(stereo, sample_rate=sr, n_channels=2)),
            ("raw", mono.tobytes()),  # no RIFF header → documented fallback
        ],
        "clip_id string, bytes binary",
    )
    got = {r["clip_id"]: r for r in extract_audio_features(df).collect()}
    expect_rms = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
    assert abs(got["wav_mono"]["duration_s"] - 3.0) < 1e-9
    assert abs(got["wav_mono"]["rms"] - expect_rms) < 1e-9
    assert abs(got["wav_stereo"]["duration_s"] - 3.0) < 1e-9
    assert abs(got["wav_stereo"]["rms"] - expect_rms / 2) < 1e-9
    # the fallback path interprets the same samples at its fixed 16 kHz
    assert abs(got["raw"]["duration_s"] - 1.5) < 1e-9
    assert abs(got["raw"]["rms"] - expect_rms) < 1e-9


def test_audio_corrupt_riff_degrades_not_aborts(spark):
    """Attacker-controlled payloads: a truncated/float-PCM RIFF container
    and an odd-length raw blob must degrade to the fallback decode, never
    fail the task (code-review r4 finding #3)."""
    bad_riff = b"RIFF\x10\x00\x00\x00WAVEjunkjunkjunk"  # not a parseable WAV
    odd_raw = b"\x01\x02\x03"  # 3 bytes: not a multiple of int16
    df = spark.createDataFrame(
        [("bad_riff", bad_riff), ("odd", odd_raw)], "clip_id string, bytes binary"
    )
    got = {r["clip_id"]: r for r in extract_audio_features(df).collect()}
    assert set(got) == {"bad_riff", "odd"}  # both rows survived
    assert got["odd"]["duration_s"] == 1 / 16000.0  # one int16 sample kept


def test_audio_zero_rate_wav_degrades(spark):
    """A parseable WAV whose header declares sample-rate 0 (stdlib wave
    does not validate it) must fall back instead of dividing by zero
    (code-review r4 pass-2 finding #1)."""
    from tor_spider_spark.multimodal import encode_wav

    pcm = (np.sin(np.linspace(0, 10, 4000)) * 8000).astype(np.int16)
    blob = bytearray(encode_wav(pcm, sample_rate=8000))
    blob[24:28] = (0).to_bytes(4, "little")  # fmt-chunk sample rate -> 0
    df = spark.createDataFrame([("z", bytes(blob))], "clip_id string, bytes binary")
    rows = extract_audio_features(df).collect()
    assert len(rows) == 1  # task survived; fallback engaged
    assert rows[0]["duration_s"] > 0


def test_video_frame_sampling(spark):
    """Frame sampler: every n-th frame of the fixture container comes back
    as its own row, pixel-exact (PNG is lossless), with frame numbers
    preserved; null payloads and foreign blobs are skipped."""
    from tor_spider_spark.multimodal import encode_video, sample_video_frames

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(7)]
    df = spark.createDataFrame(
        [
            ("vid0", encode_video(frames)),
            ("vid1", None),
            ("vid2", b"not-a-video"),
        ],
        "video_id string, bytes binary",
    )
    got = sample_video_frames(df, every_n=3).collect()
    by_no = {r["frame_no"]: r for r in got}
    assert {r["video_id"] for r in got} == {"vid0"}
    assert sorted(by_no) == [0, 3, 6]  # every 3rd of 7 frames
    for no, r in by_no.items():
        assert (r["w"], r["h"]) == (10, 12)
        assert np.array_equal(decode_png(bytes(r["bytes"])), frames[no])
