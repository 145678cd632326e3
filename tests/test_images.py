"""Image codec invariants (BASELINE.json input_hint): lossless roundtrip
exact; lossy roundtrip PSNR ≥ 40 dB; phash stability; unknown formats are
an explicit, documented stub."""

from __future__ import annotations

import numpy as np
import pytest

from tor_spider_spark.fixtures.images import (
    decode_image,
    decode_png,
    decode_qjpg,
    encode_png,
    encode_qjpg,
    phash64,
    psnr,
)


def _img(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_lossless_roundtrip():
    for seed, shape in [(1, (32, 32)), (2, (64, 48)), (3, (17, 23)), (4, (1, 1))]:
        img = _img(seed, *shape)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_is_real_png():
    data = encode_png(_img(5))
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:33] and data.endswith(b"IEND\xaeB`\x82")


def test_qjpg_lossy_psnr_above_40():
    for seed in range(5):
        img = _img(seed, 64, 64)
        assert psnr(img, decode_qjpg(encode_qjpg(img))) >= 40.0


def test_phash_stable_under_lossy():
    img = _img(7, 64, 64)
    a, b = phash64(img), phash64(decode_qjpg(encode_qjpg(img)))
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 4


def test_phash_distinguishes_images():
    a, b = phash64(_img(8)), phash64(_img(9))
    assert a != b


def test_decode_dispatch_and_stub():
    img = _img(10)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert psnr(img, decode_image(encode_qjpg(img))) >= 40
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not actually decodable here")
