"""Image payload codec for the synthetic corpus (BASELINE.json input_hint:
``bytes:binary, w:int32, h:int32, fmt:string, phash:int64``).

The reference stores the raw response body as a string (PageInfo.Body,
reference spider/spider.go:30-35, 310); the graft cell re-types that payload
as an image.  This container ships no image libraries (no PIL / turbojpeg),
so the codec here is self-contained:

- ``fmt='png'``   — a REAL, spec-compliant PNG (8-bit RGB, filter 0, zlib),
  decodable by any standard reader.  Lossless: decoded pixels are exactly
  the source array, so the pixel-allclose invariant is exact equality.
- ``fmt='jpeg'``  — a clearly-marked deterministic lossy STAND-IN (magic
  ``QJPG``): pixels quantized to a step of 4 then zlib-compressed.  The
  quantization error is uniform in (-2, 2], giving PSNR ≈ 47 dB ≥ the 40 dB
  invariant, i.e. it exercises exactly the lossy-roundtrip code path the
  input_hint demands.  In a real deployment the encode/decode bodies below
  are swapped for libjpeg via the SAME UDF signatures
  (tor_spider_spark/functions/images.py); nothing else changes.

All functions are numpy-vectorized (they run inside Arrow-batched pandas
UDFs — no per-row Python in the engine hot path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJPG"
_QJPG_STEP = 4  # quantization step -> PSNR ~= 20*log10(255/(4/sqrt(12))) ~= 47 dB


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    raw = tag + payload
    return struct.pack(">I", len(payload)) + raw + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a standard RGB8 PNG (filter 0)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    # one filter byte (0 = None) per scanline
    scanlines = np.concatenate([np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a filter-0 RGB8 PNG produced by :func:`encode_png` (also
    handles per-line filters 0-4 for robustness)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    idat = b""
    h = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int64).reshape(h, w, 3)
    if np.any(filters != 0):  # general path, rarely taken for our encoder
        prev = np.zeros((w, 3), np.int64)
        for y in range(h):
            line = out[y]
            f = filters[y]
            if f == 2:  # Up
                line += prev
            elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential
                left = np.zeros(3, np.int64)
                for x in range(w):
                    up = prev[x]
                    if f == 1:
                        line[x] += left
                    elif f == 3:
                        line[x] += (left + up) // 2
                    else:
                        ul = prev[x - 1] if x else np.zeros(3, np.int64)
                        p = left + up - ul
                        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
                        line[x] += pred
                    left = line[x] & 0xFF
            out[y] = line & 0xFF
            prev = out[y]
    return (out & 0xFF).astype(np.uint8)


def encode_qjpg(rgb: np.ndarray) -> bytes:
    """Deterministic lossy stand-in for JPEG (see module docstring)."""
    h, w, _ = rgb.shape
    q = ((rgb.astype(np.int64) + _QJPG_STEP // 2) // _QJPG_STEP).clip(0, 255 // _QJPG_STEP)
    return (
        _QJPG_MAGIC
        + struct.pack(">IIB", w, h, _QJPG_STEP)
        + zlib.compress(q.astype(np.uint8).tobytes(), 6)
    )


def decode_qjpg(data: bytes) -> np.ndarray:
    assert data[:4] == _QJPG_MAGIC, "not a QJPG"
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), np.uint8).reshape(h, w, 3)
    return (q.astype(np.int64) * step).clip(0, 255).astype(np.uint8)


def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    return encode_png(rgb) if fmt == "png" else encode_qjpg(rgb)


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes. Real image formats other than our two
    fixture codecs are intentionally unimplemented in this container
    (no image libs); the UDF plumbing is format-agnostic."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == _QJPG_MAGIC:
        return decode_qjpg(data)
    raise NotImplementedError(
        "real JPEG/WebP decode requires an image library not present in this "
        "container; swap decode_image's body for PIL/libjpeg in deployment"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT perceptual hash (imagehash-style, public algorithm):
    grayscale → area-resample to 32×32 → 2-D DCT → top-left 8×8 (minus DC
    scaling) → bits = coeff > median.  Returns a SIGNED int64 (matches the
    ``phash:int64`` column type in BASELINE.json input_hint)."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # deterministic area-average resample to 32x32
    ys = (np.arange(33) * h // 32).clip(1, h)
    xs = (np.arange(33) * w // 32).clip(1, w)
    cs = np.zeros((h + 1, w + 1))
    cs[1:, 1:] = gray.cumsum(0).cumsum(1)
    ys0, xs0 = np.concatenate([[0], ys[1:-1]]), np.concatenate([[0], xs[1:-1]])
    area = (ys[1:] - ys0)[:, None] * (xs[1:] - xs0)[None, :]
    small = (
        cs[ys[1:]][:, xs[1:]] - cs[ys0][:, xs[1:]] - cs[ys[1:]][:, xs0] + cs[ys0][:, xs0]
    ) / np.maximum(area, 1)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term
    bits = (block > med).astype(np.uint64)
    val = int(np.sum(bits << np.arange(64, dtype=np.uint64)))
    return val - (1 << 64) if val >= (1 << 63) else val
