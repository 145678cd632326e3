"""64-bit hashing shared by the engine (JVM-side) and the pure-Python
reference simulator.

The reference marks URLs visited under a 64-bit hash of the URL (colly's
redis storage keys requests by a 64-bit FNV-1a of the URL; attached at
reference spider/spider.go:153).  The engine uses Spark's built-in
``F.xxhash64`` (JVM, whole-stage codegen) for the same role; this module
provides a bit-exact pure-Python XXH64 so the simulator can reproduce the
engine's ``url_hash`` / ``host_hash`` values without a JVM.

Spark's ``xxhash64`` hashes the UTF-8 bytes of a string with seed 42 using
the standard XXH64 algorithm and returns the result as a *signed* 64-bit
long; ``xxh64`` below matches it exactly (unit-tested in
tests/test_hashing.py against ``F.xxhash64`` on live Spark).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxh64_unsigned(data: bytes | str, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Standard XXH64 of *data* with *seed*, as an unsigned 64-bit int."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        i = 0
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
        i = 0
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64(s: str, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed 64-bit XXH64 of a string's UTF-8 bytes — equals Spark's
    ``F.xxhash64(lit(s))``."""
    return _to_signed(xxh64_unsigned(s.encode("utf-8"), seed))


def url_hash(url: str) -> int:
    return xxh64(url)


def host_hash(host: str) -> int:
    return xxh64(host)


def bucket_of(h: int, n_buckets: int) -> int:
    """Bucket id for a signed 64-bit hash — mirrors the engine's
    ``pmod(host_hash, n_buckets)`` (Spark pmod: non-negative)."""
    return h % n_buckets if h >= 0 else (h % n_buckets + n_buckets) % n_buckets
