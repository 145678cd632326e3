"""Pure-Python XXH64 must be bit-identical to Spark's xxhash64 — the
simulator's seen-set oracle depends on it (SURVEY §2.7 C5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tor_spider_spark.functions.hashing import bucket_of, xxh64


def test_xxh64_matches_spark(spark):
    cases = [
        "",
        "a",
        "http://abcdefghij234567.onion/p1",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "unicode-héllo-☂ 金魚",
        "q" * 100,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r.s: r.h for r in df.collect()}
    for c in cases:
        assert xxh64(c) == got[c], c


def test_bucket_of_matches_pmod(spark):
    hashes = [xxh64(f"u{i}") for i in range(50)]
    df = spark.createDataFrame([(h,) for h in hashes], "h long").select(
        "h", F.pmod(F.col("h"), F.lit(16)).alias("b")
    )
    got = {r.h: r.b for r in df.collect()}
    for h in hashes:
        assert bucket_of(h, 16) == got[h]


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_xxh64_signed_range(s):
    h = xxh64(s)
    assert -(1 << 63) <= h < (1 << 63)
