"""Engine table schemas (SURVEY §1.6 mapping table).

The reference's in-flight structs — ``Job{URL}`` (spider/spider.go:25-27)
and ``PageInfo{URL,Body,Title,Status}`` (spider/spider.go:30-35) — become
fixed columnar schemas; the graft cell re-types Body as an image payload
and Title as caption (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


CORPUS = _s(
    ("url", StringType()),
    ("host", StringType()),
    ("status", IntegerType()),
    ("out_links", ArrayType(StringType())),
    ("image_id", StringType()),
    ("bytes", BinaryType()),
    ("w", IntegerType()),
    ("h", IntegerType()),
    ("fmt", StringType()),
    ("caption", StringType()),
    ("phash", LongType()),
)

SEEDS = _s(
    ("url", StringType()),
    ("is_seed", BooleanType()),
    ("recrawl_every", IntegerType()),
)

SEED_INBOX = _s(  # streamed seed events (S1/S2), drained by the driver
    ("url", StringType()),
    ("recrawl_every", IntegerType()),
)

ROBOTS = _s(
    ("host", StringType()),
    ("disallow_prefixes", ArrayType(StringType())),
    ("crawl_delay_ms", LongType()),
    ("max_per_round", IntegerType()),
)

FRONTIER = _s(
    ("url", StringType()),
    ("url_hash", LongType()),
    ("host", StringType()),
    ("host_hash", LongType()),
    ("depth", IntegerType()),
    ("priority", DoubleType()),
    ("discovered_round", IntegerType()),
    ("is_seed", BooleanType()),
)

SEEN = _s(
    ("url_hash", LongType()),
    ("host_hash", LongType()),
    ("first_round", IntegerType()),
)

PAGES = _s(
    ("url", StringType()),
    ("url_hash", LongType()),
    ("host", StringType()),
    ("host_hash", LongType()),
    ("status", IntegerType()),
    ("round", IntegerType()),
    ("image_id", StringType()),
    ("bytes", BinaryType()),
    ("w", IntegerType()),
    ("h", IntegerType()),
    ("fmt", StringType()),
    ("caption", StringType()),
    ("phash", LongType()),
)

SCHEDULE = _s(  # deterministic projection for the ordering judge (SURVEY §2.8 W3)
    ("round", IntegerType()),
    ("rank", IntegerType()),
    ("url", StringType()),
    ("url_hash", LongType()),
    ("host", StringType()),
    ("depth", IntegerType()),
    ("priority", DoubleType()),
)

HOST_STATE = _s(
    ("host", StringType()),
    ("host_hash", LongType()),
    ("last_fetch_round", IntegerType()),
)

BLOOM_SHARDS = _s(
    ("shard_id", IntegerType()),
    ("round", IntegerType()),
    ("bits", BinaryType()),
    ("n_items", LongType()),
)

METRICS = _s(
    ("round", IntegerType()),
    ("partition_id", IntegerType()),
    ("metric", StringType()),
    ("value", LongType()),
)
