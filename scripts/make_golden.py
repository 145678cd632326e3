#!/usr/bin/env python
"""Regenerate the committed golden parquet for the flagship crawl oracle.

The `crawl_pages_3rounds` driver-contract query runs 3 engine rounds on
the deterministic SMOKE fixture; its DuckDB oracle reads THIS file, which
is the pure-Python simulator's pages output for the same fixture+config.
Re-run this script whenever the frozen crawl semantics (config.py) or the
fixture generator change; tests/test_queries_oracle.py asserts freshness.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tor_spider_spark.config import CrawlConfig  # noqa: E402
from tor_spider_spark.fixtures.corpus import SMOKE, generate_fixture  # noqa: E402
from tor_spider_spark.simulator import simulate  # noqa: E402

_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "tor_spider_spark",
    "fixtures",
    "golden",
)
GOLDEN = os.path.join(_GOLDEN_DIR, "crawl_pages_smoke_r3.parquet")
GOLDEN_PHASH = os.path.join(_GOLDEN_DIR, "phash_corpus_smoke.parquet")


def golden_table() -> pa.Table:
    sim = simulate(generate_fixture(SMOKE), CrawlConfig(max_rounds=3))
    rows = sorted(sim.pages, key=lambda p: (p["url"], p["round"]))
    return pa.table(
        {
            "url": pa.array([p["url"] for p in rows], pa.string()),
            "round": pa.array([p["round"] for p in rows], pa.int32()),
            "image_id": pa.array([p["image_id"] for p in rows], pa.string()),
            "caption": pa.array([p["caption"] for p in rows], pa.string()),
            "phash": pa.array([p["phash"] for p in rows], pa.int64()),
            "status": pa.array([p["status"] for p in rows], pa.int32()),
        }
    )


def phash_corpus_table(n_base: int = 6000, seed: int = 42) -> pa.Table:
    """Deterministic (image_id, phash) corpus for the phash near-dup
    oracle. Base phashes are uniform 64-bit (expected accidental pairs at
    hamming ≤ 6 across n² ≈ 2·10^7 ordered pairs: ~10^-4 — none); every
    8th image gets a planted variant at a known distance 1..6, and every
    64th an above-threshold decoy at distance 8..12 that the operator
    must NOT return. Both the Spark query and the DuckDB oracle read this
    file as INPUT and compute the pair set independently (banded join vs
    exact cross join)."""
    import random

    rng = random.Random(seed)
    ids, hashes = [], []

    def signed64(u: int) -> int:
        return u - (1 << 64) if u >= 1 << 63 else u

    def flipped(base_u: int, n_flips: int) -> int:
        bits = rng.sample(range(64), n_flips)
        for b in bits:
            base_u ^= 1 << b
        return base_u

    for i in range(n_base):
        u = rng.getrandbits(64)
        ids.append(f"img{i:06d}")
        hashes.append(signed64(u))
        if i % 8 == 0:
            ids.append(f"img{i:06d}_near")
            hashes.append(signed64(flipped(u, 1 + i // 8 % 6)))
        if i % 64 == 0:
            ids.append(f"img{i:06d}_decoy")
            hashes.append(signed64(flipped(u, 8 + i // 64 % 5)))
    return pa.table(
        {"image_id": pa.array(ids, pa.string()), "phash": pa.array(hashes, pa.int64())}
    )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    t = golden_table()
    pq.write_table(t, GOLDEN)
    print(f"wrote {len(t)} rows to {os.path.normpath(GOLDEN)}")
    t2 = phash_corpus_table()
    pq.write_table(t2, GOLDEN_PHASH)
    print(f"wrote {len(t2)} rows to {os.path.normpath(GOLDEN_PHASH)}")
