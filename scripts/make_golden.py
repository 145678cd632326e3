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

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "tor_spider_spark",
    "fixtures",
    "golden",
    "crawl_pages_smoke_r3.parquet",
)


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


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    t = golden_table()
    pq.write_table(t, GOLDEN)
    print(f"wrote {len(t)} rows to {os.path.normpath(GOLDEN)}")
