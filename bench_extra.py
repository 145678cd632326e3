#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
noop-sink isolation timings + .explain("formatted") capture, WITHOUT
touching the frozen bench.py.

Usage:
    python bench_extra.py queries <sf_dir> <n_repeats> [name ...]
        Times each named query (default: the bench list) to a noop sink,
        min-of-n, prints one JSON line {"name": {"min": s, "samples": [...]}}.
    python bench_extra.py explain <sf_dir> <out_dir> [name ...]
        Writes <out_dir>/<name>.txt with explain("formatted") per query.

Timing methodology matches bench.py's bench_queries: the timed region is
query construction + noop write (plan analysis included, no driver
collect).  Each invocation is a fresh DataFrame over the parquet inputs —
no caching across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from tor_spider_spark.session import get_spark  # noqa: E402


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = get_spark(master, app_name="tor-spider-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(spark, sf_dir: str, names: list[str], n: int) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(n):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"## {name}: min={min(samples)} samples={samples}", file=sys.stderr)
    return out


def write_explains(spark, sf_dir: str, out_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"## wrote {name}", file=sys.stderr)


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    spark = _spark()
    if mode == "queries":
        n = int(sys.argv[3])
        names = sys.argv[4:]
        if not names:
            import bench as benchmod

            names = benchmod._BENCH_QUERIES
        print(json.dumps({"sf": sf_dir, "timings": time_queries(spark, sf_dir, names, n)}))
    elif mode == "explain":
        out_dir = sys.argv[3]
        names = sys.argv[4:]
        if not names:
            import bench as benchmod

            names = benchmod._BENCH_QUERIES
        write_explains(spark, sf_dir, out_dir, names)
    spark.stop()


if __name__ == "__main__":
    main()
