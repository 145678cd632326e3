#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine (north rule: "run via
spark-submit --py-files").

Package and submit:

    cd /root/repo && zip -qr /tmp/tor_spider_spark.zip tor_spider_spark
    spark-submit --master local[32] --py-files /tmp/tor_spider_spark.zip \\
        scripts/run_crawl.py --fixture-dir BENCH/cache/fixture-... \\
        --run-dir /tmp/crawl-run --rounds 5 [--resume]

On a cluster only --master changes. Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir", required=True, help="dir with corpus/seeds/robots parquet + blacklist.txt")
    ap.add_argument("--run-dir", required=True, help="state dir (snapshot tables + checkpoints)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--round-limit", type=int, default=None)
    ap.add_argument("--host-budget", type=int, default=None)
    args = ap.parse_args()

    from tor_spider_spark.config import CrawlConfig
    from tor_spider_spark.plans.driver import CrawlDriver
    from tor_spider_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")
    corpus = spark.read.parquet(os.path.join(args.fixture_dir, "corpus"))
    seeds = spark.read.parquet(os.path.join(args.fixture_dir, "seeds"))
    robots = spark.read.parquet(os.path.join(args.fixture_dir, "robots"))
    bl_path = os.path.join(args.fixture_dir, "blacklist.txt")
    blacklist = open(bl_path).read().splitlines() if os.path.exists(bl_path) else []

    kw = {"max_rounds": args.rounds}
    if args.round_limit:
        kw["round_limit"] = args.round_limit
    if args.host_budget:
        kw["default_host_budget"] = args.host_budget
    drv = CrawlDriver(spark, args.run_dir, corpus, seeds, robots, blacklist, CrawlConfig(**kw))
    summary = drv.run(max_rounds=args.rounds, resume=args.resume)
    print(
        json.dumps(
            {
                "rounds_run": summary.rounds_run,
                "scheduled": summary.n_scheduled,
                "admitted": summary.n_admitted,
                "pages": summary.n_pages,
                # proves which cluster actually ran the job (a submitted
                # --master must never be silently overridden by get_spark)
                "master": spark.sparkContext.master,
                # proves a submitted --conf spark.sql.shuffle.partitions
                # wins over get_spark's cluster-derived default
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "round_stats": summary.round_stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
