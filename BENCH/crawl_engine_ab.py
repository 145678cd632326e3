#!/usr/bin/env python
"""Engine-version crawl A/B: the r1 engine (git worktree at the round-1
commit) vs the CURRENT engine, interleaved fresh-JVM passes.

Why this exists (VERDICT r2 #1): BENCH_r01 recorded the crawl leg at
39.6 s and BENCH_r02 at 73.2 s, but the r1 artifact was measured in a VM
window whose core-bench throughput was ~2× today's — wall numbers from
different hours on this shared box are not comparable. Interleaving the
two ENGINES within the same minutes is the only like-for-like test:
whatever ratio survives interleaving is real engine regression; the rest
is VM drift.

Usage: python BENCH/crawl_engine_ab.py /tmp/r1-engine
(each leg runs `bench_crawl` from its OWN checkout, with its own fixture
generator and engine code — i.e. each round's exact bench conditions)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys
sys.path.insert(0, {root!r})
os.chdir({root!r})
from tor_spider_spark.session import get_spark
from bench import bench_crawl
spark = get_spark("local[" + os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
                  app_name="crawl-engine-ab")
spark.sparkContext.setLogLevel("ERROR")
res = bench_crawl(spark)
print("RESULT::" + json.dumps(res))
spark.stop()
"""


def run_leg(root: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(root=root)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::") :])
    raise RuntimeError(f"no result (rc={out.returncode}):\n{out.stderr[-2000:]}")


def main() -> None:
    r1_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r1-engine"
    # each comparison gets its OWN artifact: the default clobbered the
    # historical r1-vs-r3 file when the r4-vs-r5 comparison reused the
    # harness (restored from git; see BENCH/crawl_engine_ab_r4r5.json)
    out_name = sys.argv[2] if len(sys.argv) > 2 else "crawl_engine_ab.json"
    # baseline leg LABEL as a third arg (ADVICE r5 #2): the shipped
    # crawl_engine_ab_r4r5.json keys its baseline leg "r4_engine", which a
    # rerun with the hardcoded "r1_engine" label could not reproduce (and
    # scaling.py reads eng45['legs']['r4_engine'] by that name)
    base_label = sys.argv[3] if len(sys.argv) > 3 else "r1_engine"
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))
    legs = {base_label: r1_root, "current": REPO}
    walls: dict[str, list] = {k: [] for k in legs}
    stats: dict[str, dict] = {}
    for p in range(passes):
        for name, root in legs.items():
            r = run_leg(root)
            walls[name].append(r["wall_sec"])
            stats[name] = r
            print(f"pass {p} {name}: {r['wall_sec']}s scheduled={r['scheduled']}", file=sys.stderr)
    result = {
        "passes": passes,
        "legs": {
            name: {
                "walls": walls[name],
                "min_wall_sec": min(walls[name]),
                "median_wall_sec": sorted(walls[name])[len(walls[name]) // 2],
                "scheduled": stats[name]["scheduled"],
                "rounds": stats[name]["rounds"],
            }
            for name in legs
        },
    }
    result["engine_wall_ratio_min"] = round(
        result["legs"]["current"]["min_wall_sec"] / result["legs"]["r1_engine"]["min_wall_sec"], 3
    )
    with open(os.path.join(REPO, "BENCH", out_name), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
