#!/usr/bin/env python
"""Like-for-like crawl workload A/B (VERDICT r2 #1).

BENCH_r02 recorded the crawl leg at 73.2 s where r1 measured 39.6 s; the
r2 workload is heavier by design (clearnet seed traversal), but the delta
exceeded what +10% scheduled rows explains. This harness separates
WORKLOAD from REGRESSION with the established methodology:

- each measurement is a FRESH subprocess JVM running ONLY the crawl leg
  (the in-sequence BENCH run executes it after a 40M-row bloom_scale leg
  whose heap residue was measured to slow later legs 15-25%);
- variants interleave A,B,A,B,... across processes so shared-VM drift
  hits both equally;
- A = r2 engine with seed_traversal_depth=0 (the r1 workload shape: no
  clearnet traversal), B = r2 engine defaults (traversal depth 3).

Writes BENCH/crawl_ab.json and prints one JSON line. Run on an otherwise
idle box — never concurrently with tests.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
from tor_spider_spark.session import get_spark
from bench import bench_crawl
spark = get_spark("local[" + os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
                  app_name="crawl-ab")
spark.sparkContext.setLogLevel("ERROR")
res = bench_crawl(spark)
print("RESULT::" + json.dumps(res))
spark.stop()
"""


def run_leg(traversal: int | None) -> dict:
    env = dict(os.environ)
    if traversal is not None:
        env["SPARK_GRAFT_CRAWL_TRAVERSAL"] = str(traversal)
    else:
        env.pop("SPARK_GRAFT_CRAWL_TRAVERSAL", None)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO)],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::") :])
    raise RuntimeError(f"no result (rc={out.returncode}):\n{out.stderr[-2000:]}")


def main() -> None:
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))
    legs = {"A_traversal0": 0, "B_default": None}
    walls: dict[str, list] = {k: [] for k in legs}
    stats: dict[str, dict] = {}
    for p in range(passes):
        for name, tr in legs.items():
            r = run_leg(tr)
            walls[name].append(r["wall_sec"])
            stats[name] = r  # keep last full stats (deterministic workload)
            print(f"pass {p} {name}: {r['wall_sec']}s scheduled={r['scheduled']}", file=sys.stderr)
    result = {
        "passes": passes,
        "legs": {
            name: {
                "walls": walls[name],
                "min_wall_sec": min(walls[name]),
                "median_wall_sec": sorted(walls[name])[len(walls[name]) // 2],
                "scheduled": stats[name]["scheduled"],
                "pages": stats[name]["pages"],
                "rounds": stats[name]["rounds"],
            }
            for name in legs
        },
    }
    a, b = result["legs"]["A_traversal0"], result["legs"]["B_default"]
    result["workload_ratio_scheduled"] = round(b["scheduled"] / a["scheduled"], 3)
    result["wall_ratio_min"] = round(b["min_wall_sec"] / a["min_wall_sec"], 3)
    with open(os.path.join(REPO, "BENCH", "crawl_ab.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
