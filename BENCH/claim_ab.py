#!/usr/bin/env python
"""Delta-claim vs legacy-overwrite crawl A/B (VERDICT r3 next #1 cost leg).

Measures the WALL cost of the delta-cost claim path at fixture scale —
the write-BYTES win is delta_claim.py's job; this harness answers "what
does the per-round footer/sidecar bookkeeping cost on the clock". The r4
artifact was a same-JVM interleave measured before the commit-time stats
sidecars landed (every round re-read every parquet footer driver-side);
r5 re-rolls it with the established fresh-subprocess methodology:

- each measurement is a FRESH subprocess JVM running ONLY the crawl leg;
- variants interleave A,B,A,B,... across processes so shared-VM drift
  hits both equally;
- A = engine defaults (cfg.delta_claim=True: claim_merge/upsert_keys,
  write I/O ∝ batch), B = cfg.delta_claim=False (legacy full-overwrite
  claim, write I/O ∝ table).

Writes BENCH/claim_ab.json and prints one JSON line. Run on an otherwise
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
                  app_name="claim-ab")
spark.sparkContext.setLogLevel("ERROR")
res = bench_crawl(spark, cfg_overrides={{"delta_claim": {delta!r}}})
print("RESULT::" + json.dumps(res))
spark.stop()
"""


def run_leg(delta: bool) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, delta=delta)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::") :])
    raise RuntimeError(f"child produced no result:\n{out.stdout}\n{out.stderr}")


def main(passes: int = 3) -> None:
    rows = []
    for p in range(passes):
        a = run_leg(True)
        b = run_leg(False)
        assert a["scheduled"] == b["scheduled"], (a, b)  # identical workload
        rows.append(
            {
                "pass": p,
                "delta_wall_sec": a["wall_sec"],
                "overwrite_wall_sec": b["wall_sec"],
            }
        )
        print(json.dumps(rows[-1]))
    walls_a = [r["delta_wall_sec"] for r in rows]
    walls_b = [r["overwrite_wall_sec"] for r in rows]
    result = {
        "what": (
            "interleaved fresh-JVM crawl A/B: cfg.delta_claim=True "
            "(claim_merge/upsert_keys) vs False (legacy full overwrite), "
            "8 rounds, bench fixture, local[32]"
        ),
        "passes": rows,
        "scheduled_rows_both": a["scheduled"],
        "min_delta_wall_sec": min(walls_a),
        "min_overwrite_wall_sec": min(walls_b),
        "min_ratio": round(min(walls_a) / min(walls_b), 3),
    }
    with open(os.path.join(REPO, "BENCH", "claim_ab.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
