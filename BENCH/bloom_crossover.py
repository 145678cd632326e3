#!/usr/bin/env python
"""r6 (VERDICT r5 next #1): locate the exact-vs-bloom crossover under the
CORRECTED per-round timing (probe build + apply + release inside the
clock — the r5 methodology fix), and re-derive `bloom_min_seen` from it.

Drives the FROZEN bench.py in bloom-only mode (fresh JVM per leg, the
crawl_ab methodology) at a ladder of seen sizes, interleaving passes so
VM drift hits every size equally.  Each leg already reports min-of-3
with warmup; we keep per-pass values and the best-of-passes speedups.

Writes BENCH/bloom_crossover_r06.json:
    {"sizes": [...], "passes": N,
     "legs": {"<n_seen>": {"bloom_speedup": [...], "bloom_part_speedup":
              [...], "exact_wall": [...], "bloom_wall": [...],
              "calib_mrows": [...]}},
     "crossover_seen": <first size with best bloom_speedup >= 1.0>}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = [10_000_000, 20_000_000, 40_000_000, 80_000_000]
PASSES = 2


def run_leg(n_seen: int) -> dict | None:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_MODE"] = "bloom-only"
    env["SPARK_GRAFT_BLOOM_SEEN"] = str(n_seen)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print(f"leg {n_seen} produced no JSON; rc={out.returncode}", file=sys.stderr)
    print(out.stderr[-2000:], file=sys.stderr)
    return None


def main() -> None:
    legs: dict[str, dict] = {
        str(s): {
            "bloom_speedup": [],
            "bloom_part_speedup": [],
            "exact_wall": [],
            "bloom_wall": [],
            "bloom_part_wall": [],
            "calib_mrows": [],
        }
        for s in SIZES
    }
    for p in range(PASSES):
        for s in SIZES:
            r = run_leg(s)
            if r is None:
                continue
            bs = r["bloom_scale"]
            leg = legs[str(s)]
            leg["bloom_speedup"].append(bs["bloom_speedup"])
            leg["bloom_part_speedup"].append(bs["bloom_part_speedup"])
            leg["exact_wall"].append(bs["exact_wall_sec"])
            leg["bloom_wall"].append(bs["bloom_wall_sec"])
            leg["bloom_part_wall"].append(bs["bloom_part_wall_sec"])
            leg["calib_mrows"].append(round(r["calibration"]["rows_per_sec"] / 1e6, 1))
            print(
                f"pass {p} seen={s}: bloom {bs['bloom_speedup']}x "
                f"part {bs['bloom_part_speedup']}x "
                f"(exact {bs['exact_wall_sec']}s)",
                flush=True,
            )
    crossover = None
    for s in SIZES:
        sp = legs[str(s)]["bloom_speedup"]
        if sp and max(sp) >= 1.0:
            crossover = s
            break
    result = {
        "sizes": SIZES,
        "passes": PASSES,
        "timing": "per-round (probe build + apply + release inside the clock)",
        "legs": legs,
        "crossover_seen": crossover,
    }
    out_path = os.path.join(REPO, "BENCH", "bloom_crossover_r06.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
