#!/usr/bin/env python
"""Distribution of the 1→4-executor-JVM scaling pair (the north rule's
weakest row on this box).

Single full rolls measured the normalized executor pair anywhere from
0.92 (2026-08-17 shipped roll) to 0.56 (2026-08-18 re-roll) — the
lc-4x8 leg splits 4×8 GB heaps out of one shared VM and is the most
window-sensitive number in the whole suite. One point per roll cannot
say whether the truth is 0.9 or 0.6, so this tool measures the PAIR
repeatedly in tight interleave: for each window it runs
calibrate(lc-1x8) → calibrate(lc-4x8) → engine(lc-1x8) →
engine(lc-4x8) back-to-back (coherence by construction: all four legs
inside one ~5-minute window), and reports per-window raw efficiency,
ceiling, and normalized efficiency plus the median across windows.

Writes BENCH/lc_pair_roll.json. Run:
    python BENCH/lc_pair_roll.py [windows] [core_rows]
"""

from __future__ import annotations

import json
import statistics
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import REPO, run_bench  # noqa: E402

MASTERS = {"lc-1x8": "local-cluster[1,8,8192]", "lc-4x8": "local-cluster[4,8,8192]"}


def _run(master: str, rows: int, mode: str) -> dict:
    return run_bench(
        {
            "SPARK_GRAFT_BENCH_MODE": mode,
            "SPARK_GRAFT_CORE_ROWS": rows,
            "SPARK_GRAFT_MASTER": master,
        }
    )


def main() -> None:
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    out: list[dict] = []
    for w in range(windows):
        cal1 = _run(MASTERS["lc-1x8"], rows, "calibrate")["calibration"]["rows_per_sec"]
        cal4 = _run(MASTERS["lc-4x8"], rows, "calibrate")["calibration"]["rows_per_sec"]
        eng1 = _run(MASTERS["lc-1x8"], rows, "core-only")["core"]["urls_per_sec"]
        eng4 = _run(MASTERS["lc-4x8"], rows, "core-only")["core"]["urls_per_sec"]
        rec = {
            "window": w,
            "calib_lc1": cal1,
            "calib_lc4": cal4,
            "engine_lc1": eng1,
            "engine_lc4": eng4,
            "eff_engine": round((eng4 / eng1) / 4, 3),
            "eff_ceiling": round((cal4 / cal1) / 4, 3),
        }
        rec["eff_normalized"] = round(rec["eff_engine"] / rec["eff_ceiling"], 3)
        out.append(rec)
        print(json.dumps(rec), file=sys.stderr)
    norm = sorted(r["eff_normalized"] for r in out)
    result = {
        "what": (
            "1->4 executor-JVM scaling pair measured repeatedly in tight "
            "interleave (calibration + engine legs of BOTH levels inside "
            "each window); normalized = engine efficiency / pure-CPU "
            "ceiling of the same window"
        ),
        "core_rows": rows,
        "windows": out,
        "normalized_median": round(statistics.median(norm), 3),
        "normalized_min": norm[0],
        "normalized_max": norm[-1],
    }
    with open(os.path.join(REPO, "BENCH", "lc_pair_roll.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
