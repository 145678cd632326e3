#!/usr/bin/env python
"""Multi-JVM bloom-probe A/B (VERDICT r4 next #1).

The r4 core bench showed the broadcast bitset probe HALVING bloom-path
throughput at ``local-cluster[4,8]`` while the exact anti-join improved —
the per-round driver collect + broadcast crosses real JVM boundaries
exactly where a real cluster lives. This harness measures the engaged
regime (seen >= bloom_min_seen) at one and four executor JVMs:

  exact anti-join  vs  broadcast probe  vs  partition-aligned probe

via ``bench.py SPARK_GRAFT_BENCH_MODE=bloom-only`` (fresh JVM per leg,
interleaved passes — the only valid comparison on this shared VM).
Writes BENCH/bloom_lc_ab.json; the dispatch policy in
operators/bloom.py:probe() encodes the result.

Run:  python BENCH/bloom_lc_ab.py [n_seen] [n_passes]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import REPO, run_bench  # noqa: E402

LEVELS = {
    "lc-1x8": "local-cluster[1,8,8192]",
    "lc-4x8": "local-cluster[4,8,8192]",
}


def run_leg(master: str, n_seen: int) -> dict:
    return run_bench(
        {
            "SPARK_GRAFT_BENCH_MODE": "bloom-only",
            "SPARK_GRAFT_BLOOM_SEEN": n_seen,
            "SPARK_GRAFT_MASTER": master,
        }
    )["bloom_scale"]


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # EVERY pass is recorded (selecting a "best" pass by any one path's
    # throughput would sample the other paths from that path's favorable
    # VM windows — a biased comparison); per-pass speedups are
    # within-JVM, so each pass is an internally consistent A/B even when
    # the shared-VM grant moves between passes.
    passes: dict[str, list[dict]] = {name: [] for name in LEVELS}
    for _ in range(n_passes):
        for name, master in LEVELS.items():
            passes[name].append(run_leg(master, n_seen))
    summary = {
        name: {
            "bloom_speedup_per_pass": [p["bloom_speedup"] for p in runs],
            "bloom_part_speedup_per_pass": [p["bloom_part_speedup"] for p in runs],
        }
        for name, runs in passes.items()
    }
    out = {
        "n_seen": n_seen,
        "passes": n_passes,
        "legs": passes,
        "speedups": summary,
        "note": (
            "all interleaved fresh-JVM passes recorded; speedups are vs the "
            "exact anti-join of the SAME pass (same JVM, same VM window); "
            "timing is per-round (probe build inside the clock)"
        ),
    }
    with open(os.path.join(REPO, "BENCH", "bloom_lc_ab.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
