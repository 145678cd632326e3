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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVELS = {
    "lc-1x8": "local-cluster[1,8,8192]",
    "lc-4x8": "local-cluster[4,8,8192]",
}


def run_leg(master: str, n_seen: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_MODE="bloom-only",
        SPARK_GRAFT_BLOOM_SEEN=str(n_seen),
        SPARK_GRAFT_MASTER=master,
        PYSPARK_PYTHON=sys.executable,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)["bloom_scale"]


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    best: dict[str, dict] = {}
    # interleave levels across passes: both sample the same VM windows
    for _ in range(n_passes):
        for name, master in LEVELS.items():
            r = run_leg(master, n_seen)
            if (
                name not in best
                or r["exact_urls_per_sec"] > best[name]["exact_urls_per_sec"]
            ):
                best[name] = r
    out = {
        "n_seen": n_seen,
        "passes": n_passes,
        "legs": best,
        "note": (
            "per-level best over interleaved fresh-JVM passes; speedups are "
            "vs the exact anti-join at the SAME topology"
        ),
    }
    with open(os.path.join(REPO, "BENCH", "bloom_lc_ab.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
