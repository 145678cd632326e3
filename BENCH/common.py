"""Shared subprocess harness for BENCH/* scripts.

One copy of the fragile contract ("bench.py prints ONE JSON line last,
fresh JVM per leg, PYSPARK_PYTHON pinned so local-cluster executors spawn
the right Python") so the A/B scripts cannot drift on it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_overrides: dict) -> dict:
    """Run bench.py in a FRESH process with *env_overrides* (values are
    str()-ed) on top of the current environment and parse its one-line
    JSON result. The default 8g driver heap is kept — measured 2.7x
    faster than 48g at 32 cores (G1 pause behavior at large heaps)."""
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        **{k: str(v) for k, v in env_overrides.items()},
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        # surface the Spark stack trace: CalledProcessError would discard
        # the captured stderr and a multi-hour A/B run dies blind
        sys.stderr.write(proc.stderr[-8000:])
        raise RuntimeError(
            f"bench.py failed (exit {proc.returncode}) with overrides "
            f"{env_overrides}; last stderr above"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])
