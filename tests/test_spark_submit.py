"""The north rule's deployment shape, executed for real: `spark-submit
--py-files <pkg.zip>` onto a MULTI-EXECUTOR master (`local-cluster[2,2]`
— two separate executor JVMs whose Python workers can only import the
package from the shipped zip), running scripts/run_crawl.py end-to-end
on a tiny fixture, then the run dir's schedule/seen compared against the
pure-Python simulator.

This also pins the get_spark() submit contract: a session created under
spark-submit must HONOR the submitted --master (it used to rebuild with
the env/default master, silently turning a cluster submit into
local[32]) — the summary's "master" field is asserted verbatim.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from tor_spider_spark.config import CrawlConfig
from tor_spider_spark.fixtures.corpus import FixtureKnobs, generate_fixture
from tor_spider_spark.plans.driver import CrawlDriver, write_fixture
from tor_spider_spark.session import _package_zip
from tor_spider_spark.simulator import simulate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER = "local-cluster[2,2,1536]"
KNOBS = FixtureKnobs(
    n_onion_hosts=6, pages_per_host=2, hub_hosts=1, hub_factor=20,
    image_px=8, n_clearnet_hosts=1, n_hidden_onion_hosts=0, seed=11,
)
ROUNDS = 3


def test_spark_submit_py_files_multi_executor(spark, tmp_path):
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    fx = generate_fixture(KNOBS)
    fixdir, rundir = str(tmp_path / "fixture"), str(tmp_path / "run")
    write_fixture(spark, fx, fixdir)

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("SPARK_MASTER", None)  # the submitted --master must win
    out = subprocess.run(
        [
            submit,
            "--master", MASTER,
            "--conf", "spark.executor.memory=1g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", _package_zip(),
            os.path.join(REPO, "scripts", "run_crawl.py"),
            "--fixture-dir", fixdir,
            "--run-dir", rundir,
            "--rounds", str(ROUNDS),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=900,
    )
    summaries = [
        json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")
    ]
    assert summaries, f"no summary line:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    summary = summaries[-1]
    assert summary["master"] == MASTER, summary
    assert summary["rounds_run"] == ROUNDS

    # the submitted run's tables vs the golden simulator, read back via
    # the test session (same on-disk layout, checkpoint-pinned versions)
    cfg = CrawlConfig(max_rounds=ROUNDS)
    sim = simulate(fx, cfg)
    assert summary["scheduled"] == sum(len(r) for r in sim.schedule)
    reader = CrawlDriver(
        spark, rundir,
        spark.read.parquet(os.path.join(fixdir, "corpus")),
        spark.read.parquet(os.path.join(fixdir, "seeds")),
        spark.read.parquet(os.path.join(fixdir, "robots")),
        fx.blacklist, cfg,
    )
    sched: dict[int, list[str]] = {}
    for r in reader.read("schedule").orderBy("round", "rank").collect():
        sched.setdefault(r["round"], []).append(r["url"])
    assert len(sched) == len(sim.schedule)
    for i, golden in enumerate(sim.schedule):
        assert sched[i] == golden, f"round {i}"
    seen = {r["url_hash"]: r["first_round"] for r in reader.read("seen").collect()}
    assert seen == sim.seen_hashes()
