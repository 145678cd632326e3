"""The north rule's deployment shape, executed for real: `spark-submit
--py-files <pkg.zip>` onto a MULTI-EXECUTOR master (`local-cluster[2,2]`
— two separate executor JVMs whose Python workers can only import the
package from the shipped zip), running scripts/run_crawl.py end-to-end
on a tiny fixture, then the run dir's schedule/seen compared against the
pure-Python simulator. A SECOND submit resumes the same run dir from its
checkpoint and must continue exactly where the first left off — the
operational restart story (new driver process, new executor JVMs, state
only in the tables) in the exact shape a cluster restart takes.

This also pins the get_spark() submit contract: a session created under
spark-submit must HONOR the submitted --master (it used to rebuild with
the env/default master, silently turning a cluster submit into
local[32]) — the summary's "master" field is asserted verbatim. It was
this test that exposed the Observation double-count (summary counters
inflating under multi-JVM cache races while the stored tables stayed
correct), hence the summary-vs-simulator count assertions.
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

    def run_submit(rounds: int, extra_conf: list[str] = ()) -> dict:
        out = subprocess.run(
            [
                submit,
                "--master", MASTER,
                "--conf", "spark.executor.memory=1g",
                "--conf", "spark.ui.enabled=false",
                *extra_conf,
                "--py-files", _package_zip(),
                os.path.join(REPO, "scripts", "run_crawl.py"),
                "--fixture-dir", fixdir,
                "--run-dir", rundir,
                "--rounds", str(rounds),
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
        return summaries[-1]

    summary = run_submit(ROUNDS)
    assert summary["master"] == MASTER, summary
    assert summary["rounds_run"] == ROUNDS
    # no submitted shuffle conf → get_spark derives from the cluster
    # (max(8, 3*defaultParallelism); the exact value races executor
    # registration, so assert the derivation ran, not its input): the
    # session must NOT sit on Spark's static default of 200
    assert int(summary["shuffle_partitions"]) >= 8, summary
    assert summary["shuffle_partitions"] != "200", summary

    cfg = CrawlConfig(max_rounds=ROUNDS + 2)
    sim = simulate(fx, cfg)

    # the submitted run's summary counters vs the simulator: these come
    # off the committed appends' sidecar row counts, and THIS assertion is
    # what caught the Observation double-count under multi-JVM masters
    golden_first = sum(len(r) for r in sim.schedule[:ROUNDS])
    assert summary["scheduled"] == golden_first, summary

    # second submit: fresh driver + fresh executor JVMs resume the run dir
    # from its checkpoint and crawl two more rounds; an EXPLICIT submitted
    # shuffle conf must win over get_spark's cluster-derived default (the
    # honor-the-submit-conf contract, same as --master)
    summary2 = run_submit(
        ROUNDS + 2, extra_conf=["--conf", "spark.sql.shuffle.partitions=7"]
    )
    assert summary2["shuffle_partitions"] == "7", summary2
    assert summary2["rounds_run"] == 2, summary2
    assert summary2["scheduled"] == sum(
        len(r) for r in sim.schedule[ROUNDS:]
    ), summary2

    # the resumed run's tables vs the golden simulator, read back via
    # the test session (same on-disk layout, checkpoint-pinned versions)
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
