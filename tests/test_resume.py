"""Deterministic checkpoint/resume (north rule; SURVEY §5.2.5): kill after
round j, resume with a FRESH driver, final tables byte-identical to the
uninterrupted run."""

from __future__ import annotations

from tor_spider_spark.plans.driver import CrawlDriver

_TABLES = {
    "seen": ["url_hash", "first_round"],
    "schedule": ["round", "rank", "url"],
    "pages": ["url", "round", "image_id", "caption", "phash"],
}


def test_resume_reproduces_full_run(spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg):
    args = (
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    full = CrawlDriver(spark, str(tmp_path / "full"), *args)
    full.run(max_rounds=6)

    part = CrawlDriver(spark, str(tmp_path / "part"), *args)
    part.run(max_rounds=3)  # "killed" here — driver state discarded
    resumed = CrawlDriver(spark, str(tmp_path / "part"), *args)  # fresh process analog
    resumed.run(max_rounds=6, resume=True)

    for tbl, cols in _TABLES.items():
        a = sorted(map(tuple, full.read(tbl).select(*cols).collect()))
        b = sorted(map(tuple, resumed.read(tbl).select(*cols).collect()))
        assert a == b, tbl


def test_resume_after_mid_round_kill(spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg):
    """Kill INSIDE a round: some table versions were written but the
    checkpoint never committed. Resume must ignore those orphan versions
    entirely — re-running the round must not duplicate their rows."""
    args = (
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    full = CrawlDriver(spark, str(tmp_path / "full"), *args)
    full.run(max_rounds=6)

    part = CrawlDriver(spark, str(tmp_path / "part"), *args)
    part.run(max_rounds=3)
    # torn round 3: seen/pages/schedule appends landed, checkpoint did not
    pinned = part.log.last()["versions"]
    torn_seen = part.tables["seen"].read(spark, pinned["seen"]).limit(5)
    part.tables["seen"].append(torn_seen, parent=pinned["seen"])
    torn_pages = part.tables["pages"].read(spark, pinned["pages"]).limit(3)
    part.tables["pages"].append(torn_pages, parent=pinned["pages"])
    part.tables["frontier"].overwrite(
        part.tables["frontier"].read(spark, pinned["frontier"]).limit(1)
    )

    resumed = CrawlDriver(spark, str(tmp_path / "part"), *args)
    resumed.run(max_rounds=6, resume=True)
    for tbl, cols in _TABLES.items():
        a = sorted(map(tuple, full.read(tbl).select(*cols).collect()))
        b = sorted(map(tuple, resumed.read(tbl).select(*cols).collect()))
        assert a == b, tbl


def test_rerun_is_idempotent_noop(spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg):
    args = (
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    drv = CrawlDriver(spark, str(tmp_path / "r"), *args)
    drv.run(max_rounds=4)
    before = sorted(map(tuple, drv.read("seen").collect()))
    again = CrawlDriver(spark, str(tmp_path / "r"), *args)
    again.run(max_rounds=4, resume=True)  # already at round 4 → no new work
    after = sorted(map(tuple, again.read("seen").collect()))
    assert before == after


def test_resume_with_vacuum(spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg):
    """Vacuum on the maintenance rotation (r4): storage actually shrinks
    (superseded frontier versions deleted from disk) while every judged
    output AND a fresh-driver resume stay byte-identical — the newest
    checkpoint's pins are always within the retained window."""
    import dataclasses
    import os

    args_plain = (
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    cfg_v = dataclasses.replace(smoke_cfg, compact_every=2, vacuum_keep_versions=2)
    args_v = args_plain[:-1] + (cfg_v,)

    plain = CrawlDriver(spark, str(tmp_path / "p"), *args_plain)
    plain.run(max_rounds=6)
    vac = CrawlDriver(spark, str(tmp_path / "v"), *args_v)
    vac.run(max_rounds=3)
    vac2 = CrawlDriver(spark, str(tmp_path / "v"), *args_v)  # fresh-driver resume
    vac2.run(max_rounds=6, resume=True)

    for tbl, cols in _TABLES.items():
        a = sorted(map(tuple, plain.read(tbl).select(*cols).collect()))
        b = sorted(map(tuple, vac2.read(tbl).select(*cols).collect()))
        assert a == b, tbl
    # vacuum really expired old versions: the frontier keeps only the
    # retained manifest window (plain run keeps one per round + epsilon)
    n_manifests = lambda d, t: len(  # noqa: E731
        os.listdir(os.path.join(str(d), t, "manifests"))
    )
    assert n_manifests(tmp_path / "v", "frontier") < n_manifests(tmp_path / "p", "frontier")


def test_resume_with_compaction(spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg):
    """Compaction must not change any judged output nor break resume."""
    import dataclasses

    args_plain = (
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    cfg_c = dataclasses.replace(smoke_cfg, compact_every=2)
    args_c = args_plain[:-1] + (cfg_c,)

    plain = CrawlDriver(spark, str(tmp_path / "p"), *args_plain)
    plain.run(max_rounds=6)
    comp = CrawlDriver(spark, str(tmp_path / "c"), *args_c)
    comp.run(max_rounds=3)
    comp2 = CrawlDriver(spark, str(tmp_path / "c"), *args_c)
    comp2.run(max_rounds=6, resume=True)

    for tbl, cols in _TABLES.items():
        a = sorted(map(tuple, plain.read(tbl).select(*cols).collect()))
        b = sorted(map(tuple, comp2.read(tbl).select(*cols).collect()))
        assert a == b, tbl
