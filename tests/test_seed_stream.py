"""Streaming seed ingestion (S1/S2): files dropped into the seed dropbox
land in the seed inbox AND are drained by the next crawl rounds with full
seed semantics — the end-to-end path the reference serves via
/seed and /periodic (spider/spider.go:232-292)."""

from __future__ import annotations

import json

from tor_spider_spark import schemas
from tor_spider_spark.plans.driver import CrawlDriver
from tor_spider_spark.sources.tables import SnapshotTable
from tor_spider_spark.streaming.seed_stream import ingest_seed_dropbox

_ONESHOT = "http://" + "b" * 16 + ".onion/streamed0"
_PERIODIC = "http://" + "c" * 16 + ".onion/streamed1"


def test_dropbox_seeds_reach_inbox(spark, tmp_path):
    dropbox = tmp_path / "dropbox"
    dropbox.mkdir()
    inbox = SnapshotTable(str(tmp_path / "tables"), "seed_inbox", schemas.SEED_INBOX)
    with open(dropbox / "seeds1.json", "w") as fh:
        fh.write(json.dumps({"url": _ONESHOT, "recrawl_every": 0}) + "\n")
        fh.write(json.dumps({"url": _PERIODIC, "recrawl_every": 2}) + "\n")
    q = ingest_seed_dropbox(spark, str(dropbox), inbox, checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(60)
    rows = {r["url"]: r["recrawl_every"] for r in inbox.read(spark).collect()}
    assert rows == {_ONESHOT: 0, _PERIODIC: 2}

    # second drop with the same stream checkpoint: append, no reprocess
    with open(dropbox / "seeds2.json", "w") as fh:
        fh.write(json.dumps({"url": _ONESHOT + "x", "recrawl_every": 0}) + "\n")
    q2 = ingest_seed_dropbox(spark, str(dropbox), inbox, checkpoint_dir=str(tmp_path / "ck"))
    q2.awaitTermination(60)
    assert inbox.read(spark).count() == 3


def test_streamed_seeds_are_crawled(
    spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg
):
    """Regression for the round-1 dead-data bug: appended seed rows were
    never consumed by the round loop. Now: crawl 2 rounds, stream 2 seeds
    in, resume — both get scheduled; the periodic one recurs."""
    args = (
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    run_dir = str(tmp_path / "run")
    drv = CrawlDriver(spark, run_dir, *args, use_bloom=False)
    drv.run(max_rounds=2)

    dropbox = tmp_path / "dropbox"
    dropbox.mkdir()
    with open(dropbox / "seeds.json", "w") as fh:
        fh.write(json.dumps({"url": _ONESHOT, "recrawl_every": 0}) + "\n")
        fh.write(json.dumps({"url": _PERIODIC, "recrawl_every": 1}) + "\n")
    q = ingest_seed_dropbox(
        spark, str(dropbox), drv.tables["seed_inbox"], checkpoint_dir=str(tmp_path / "ck")
    )
    q.awaitTermination(60)

    resumed = CrawlDriver(spark, run_dir, *args, use_bloom=False)
    resumed.run(max_rounds=5, resume=True)

    sched_rounds: dict[str, list[int]] = {}
    for r in resumed.read("schedule").select("url", "round").collect():
        sched_rounds.setdefault(r["url"], []).append(r["round"])
    # one-shot seed: scheduled exactly once, at the drain round
    assert sched_rounds.get(_ONESHOT) == [2]
    # periodic (every round): rescheduled each round after injection
    assert sorted(sched_rounds.get(_PERIODIC, [])) == [2, 3, 4]
    # both were admitted → marked seen (onion urls)
    from tor_spider_spark.functions.hashing import url_hash

    seen = {r["url_hash"] for r in resumed.read("seen").collect()}
    assert url_hash(_ONESHOT) in seen and url_hash(_PERIODIC) in seen
    # consumed version recorded in the checkpoint
    assert resumed.log.last()["versions"]["seed_inbox"] >= 1
