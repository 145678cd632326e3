"""Engine ≡ simulator at the CORRECTNESS fixture scale (FIXTURES.md §knobs:
200 hosts, 3 hubs at 100×, 64px payloads, 6 rounds) — an order of magnitude
more URLs than the smoke fixture, with the bloom probe forced on."""

from __future__ import annotations

import dataclasses

from tor_spider_spark.config import CrawlConfig
from tor_spider_spark.fixtures.corpus import CORRECTNESS, generate_fixture
from tor_spider_spark.plans.driver import CrawlDriver, fixture_to_dfs
from tor_spider_spark.simulator import simulate


def test_engine_matches_simulator_correctness_scale(spark, tmp_path):
    fx = generate_fixture(dataclasses.replace(CORRECTNESS, image_px=32))
    cfg = CrawlConfig(max_rounds=6, bloom_min_seen=0)
    sim = simulate(fx, cfg)
    dfs = fixture_to_dfs(spark, fx)
    drv = CrawlDriver(
        spark, str(tmp_path / "cs"), dfs["corpus"], dfs["seeds"], dfs["robots"], fx.blacklist, cfg
    )
    drv.run()

    sched: dict[int, list[str]] = {}
    for r in drv.read("schedule").orderBy("round", "rank").collect():
        sched.setdefault(r["round"], []).append(r["url"])
    for i, golden in enumerate(sim.schedule):
        assert sched.get(i, []) == golden, f"round {i}"

    seen_eng = {r["url_hash"]: r["first_round"] for r in drv.read("seen").collect()}
    assert seen_eng == sim.seen_hashes()
    assert len(seen_eng) > 100  # meaningfully-sized crawl

    eng = sorted(
        (r["url"], r["round"], r["caption"], r["phash"])
        for r in drv.read("pages").select("url", "round", "caption", "phash").collect()
    )
    gold = sorted((p["url"], p["round"], p["caption"], p["phash"]) for p in sim.pages)
    assert eng == gold
