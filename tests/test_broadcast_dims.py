"""Host-dimension broadcast dispatch (r3): robots/host_state joins
broadcast only while the driver's metadata row counts say they fit;
above `broadcast_dim_max_rows` the same joins run as shuffle joins.
Both regimes must produce IDENTICAL crawl results — the dispatch is
purely physical."""

from __future__ import annotations

import dataclasses

from tor_spider_spark.plans.driver import CrawlDriver


def test_shuffle_join_regime_equals_broadcast_regime(
    spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg, smoke_sim
):
    # force the big-dims path: threshold 0 ⇒ every round uses shuffle joins
    cfg0 = dataclasses.replace(smoke_cfg, broadcast_dim_max_rows=0)
    drv = CrawlDriver(
        spark,
        str(tmp_path / "nobc"),
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        cfg0,
        use_bloom=False,
    )
    drv.run()
    seen_eng = {r["url_hash"]: r["first_round"] for r in drv.read("seen").collect()}
    assert seen_eng == smoke_sim.seen_hashes()
    sched = drv.read("schedule").orderBy("round", "rank").collect()
    got_rounds: dict[int, list[str]] = {}
    for r in sched:
        got_rounds.setdefault(r["round"], []).append(r["url"])
    assert got_rounds == {i: u for i, u in enumerate(smoke_sim.schedule)}
