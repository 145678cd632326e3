"""Seed mini-crawl clearnet traversal (frozen step 0/8; reference
spider/spider.go:344-354): the seed collector follows EVERY link — clearnet
included — to depth SPIDER_DEPTH, enqueueing only onion URLs. An onion host
linked ONLY from clearnet intermediates must therefore be crawled, while
clearnet URLs never enter seen or pages."""

from __future__ import annotations

import dataclasses

from tor_spider_spark.plans.driver import CrawlDriver
from tor_spider_spark.simulator import host_of, simulate


def _hidden_urls_in(fixture):
    return {r["url"] for r in fixture.corpus if r["host"] in fixture.hidden_hosts}


def test_fixture_hidden_hosts_only_linked_from_clearnet(smoke_fixture):
    hidden = set(smoke_fixture.hidden_hosts)
    assert len(hidden) >= 2
    for row in smoke_fixture.corpus:
        if row["host"].endswith(".onion"):
            for href in row["out_links"]:
                for h in hidden:
                    assert h not in href, (row["url"], href)
    # and they ARE linked from clearnet
    linked = {
        h
        for row in smoke_fixture.corpus
        if not row["host"].endswith(".onion")
        for href in row["out_links"]
        for h in hidden
        if h in href
    }
    assert linked == hidden


def test_simulator_reaches_hidden_onion_via_clearnet_hop(smoke_fixture, smoke_sim):
    hidden_urls = _hidden_urls_in(smoke_fixture)
    reached_hosts = {host_of(u) for u in smoke_sim.seen}
    assert set(smoke_fixture.hidden_hosts) <= reached_hosts, (
        set(smoke_fixture.hidden_hosts) - reached_hosts
    )
    assert any(u in smoke_sim.seen for u in hidden_urls)
    # clearnet never enters seen or pages
    for u in smoke_sim.seen:
        assert host_of(u).endswith(".onion"), u
    for p in smoke_sim.pages:
        assert host_of(p["url"]).endswith(".onion"), p["url"]


def test_traversal_window_gates_reachability(smoke_fixture, smoke_cfg):
    """With the traversal window closed (depth 0) the hidden hosts are
    unreachable — proves the clearnet hop is the only path in."""
    cfg0 = dataclasses.replace(smoke_cfg, seed_traversal_depth=0)
    sim0 = simulate(smoke_fixture, cfg0)
    reached = {host_of(u) for u in sim0.seen}
    assert not (set(smoke_fixture.hidden_hosts) & reached)


def test_engine_reaches_hidden_and_stores_no_clearnet(
    spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg, smoke_sim
):
    drv = CrawlDriver(
        spark,
        str(tmp_path / "hidden"),
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
        use_bloom=False,
    )
    drv.run()
    seen_eng = {r["url_hash"]: r["first_round"] for r in drv.read("seen").collect()}
    assert seen_eng == smoke_sim.seen_hashes()  # engine ≡ simulator incl. hidden
    pages_hosts = {r["host"] for r in drv.read("pages").select("host").collect()}
    assert all(h.endswith(".onion") for h in pages_hosts)
    assert set(smoke_fixture.hidden_hosts) & pages_hosts  # hidden pages stored
    # the frontier may hold clearnet rows, but ONLY seed-lineage ones
    for r in drv.read("frontier").select("host", "is_seed").collect():
        if not r["host"].endswith(".onion"):
            assert r["is_seed"], r["host"]
