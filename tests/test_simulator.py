"""Structural properties of the golden simulator — these pin the frozen
semantics (tor_spider_spark/config.py) independently of the engine."""

from __future__ import annotations

from tor_spider_spark.simulator import host_of


def test_rounds_and_growth(smoke_sim):
    assert smoke_sim.rounds_run == 6
    assert len(smoke_sim.seen) > 0
    assert len(smoke_sim.pages) > 0


def test_blacklisted_host_never_seen(smoke_fixture, smoke_sim):
    bl_host = smoke_fixture.robots and smoke_fixture.blacklist[0]
    label = bl_host.strip(".*")
    for url in smoke_sim.seen:
        assert label not in url


def test_robots_disallow_respected(smoke_fixture, smoke_sim):
    disallowed_host = smoke_fixture.robots[0]["host"]
    for url in smoke_sim.seen:
        if host_of(url) == disallowed_host:
            assert "/private" not in url


def test_host_budget_respected(smoke_fixture, smoke_sim, smoke_cfg):
    budgets = {
        r["host"]: r["max_per_round"]
        for r in smoke_fixture.robots
        if r.get("max_per_round") is not None
    }
    for rnd_urls in smoke_sim.schedule:
        per_host: dict[str, int] = {}
        for u in rnd_urls:
            h = host_of(u)
            per_host[h] = per_host.get(h, 0) + 1
        for h, n in per_host.items():
            cap = budgets.get(h, smoke_cfg.default_host_budget)
            assert n <= cap, (h, n, cap)


def test_crawl_delay_spacing(smoke_fixture, smoke_sim):
    delay_hosts = {
        r["host"]: r["crawl_delay_ms"] // 1000
        for r in smoke_fixture.robots
        if r["crawl_delay_ms"] > 0
    }
    for host, delay in delay_hosts.items():
        rounds = [
            i for i, urls in enumerate(smoke_sim.schedule) if any(host_of(u) == host for u in urls)
        ]
        for a, b in zip(rounds, rounds[1:]):
            assert b - a > delay, (host, rounds)


def test_seen_first_round_monotone_vs_schedule(smoke_sim):
    # a url's first_round must be the round it first appears in the schedule
    first_sched: dict[str, int] = {}
    for i, urls in enumerate(smoke_sim.schedule):
        for u in urls:
            first_sched.setdefault(u, i)
    for u, r in smoke_sim.seen.items():
        assert first_sched[u] == r, u


def test_no_admitted_url_scheduled_twice_except_seeds(smoke_fixture, smoke_sim):
    # Dedup-on-attempt only covers ADMITTED urls: filter-rejected ones
    # (blacklist/robots) are never marked visited and may be re-discovered
    # and re-scheduled — exactly the reference's behavior (SaveJob has no
    # blacklist check, dedup happens at visit time; spider/spider.go:301).
    seeds = {s["url"] for s in smoke_fixture.seeds}
    counts: dict[str, int] = {}
    for urls in smoke_sim.schedule:
        for u in urls:
            counts[u] = counts.get(u, 0) + 1
    rescheduled = {u: n for u, n in counts.items() if n > 1 and u not in seeds}
    # every rescheduled url must be one that was never admitted
    for u in rescheduled:
        assert u not in smoke_sim.seen, (u, rescheduled[u])
    # and every admitted (seen) non-seed url is scheduled exactly once
    for u in smoke_sim.seen:
        if u not in seeds:
            assert counts[u] == 1, (u, counts[u])


def test_deterministic_replay(smoke_fixture, smoke_cfg, smoke_sim):
    from tor_spider_spark.simulator import simulate

    again = simulate(smoke_fixture, smoke_cfg)
    assert again.schedule == smoke_sim.schedule
    assert again.seen == smoke_sim.seen
