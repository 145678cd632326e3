"""Frozen deviation fence (VERDICT r2 #5 / config.py step 0): an onion hop
discovered INSIDE the seed traversal window re-enters via the frontier as
a normal job, so its clearnet GRANDCHILDREN are never traversed. The
reference's inline mini-crawl (spider/spider.go:344-354 — e.Request.Visit
on every link to MaxDepth regardless of scheme) WOULD follow them.

This fixture builds the exact chain clearnet→onion→clearnet→onion and
pins down, for both the simulator AND the engine (they must agree):

- the first onion hop IS crawled (via the clearnet seed hop);
- the deep onion host behind the second clearnet hop is NOT (the
  flattening) — the documented divergence, frozen here so any future
  semantic change trips a test instead of drifting silently.

README §semantics records this as a deliberate deviation."""

from __future__ import annotations

from tor_spider_spark.config import CrawlConfig
from tor_spider_spark.fixtures.corpus import Fixture, FixtureKnobs
from tor_spider_spark.plans.driver import CrawlDriver, fixture_to_dfs
from tor_spider_spark.simulator import simulate

O1 = "a2" * 8 + ".onion"  # onion reached through the clearnet seed
O2 = "b3" * 8 + ".onion"  # onion behind onion→clearnet→onion — unreachable
C0 = "seed-clear.example.com"
C1 = "mid-clear.example.org"


def _row(url, host, links):
    return {
        "url": url,
        "host": host,
        "status": 200,
        "out_links": links,
        "image_id": None,
        "bytes": None,
        "w": None,
        "h": None,
        "fmt": None,
        "caption": None,
        "phash": None,
    }


def _fixture() -> Fixture:
    corpus = [
        _row(f"https://{C0}/p0", C0, [f"http://{O1}/p0"]),
        _row(f"http://{O1}/p0", O1, [f"https://{C1}/p0"]),
        _row(f"https://{C1}/p0", C1, [f"http://{O2}/p0"]),
        _row(f"http://{O2}/p0", O2, []),
    ]
    seeds = [{"url": f"https://{C0}/p0", "is_seed": True, "recrawl_every": 0}]
    return Fixture(
        corpus=corpus,
        seeds=seeds,
        blacklist=[],
        robots=[],
        knobs=FixtureKnobs(with_images=False),
        hidden_hosts=[O1],
    )


def test_engine_and_simulator_agree_on_the_flattening(spark, tmp_path):
    fx = _fixture()
    cfg = CrawlConfig(max_rounds=6, seed_traversal_depth=3)
    sim = simulate(fx, cfg)

    sim_hosts = {u.split("/")[2] for u in sim.seen}
    assert O1 in sim_hosts, "first onion hop must be crawled via the clearnet seed"
    assert O2 not in sim_hosts, (
        "simulator followed onion→clearnet inside the window — the documented "
        "flattening (config.py step 0) changed; update README + this fence"
    )

    dfs = fixture_to_dfs(spark, fx)
    drv = CrawlDriver(
        spark,
        str(tmp_path / "fence"),
        dfs["corpus"],
        dfs["seeds"],
        dfs["robots"],
        fx.blacklist,
        cfg,
        use_bloom=False,
    )
    drv.run()
    seen_eng = {r["url_hash"]: r["first_round"] for r in drv.read("seen").collect()}
    assert seen_eng == sim.seen_hashes(), "engine and simulator must agree exactly"
    eng_hosts = {r["host"] for r in drv.read("pages").select("host").collect()}
    assert O1 in eng_hosts and O2 not in eng_hosts
