"""Config-file sources: robots.txt parser + blacklist/seed loaders."""

from __future__ import annotations

from tor_spider_spark.sources.config_files import load_blacklist, load_seeds
from tor_spider_spark.sources.robots import parse_robots_txt, robots_table_from_txt

ROBOTS_TXT = """
# comments ignored
User-agent: googlebot
Disallow: /only-for-google

User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2.5

User-agent: evilbot
User-agent: *
Disallow: /shared
"""


def test_parse_robots_txt_star_groups():
    disallow, delay = parse_robots_txt(ROBOTS_TXT)
    assert disallow == ["/private", "/tmp/", "/shared"]
    assert delay == 2500


def test_parse_robots_txt_edge_cases():
    assert parse_robots_txt("") == ([], 0)
    assert parse_robots_txt(None) == ([], 0)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ([], 0)  # empty = allow all
    assert parse_robots_txt("User-agent: *\nCrawl-delay: nonsense") == ([], 0)


def test_robots_table_from_txt(spark):
    raw = spark.createDataFrame(
        [("a.onion", ROBOTS_TXT), ("b.onion", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r for r in robots_table_from_txt(raw).collect()}
    assert rows["a.onion"]["disallow_prefixes"] == ["/private", "/tmp/", "/shared"]
    assert rows["a.onion"]["crawl_delay_ms"] == 2500
    assert rows["b.onion"]["disallow_prefixes"] == ["/x"]
    assert rows["b.onion"]["crawl_delay_ms"] == 0


def test_blacklist_and_seed_loaders(spark, tmp_path):
    bl = tmp_path / "blacklist.txt"
    bl.write_text(".*bad.onion.*\n\n# comment\n.*worse.onion.*\n")
    assert load_blacklist(str(bl)) == [".*bad.onion.*", ".*worse.onion.*"]

    seeds = tmp_path / "seeds.txt"
    host = "c" * 16 + ".onion"
    seeds.write_text(f"http://{host}/p0\nhttp://{host}/p1\t3\n")
    rows = sorted(map(tuple, load_seeds(spark, str(seeds)).collect()))
    assert rows == [
        (f"http://{host}/p0", True, 0),
        (f"http://{host}/p1", True, 3),
    ]
