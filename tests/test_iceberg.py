"""Real-Iceberg backend (sources/iceberg.py) — the SnapshotTable suite
replayed against an Iceberg catalog. SKIPPED when no Iceberg runtime jar /
catalog is configured (the dev container ships none); on a cluster launch
with:

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.local_iceberg=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.local_iceberg.type=hadoop
    --conf spark.sql.catalog.local_iceberg.warehouse=/tmp/iceberg-wh

and the same assertions run against the real thing.
"""

from __future__ import annotations

import pytest

from tor_spider_spark import schemas
from tor_spider_spark.sources.iceberg import iceberg_available

CATALOG = "local_iceberg"


@pytest.fixture(scope="module")
def iceberg_spark(spark):
    if not iceberg_available(spark, CATALOG):
        pytest.skip("no Iceberg runtime jar / catalog on this session")
    return spark


def _rows(spark, lo, hi):
    return spark.createDataFrame([(i, i % 7, 0) for i in range(lo, hi)], schemas.SEEN)


def test_append_versions_and_time_travel(iceberg_spark):
    from tor_spider_spark.sources.iceberg import IcebergTable

    t = IcebergTable(iceberg_spark, CATALOG, "seen_it", schemas.SEEN, n_buckets=4)
    v1 = t.append(_rows(iceberg_spark, 0, 10))
    v2 = t.append(_rows(iceberg_spark, 10, 25))
    assert t.read(iceberg_spark, v1).count() == 10
    assert t.read(iceberg_spark, v2).count() == 25
    v3 = t.overwrite(_rows(iceberg_spark, 0, 5))
    assert t.read(iceberg_spark, v3).count() == 5
    assert t.read(iceberg_spark, v2).count() == 25  # snapshot intact


def test_append_parent_fences_orphans(iceberg_spark):
    from tor_spider_spark.sources.iceberg import IcebergTable

    t = IcebergTable(iceberg_spark, CATALOG, "seen_fence", schemas.SEEN)
    v1 = t.append(_rows(iceberg_spark, 0, 10))
    t.append(_rows(iceberg_spark, 100, 110), parent=v1)  # orphan (no checkpoint)
    v3 = t.append(_rows(iceberg_spark, 100, 110), parent=v1)  # resume re-run
    got = sorted(r[0] for r in t.read(iceberg_spark, v3).select("url_hash").collect())
    assert got == sorted(list(range(10)) + list(range(100, 110)))


def test_seed_inbox_drain_on_iceberg(iceberg_spark):
    """The streamed-seed drain path on the real backend (ADVICE r2 #2):
    read_new must return exactly the rows of snapshots after the consumed
    one, and has_new must gate on id inequality. Mock-level contract in
    tests/test_iceberg_contract.py; this is the live replay."""
    from tor_spider_spark.sources.iceberg import IcebergTable

    t = IcebergTable(iceberg_spark, CATALOG, "seed_inbox_it", schemas.SEED_INBOX)
    mk = lambda urls: iceberg_spark.createDataFrame(  # noqa: E731
        [(u, 0) for u in urls], schemas.SEED_INBOX
    )
    v1 = t.append(mk(["http://a.onion"]))
    assert t.has_new(0, v1)
    assert {r["url"] for r in t.read_new(iceberg_spark, 0, v1).collect()} == {
        "http://a.onion"
    }
    v2 = t.append(mk(["http://b.onion", "http://c.onion"]))
    assert t.has_new(v1, v2) and not t.has_new(v2, v2)
    fresh = {r["url"] for r in t.read_new(iceberg_spark, v1, v2).collect()}
    assert fresh == {"http://b.onion", "http://c.onion"}


def test_crawl_driver_runs_on_iceberg(iceberg_spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg, smoke_sim):
    from tor_spider_spark.plans.driver import CrawlDriver

    drv = CrawlDriver(
        iceberg_spark,
        str(tmp_path / "iceberg-run"),
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
        iceberg_catalog=CATALOG,
    )
    drv.run()
    seen_eng = {r["url_hash"]: r["first_round"] for r in drv.read("seen").collect()}
    assert seen_eng == smoke_sim.seen_hashes()
