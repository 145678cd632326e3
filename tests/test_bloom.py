"""Bloom shard properties: NO false negatives ever (correctness), sane
false-positive rate (efficiency), incremental update across rounds."""

from __future__ import annotations

import numpy as np

from tor_spider_spark.functions.hashing import xxh64
from tor_spider_spark.operators.bloom import BloomShards, _positions, _set_bits, _test_bits
from tor_spider_spark.schemas import BLOOM_SHARDS, SEEN


def test_bitset_no_false_negatives_numpy():
    m, k = 1 << 16, 7
    bits = np.zeros(m // 8, np.uint8)
    inserted = np.array([xxh64(f"u{i}") for i in range(2000)], np.int64)
    _set_bits(bits, _positions(inserted, k, m))
    assert _test_bits(bits, _positions(inserted, k, m)).all()


def test_bitset_no_false_negatives_property():
    """Hypothesis property (SURVEY §5.2.4): for ARBITRARY int64 keys —
    negative, duplicate, extreme — every inserted key probes positive."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=200
        ),
        st.sampled_from([1 << 10, 1 << 13, 1 << 16]),
        st.integers(min_value=1, max_value=10),
    )
    def prop(keys, m, k):
        bits = np.zeros(m // 8, np.uint8)
        arr = np.array(keys, np.int64)
        _set_bits(bits, _positions(arr, k, m))
        assert _test_bits(bits, _positions(arr, k, m)).all()

    prop()


def test_bitset_fpp_reasonable():
    m, k = 1 << 20, 7
    bits = np.zeros(m // 8, np.uint8)
    inserted = np.array([xxh64(f"u{i}") for i in range(50_000)], np.int64)
    _set_bits(bits, _positions(inserted, k, m))
    probes = np.array([xxh64(f"absent{i}") for i in range(20_000)], np.int64)
    fpp = _test_bits(bits, _positions(probes, k, m)).mean()
    assert fpp < 0.05, fpp  # theory ~1.8% at this load


def test_spark_update_and_probe(spark):
    bs = BloomShards(n_shards=4, m_bits=1 << 16, k=7)
    items = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 5}"), 0) for i in range(500)], SEEN
    )
    empty = spark.createDataFrame([], BLOOM_SHARDS)
    shards1 = bs.update(empty, items, 0).localCheckpoint()
    assert shards1.count() == items.select(
        (items.host_hash % 4).alias("s")
    ).distinct().count() or shards1.count() <= 4

    # second incremental round
    items2 = spark.createDataFrame(
        [(xxh64(f"v{i}"), xxh64(f"h{i % 5}"), 1) for i in range(300)], SEEN
    )
    shards2 = bs.update(shards1, items2, 1).localCheckpoint()

    cand = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 5}")) for i in range(500)]
        + [(xxh64(f"v{i}"), xxh64(f"h{i % 5}")) for i in range(300)]
        + [(xxh64(f"none{i}"), xxh64(f"h{i % 5}")) for i in range(300)],
        "url_hash long, host_hash long",
    )
    probed = bs.probe(shards2)(cand).collect()
    by_hash = {r["url_hash"]: r["_bloom_maybe"] for r in probed}
    for i in range(500):
        assert by_hash[xxh64(f"u{i}")], "false negative (round-0 item)"
    for i in range(300):
        assert by_hash[xxh64(f"v{i}")], "false negative (round-1 item)"
    fp = sum(by_hash[xxh64(f"none{i}")] for i in range(300))
    assert fp < 30


def test_partitioned_probe_matches_broadcast(spark):
    """The partition-aligned cogroup probe (the ≥10^9-seen path, VERDICT
    r2 #2) must return exactly the same _bloom_maybe verdicts as the
    broadcast probe — same bitsets, same double-hash math, different
    plumbing — including candidates whose shard has no bitset row yet
    (definite negatives)."""
    bs = BloomShards(n_shards=8, m_bits=1 << 16, k=7)
    # hosts chosen so at least one shard has NO inserted items
    items = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 3}"), 0) for i in range(400)], SEEN
    )
    empty = spark.createDataFrame([], BLOOM_SHARDS)
    shards = bs.update(empty, items, 0).localCheckpoint()

    cand = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 3}")) for i in range(400)]
        + [(xxh64(f"none{i}"), xxh64(f"h{i % 3}")) for i in range(200)]
        + [(xxh64(f"far{i}"), xxh64(f"newhost{i}")) for i in range(100)],
        "url_hash long, host_hash long",
    ).localCheckpoint()

    got_b = {
        (r["url_hash"], r["host_hash"]): r["_bloom_maybe"]
        for r in bs.probe_broadcast(shards)(cand).collect()
    }
    got_p = {
        (r["url_hash"], r["host_hash"]): r["_bloom_maybe"]
        for r in bs.probe_partitioned(shards)(cand).collect()
    }
    assert got_b == got_p
    assert len(got_p) == 700  # the join-back neither dropped nor duplicated
    for i in range(400):  # no false negatives through the partitioned path
        assert got_p[(xxh64(f"u{i}"), xxh64(f"h{i % 3}"))]


def test_partitioned_probe_duplicate_candidates_cardinality(spark):
    """Cardinality preservation with DUPLICATE candidate keys (ADVICE r3
    #3): probe_broadcast adds a column in place (never changes row count);
    probe_partitioned re-attaches positives via a join, which before the
    dropDuplicates fix multiplied n duplicate keys into n² rows."""
    bs = BloomShards(n_shards=4, m_bits=1 << 16, k=7)
    items = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 3}"), 0) for i in range(50)], SEEN
    )
    shards = bs.update(spark.createDataFrame([], BLOOM_SHARDS), items, 0).localCheckpoint()
    # every inserted key appears 3×, every absent key 2×
    cand = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 3}")) for i in range(50)] * 3
        + [(xxh64(f"none{i}"), xxh64(f"h{i % 3}")) for i in range(40)] * 2,
        "url_hash long, host_hash long",
    ).localCheckpoint()
    n_in = cand.count()
    for probe in (bs.probe_broadcast(shards), bs.probe_partitioned(shards)):
        out = probe(cand)
        assert out.count() == n_in == 230
        by_hash = {r["url_hash"]: r["_bloom_maybe"] for r in out.collect()}
        for i in range(50):
            assert by_hash[xxh64(f"u{i}")], "false negative through dup-key path"


def test_partitioned_probe_reattach_broadcast_guard(spark):
    """The positive-key re-attach broadcasts only under a caller-supplied
    candidate bound (VERDICT r3 wrong #3): hinted-small → forced broadcast
    join; no hint → plain join (no forced broadcast). Verdicts identical."""
    bs = BloomShards(n_shards=4, m_bits=1 << 16, k=7)
    items = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 3}"), 0) for i in range(100)], SEEN
    )
    shards = bs.update(spark.createDataFrame([], BLOOM_SHARDS), items, 0).localCheckpoint()
    cand = spark.createDataFrame(
        [(xxh64(f"u{i}"), xxh64(f"h{i % 3}")) for i in range(100)]
        + [(xxh64(f"none{i}"), xxh64(f"h{i % 3}")) for i in range(60)],
        "url_hash long, host_hash long",
    ).localCheckpoint()

    hinted = bs.probe_partitioned(shards, candidate_rows_hint=1000)(cand)
    unhinted = bs.probe_partitioned(shards, candidate_rows_hint=None)(cand)
    over = bs.probe_partitioned(
        shards, candidate_rows_hint=BloomShards.REATTACH_BROADCAST_MAX_ROWS + 1
    )(cand)
    # the hint forces the broadcast strategy; without it Spark must not be
    # FORCED to collect an unbounded key set to the driver
    assert "BroadcastHashJoin" in hinted._jdf.queryExecution().sparkPlan().toString()
    for df in (unhinted, over):
        assert "broadcast" not in df._jdf.queryExecution().logical().toString().lower()
    as_map = lambda df: {  # noqa: E731
        (r["url_hash"], r["host_hash"]): r["_bloom_maybe"] for r in df.collect()
    }
    assert as_map(hinted) == as_map(unhinted) == as_map(over)


def test_probe_dispatch_and_release(spark):
    """probe() picks the partitioned path above broadcast_max_bytes (a
    static knob decision — no scan), and release() on the broadcast path
    destroys the Broadcast (ADVICE r2 #5)."""
    import pytest

    small = BloomShards(n_shards=4, m_bits=1 << 16, k=7)
    big = BloomShards(n_shards=4, m_bits=1 << 16, k=7, broadcast_max_bytes=1024)
    items = spark.createDataFrame([(xxh64("x"), xxh64("h"), 0)], SEEN)
    shards = small.update(
        spark.createDataFrame([], BLOOM_SHARDS), items, 0
    ).localCheckpoint()

    p_small = small.probe(shards)
    p_big = big.probe(shards)
    assert p_small._broadcast is not None  # broadcast path
    assert p_big._broadcast is None  # partitioned path (4*8KB > 1KB cap)

    p_small.release()
    assert p_small._broadcast is None
    cand = spark.createDataFrame([(xxh64("x"), xxh64("h"))], "url_hash long, host_hash long")
    with pytest.raises(Exception):  # destroyed broadcast is really gone
        small_probe_after = p_small(cand)  # building may lazily succeed...
        small_probe_after.collect()  # ...but executing must fail
    p_big.release()  # no-op on the partitioned path


def test_probe_dispatch_topology(spark, monkeypatch):
    """Multi-JVM sessions must route to the partitioned probe even for
    tiny bitsets (VERDICT r4 wrong #1: the broadcast probe's per-round
    collect+broadcast was measured to HALVE throughput at 4 real executor
    JVMs while the exact path improved); single-process sessions keep the
    size dispatch."""
    from tor_spider_spark.operators import bloom as bloom_mod

    bs = BloomShards(n_shards=4, m_bits=1 << 16, k=7)
    items = spark.createDataFrame([(xxh64("x"), xxh64("h"), 0)], SEEN)
    shards = bs.update(
        spark.createDataFrame([], BLOOM_SHARDS), items, 0
    ).localCheckpoint()

    monkeypatch.setattr(bloom_mod, "cluster_executors", lambda _sc: 4)
    p_multi = bs.probe(shards)
    assert p_multi._broadcast is None  # partitioned path

    monkeypatch.setattr(bloom_mod, "cluster_executors", lambda _sc: 1)
    p_single = bs.probe(shards)
    assert p_single._broadcast is not None  # broadcast path
    p_single.release()

    # the real topology call reports 1 on this local[8] test session
    assert bloom_mod.cluster_executors(spark.sparkContext) == 1


def test_bloom_knobs_one_derivation(spark, smoke_dfs, tmp_path):
    """The three bloom knobs that must agree derive in ONE place
    (VERDICT r4 next #5): CrawlConfig.bloom_knobs() pins the sizing
    math and the driver builds its BloomShards from exactly it."""
    from tor_spider_spark.config import CrawlConfig
    from tor_spider_spark.operators.bloom import DEFAULT_BROADCAST_MAX_BYTES
    from tor_spider_spark.plans.driver import CrawlDriver

    assert CrawlConfig().bloom_knobs() == {"n_shards": 16, "m_bits": 1 << 20, "k": 7}
    # the 10^10 design point from the docstring table: 2^25 bits/shard
    big = CrawlConfig(bloom_capacity=10_000_000_000, n_buckets=4096)
    assert big.bloom_knobs()["m_bits"] == 1 << 25
    # capacity sizing: >= bits_per_key * capacity / n_shards, floor 2^20
    mid = CrawlConfig(bloom_capacity=50_000_000, n_buckets=16)
    assert mid.bloom_knobs()["m_bits"] >= 10 * 50_000_000 // 16
    assert CrawlConfig(bloom_capacity=100, n_buckets=16).bloom_knobs()["m_bits"] == 1 << 20
    # broadcast-cap override flows through; default stays the module's
    capped = CrawlConfig(bloom_broadcast_max_bytes=1024)
    assert capped.bloom_knobs()["broadcast_max_bytes"] == 1024

    cfg = CrawlConfig(bloom_capacity=50_000_000, bloom_broadcast_max_bytes=0)
    drv = CrawlDriver(
        spark, str(tmp_path), smoke_dfs["corpus"], smoke_dfs["seeds"],
        smoke_dfs["robots"], [], cfg,
    )
    assert drv.bloom.m_bits == cfg.bloom_knobs()["m_bits"]
    assert drv.bloom.n_shards == cfg.n_buckets
    assert drv.bloom.broadcast_max_bytes == 0  # forces the partitioned probe
    drv2 = CrawlDriver(
        spark, str(tmp_path / "d2"), smoke_dfs["corpus"], smoke_dfs["seeds"],
        smoke_dfs["robots"], [], CrawlConfig(),
    )
    assert drv2.bloom.broadcast_max_bytes == DEFAULT_BROADCAST_MAX_BYTES
