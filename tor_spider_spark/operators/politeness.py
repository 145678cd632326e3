"""Deterministic per-host politeness scheduler (SURVEY §2.5 W1-W3).

Re-imagines the reference's global concurrency caps — 32 workers
(spider/spider.go:82), ``colly.LimitRule{DomainGlob:"*", Parallelism:8}``
(spider/spider.go:148-151) and the random ``$sample`` batch pop of 64
(spider/mongojobsstorage.go:241-246) — as the north rule's *per-host
priority queue*: a window rank partitioned by host, ordered by the frozen
total order (priority DESC, discovered_round ASC, url ASC), capped by the
host budget (robots ``max_per_round`` else 8), then a global top-k.

Determinism (SURVEY §2.8): every tiebreak is a pure function of columns;
the Mongo ``$sample`` randomness is deliberately replaced (the reference's
*set* semantics are preserved; ordering is judged against the frozen
deterministic projection).

Scale notes: the host window shuffles by ``host`` — the same key the
frontier table is bucketed on, so with storage-partitioned reads this is
exchange-free; the global top-k compiles to ``TakeOrderedAndProject``
(no total sort); the final row_number runs on ≤ round_limit rows (bounded,
driver-side-small by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig

def total_order():
    """The frozen W3 total order — every scheduling tiebreak uses this."""
    return [F.col("priority").desc(), F.col("discovered_round").asc(), F.col("url").asc()]


def collapse_candidates(frontier: DataFrame) -> DataFrame:
    """Step 1 of the frozen round semantics: collapse duplicate frontier
    rows per url — min (depth, discovered_round) wins, is_seed is OR'd.
    (The reference tolerates duplicate Mongo jobs and dedups at visit
    time, spider/spider.go:301; collapsing at claim is equivalent.)

    Exchange fusion: we repartition ONCE on host_hash; the groupBy keys
    include host_hash, so HashPartitioning(host_hash) satisfies the
    grouping's ClusteredDistribution, and the downstream politeness
    window partitions by (host_hash, host) — the whole collapse→rank
    prefix runs on a single exchange. (With Iceberg storage-partitioned
    reads on bucket(host_hash) even that exchange disappears.)"""
    return (
        frontier.repartition("host_hash")
        .groupBy("url", "url_hash", "host", "host_hash")
        .agg(
            F.min(F.struct("depth", "discovered_round")).alias("_dd"),
            F.max("is_seed").alias("is_seed"),
        )
        .select(
            "url",
            "url_hash",
            "host",
            "host_hash",
            F.col("_dd.depth").alias("depth"),
            (F.lit(1.0) / (1.0 + F.col("_dd.depth"))).alias("priority"),
            F.col("_dd.discovered_round").alias("discovered_round"),
            "is_seed",
        )
    )


_SMALL_ROUND = 65536


def _global_rank(
    df: DataFrame,
    round_limit: int,
    persisted_out: list | None = None,
    size_hint: int | None = None,
) -> DataFrame:
    """Total-order global rank (1-based) in the frozen W3 order.

    Small rounds (the reference envelope: MINIMUM_JOBS=64-scale batches)
    take the cheap path: top-k prune (TakeOrderedAndProject — no full
    sort) then a single bounded window.  Large rounds take the scalable
    two-phase path: range-partition on the total order, rank within
    partitions, add per-partition offsets (one tiny driver collect) — no
    single-partition shuffle anywhere, so a 10^7-row round ranks in
    parallel.

    *size_hint* is an UPPER BOUND on df's rows (the driver reads it off
    the frontier's parquet footers — no job). Both paths produce the
    identical rank, so the dispatch is purely physical; without the hint a
    large round_limit forced every round onto the two-phase path, whose
    range-sample pass + offsets collect re-execute the whole upstream
    chain — measured at ~2 extra passes per crawl round on rounds of a
    few thousand rows (r2 crawl-bench regression, VERDICT r2 #1)."""
    effective = min(round_limit, size_hint) if size_hint is not None else round_limit
    if effective <= _SMALL_ROUND:
        topk = df.orderBy(*total_order()).limit(round_limit)
        w = Window.orderBy(*total_order())
        return topk.withColumn("rank", F.row_number().over(w))

    # range-partition + local sort = globally sorted; monotonically_
    # increasing_id is (pid << 33) + consecutive local index, so the
    # global rank is local index + per-partition offset — ONE exchange,
    # one local sort, no second shuffle and no window. localCheckpoint
    # pins the data so the offsets pass and the output pass agree.
    pinned = (
        df.repartitionByRange(*total_order())
        .sortWithinPartitions(*total_order())
        .persist()  # pin: offsets pass and output pass must agree; handed
        # back via persisted_out so the driver unpersists after the round
        # commit (was a per-round cache leak in the large-round regime)
    )
    if persisted_out is not None:
        persisted_out.append(pinned)
    part = pinned.withColumn("_mid", F.monotonically_increasing_id())
    # counts job doubles as the materializing action (no extra pass —
    # an eager localCheckpoint here cost a full scan of its own)
    cnts = {
        r["_pid"]: r["n"]
        for r in part.groupBy(F.shiftright("_mid", 33).alias("_pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(cnts):
        offsets[pid] = acc
        acc += cnts[pid]
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    local_ix = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    pid = F.shiftright("_mid", 33)
    return part.withColumn("rank", (local_ix + offmap[pid] + 1).cast("int")).drop("_mid")


def schedule_round(
    candidates: DataFrame,
    robots: DataFrame,
    host_state: DataFrame,
    round_no: int,
    cfg: CrawlConfig,
    persisted_out: list | None = None,
    size_hint: int | None = None,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Steps 2 of the frozen semantics → `scheduled` with a global rank.

    robots/host_state are one row per host — small on the fixture, 10^7+
    rows at full scale, where a forced broadcast is a driver OOM. Catalyst
    cannot decide from stats here (in-memory relations and empty tables
    carry unknown/max size), so the DRIVER decides from its metadata row
    counts and passes *broadcast_dims*: True ⇒ the r2 broadcast plan;
    False ⇒ a shuffle join on host (bucket-aligned on the Iceberg layout)
    — the same dual-regime dispatch the bloom probe does (SURVEY §2.3 J4).
    """
    maybe_bc = F.broadcast if broadcast_dims else (lambda df: df)
    c = (
        candidates.join(
            maybe_bc(robots.select("host", "crawl_delay_ms", "max_per_round")),
            "host",
            "left",
        )
        .join(maybe_bc(host_state.select("host", "last_fetch_round")), "host", "left")
        .withColumn("_delay_rounds", F.coalesce(F.floor(F.col("crawl_delay_ms") / 1000), F.lit(0)))
        .withColumn("_budget", F.coalesce("max_per_round", F.lit(cfg.default_host_budget)))
    )
    eligible = c.where(
        ~(
            F.col("last_fetch_round").isNotNull()
            & (F.col("_delay_rounds") > 0)
            & (F.lit(round_no) - F.col("last_fetch_round") <= F.col("_delay_rounds"))
        )
    )
    # (host_hash, host) keys: satisfied by the collapse exchange on
    # host_hash — no new shuffle; `host` kept in the keys so a host_hash
    # collision can never merge two hosts' budgets
    host_w = Window.partitionBy("host_hash", "host").orderBy(*total_order())
    budgeted = eligible.withColumn("_hr", F.row_number().over(host_w)).where(
        F.col("_hr") <= F.col("_budget")
    )
    ranked = _global_rank(budgeted, cfg.round_limit, persisted_out, size_hint)
    return ranked.where(F.col("rank") <= cfg.round_limit).select(
        F.lit(round_no).alias("round"),
        "rank",
        "url",
        "url_hash",
        "host",
        "host_hash",
        "depth",
        "priority",
        "discovered_round",
        "is_seed",
    )
