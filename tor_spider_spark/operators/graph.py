"""Link-graph analysis for frontier prioritization (crawl-priority PageRank).

The reference frontier has NO priority column — Mongo ``$sample`` pops a
random batch (reference spider/mongojobsstorage.go:241-246; SURVEY §1.1).
The north rule adds a priority queue, and the engine's default priority is
a pure depth decay (config.priority_for_depth).  A real large-scale crawl
prioritizes by the link graph itself: hosts that many other hosts point at
are fetched first (the classic crawl-ordering result).  This module
computes that signal as a deterministic FIXED-POINT PageRank over a
(src, dst) edge DataFrame, so it can feed ``frontier.priority`` directly.

Why fixed-point integers, not floats: the engine's correctness story is
exact oracle replay (DuckDB re-runs every SQL-expressible operator and the
driver hash-compares values).  Float PageRank sums in shuffle order and
would hash-diverge run to run; with rank carried in integer micro-units
(init 1_000_000 per node) every operation — integer division by
out-degree, integer damping (×85 ÷ 100) — is associative and
order-independent, so Spark and an unrolled-CTE SQL replay agree BIT FOR
BIT at any parallelism.  The precision loss vs float PageRank is ~1e-6 of
rank mass per hop — irrelevant for ordering hosts.

Scale shape (the 100 TB question): per iteration, one shuffle of |edges|
(contribution push, keyed on dst) and one of |nodes| (re-attach) — the
standard distributed PageRank plan.  Out-degrees are computed ONCE and
joined per iteration; edges are localCheckpoint'd up front so the
iteration re-reads materialized blocks instead of re-running the upstream
plan; each iteration localCheckpoints its ranks to truncate lineage
(same hygiene as dedup.connected_components — without it the plan doubles
per iteration and the 10th round plans for minutes).  Iteration count is a
knob, not a convergence loop: crawl prioritization wants a handful of hops
(rank stabilizes order long before values converge), and a fixed count
keeps the oracle expressible as unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# damping 0.85 and teleport base expressed in integer micro-units of the
# 1.0-per-node initial mass: base = (1-d) × 1e6, damping = ×85 ÷ 100
INIT_RANK = 1_000_000
BASE_RANK = 150_000
DAMPING_NUM = 85
DAMPING_DEN = 100


def pagerank_fixed_point(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(node:long, rank:long) after ``iterations`` PageRank steps over
    ``edges`` (columns ``src``, ``dst``; both long; duplicate edges count
    once — callers pass a distinct edge set).

    rank_0(v)   = INIT_RANK
    rank_t+1(v) = BASE_RANK + (85 × Σ_{u→v} (rank_t(u) div outdeg(u))) div 100

    All arithmetic is integer (``div`` = integral division) on
    non-negative values, so truncation == floor and Spark/DuckDB agree
    exactly; see the module docstring for why.  Dangling mass (nodes with
    no out-edges) is dropped, not redistributed — both implementations
    drop it identically, and for crawl prioritization the *ordering*
    signal is unaffected.
    """
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od")).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(INIT_RANK).cast("long"))
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr("rank div od").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .groupBy("node")
            .agg(
                F.expr(
                    f"cast({BASE_RANK} + ({DAMPING_NUM} * coalesce(sum(c), 0))"
                    f" div {DAMPING_DEN} as bigint)"
                ).alias("rank")
            )
            .localCheckpoint()
        )
    return ranks


def host_link_rank(pages: DataFrame, iterations: int = 3) -> DataFrame:
    """(host:string, rank:long): PageRank over the HOST graph induced by
    fetched pages — edge host(page) → host(out_link) for every distinct
    host pair (self-links dropped; a host linking to itself is not a
    priority signal).  This is the crawl-priority producer: join the
    result onto the frontier by host and use it as (or blend it into)
    ``priority`` for the politeness rank (W1).

    Input needs columns ``host`` and ``out_links:array<string>`` (the
    pages/corpus shape).  Host extraction matches functions/urls.py:
    ``parse_url(link, 'HOST')`` lowercased.
    """
    pairs = (
        pages.select(
            F.lower(F.col("host")).alias("src_host"),
            F.explode("out_links").alias("link"),
        )
        .select(
            "src_host",
            F.lower(F.parse_url(F.col("link"), F.lit("HOST"))).alias("dst_host"),
        )
        .where(F.col("dst_host").isNotNull() & (F.col("dst_host") != F.col("src_host")))
        .distinct()
    )
    # map hosts to dense-enough long ids via xxhash64 (collision odds at
    # crawl host counts ~1e7 are ~1e-5; a collision merges two hosts'
    # rank, never corrupts the structure) — keeps the iteration on longs
    edges = pairs.select(
        F.xxhash64("src_host").alias("src"), F.xxhash64("dst_host").alias("dst")
    )
    ids = (
        pairs.select(F.col("src_host").alias("host"))
        .unionByName(pairs.select(F.col("dst_host").alias("host")))
        .distinct()
        .withColumn("node", F.xxhash64("host"))
    )
    return pagerank_fixed_point(edges, iterations).join(ids, "node").select("host", "rank")
