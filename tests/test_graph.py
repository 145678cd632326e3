"""Crawl-priority PageRank (operators/graph.py).

The reference frontier pops random batches (spider/mongojobsstorage.go:
241-246); the north rule adds a priority queue, and graph.py supplies the
classic link-graph priority signal. Correctness story: the fixed-point
integer recurrence is order-independent, so Spark must agree BIT FOR BIT
with a pure-Python replay of the same recurrence at any parallelism —
tested on hand-built and pseudo-random graphs here, and against a DuckDB
unrolled-CTE oracle in the driver contract (`host_pagerank`).
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from tor_spider_spark.operators.graph import (
    BASE_RANK,
    DAMPING_DEN,
    DAMPING_NUM,
    INIT_RANK,
    host_link_rank,
    pagerank_fixed_point,
)


def _replay(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    """Pure-Python replay of the integer recurrence (the test oracle)."""
    edges = sorted(set(edges))
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: INIT_RANK for v in nodes}
    for _ in range(iterations):
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {v: BASE_RANK + (DAMPING_NUM * incoming[v]) // DAMPING_DEN for v in nodes}
    return rank


def _run(spark, edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in sorted(set(edges))], "src long, dst long"
    )
    return {r["node"]: r["rank"] for r in pagerank_fixed_point(df, iterations).collect()}


def test_tiny_graph_bit_exact(spark):
    # A(1)->B(2), B->A, A->C(3): C is a dangling sink, B splits nothing
    edges = [(1, 2), (2, 1), (1, 3)]
    assert _run(spark, edges, 3) == _replay(edges, 3)


def test_hub_ranks_highest(spark):
    # star: everyone links to node 0 plus a chain among the spokes
    edges = [(i, 0) for i in range(1, 8)] + [(i, i + 1) for i in range(1, 7)]
    got = _run(spark, edges, 3)
    assert max(got, key=got.get) == 0


def test_random_graphs_match_python_replay(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 30 + trial * 20
        edges = list(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(4 * n)}
        )
        edges = [(s, d) for s, d in edges if s != d]
        iters = 2 + trial
        assert _run(spark, edges, iters) == _replay(edges, iters), f"trial {trial}"


def test_host_link_rank_over_pages_shape(spark):
    # pages shape: host + out_links; hub.onion is linked by every other host
    rows = [
        ("a.onion", ["http://hub.onion/x", "http://b.onion/y"]),
        ("b.onion", ["http://hub.onion/z"]),
        ("c.onion", ["http://hub.onion/w", "http://a.onion/q"]),
        ("hub.onion", ["http://a.onion/r"]),
    ]
    pages = spark.createDataFrame(rows, "host string, out_links array<string>")
    got = {r["host"]: r["rank"] for r in host_link_rank(pages, iterations=3).collect()}
    assert set(got) == {"a.onion", "b.onion", "c.onion", "hub.onion"}
    assert max(got, key=got.get) == "hub.onion"
    # self-links and duplicate links must not change the edge set
    noisy = spark.createDataFrame(
        [
            (h, links + [f"http://{h}/self"] + links)  # add self-link + dups
            for h, links in rows
        ],
        "host string, out_links array<string>",
    )
    got_noisy = {r["host"]: r["rank"] for r in host_link_rank(noisy, iterations=3).collect()}
    assert got_noisy == got


def test_parallelism_invariance(spark):
    # same graph at 1 vs 32 shuffle partitions: bit-identical ranks
    rng = random.Random(7)
    edges = [(s, d) for s, d in {(rng.randrange(40), rng.randrange(40)) for _ in range(160)} if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = {r["node"]: r["rank"] for r in pagerank_fixed_point(df.repartition(1), 4).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = {r["node"]: r["rank"] for r in pagerank_fixed_point(df.repartition(16), 4).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == many
