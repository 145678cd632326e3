"""robots.txt parsing → the engine's `robots` table.

The reference *ignores* robots (``IgnoreRobotsTxt()``, reference
spider/spider.go:112,166); the north rule inverts that — the engine must
respect Disallow prefixes and Crawl-delay.  This module turns raw
robots.txt payloads (one row per host, as a crawler would fetch them)
into the broadcastable `robots` dimension table the scheduler consumes
(operators/politeness.py J4).

Parsing follows the de-facto standard (Google REP, RFC 9309): rules in
the ``User-agent: *`` group; ``Disallow:`` path prefixes (empty value =
allow all); ``Crawl-delay: <seconds>``.  An Arrow-batched pandas UDF —
text munging with per-line state is not expressible in native Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PARSED = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("crawl_delay_ms", LongType()),
        StructField("max_per_round", IntegerType()),
    ]
)


def parse_robots_txt(text: str) -> tuple[list[str], int]:
    """Pure parser (unit-testable without Spark): returns
    (disallow_prefixes, crawl_delay_ms) from every agent group whose
    User-agent set contains ``*``. A group is one or more consecutive
    User-agent lines followed by its rule lines (RFC 9309 §2.1)."""
    disallow: list[str] = []
    delay_ms = 0
    agents: list[str] = []
    in_agent_run = False  # consecutive User-agent lines extend one group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                agents = []  # a new group starts
            agents.append(val)
            in_agent_run = True
            continue
        in_agent_run = False
        if "*" not in agents:
            continue
        if key == "disallow" and val:
            disallow.append(val)
        elif key == "crawl-delay":
            try:
                delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    return disallow, delay_ms


@pandas_udf(PARSED)
def _parse_udf(texts: pd.Series) -> pd.DataFrame:
    rows = []
    for t in texts:
        d, ms = parse_robots_txt(t)
        rows.append((d, ms, None))
    return pd.DataFrame(rows, columns=["disallow_prefixes", "crawl_delay_ms", "max_per_round"])


def robots_table_from_txt(raw: DataFrame) -> DataFrame:
    """(host:string, robots_txt:string) → engine robots table
    (schemas.ROBOTS). max_per_round is an operator knob, not a robots.txt
    field — null here, filled by policy if desired."""
    return raw.select("host", _parse_udf(F.col("robots_txt")).alias("p")).select(
        "host",
        F.col("p.disallow_prefixes").alias("disallow_prefixes"),
        F.col("p.crawl_delay_ms").alias("crawl_delay_ms"),
        F.col("p.max_per_round").alias("max_per_round"),
    )
