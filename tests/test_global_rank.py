"""The scalable two-phase global rank must equal the simple orderBy
position — both paths of operators/politeness._global_rank (SURVEY §2.5
W2/W3). The large path is the one 10^7-row rounds take."""

from __future__ import annotations

import pyspark.sql.functions as F

from tor_spider_spark.operators import politeness
from tor_spider_spark.operators.politeness import _global_rank


def _df(spark, n=20000):
    return (
        spark.range(n)
        .withColumn("url", F.concat(F.lit("http://h"), F.pmod(F.col("id") * 7919, F.lit(n)), F.lit(".onion/p")))
        .withColumn("priority", (F.pmod(F.col("id"), F.lit(7)) / 7.0))
        .withColumn("discovered_round", F.pmod(F.col("id"), F.lit(3)).cast("int"))
        .drop("id")
    )


def test_large_path_equals_small_path(spark, monkeypatch):
    df = _df(spark).localCheckpoint()
    small = {
        r["url"]: r["rank"] for r in _global_rank(df, round_limit=50000).collect()
    }
    monkeypatch.setattr(politeness, "_SMALL_ROUND", 10)
    large = {
        r["url"]: r["rank"] for r in _global_rank(df, round_limit=50000).collect()
    }
    assert small == large
    # ranks are a 1..n permutation
    assert sorted(large.values()) == list(range(1, len(large) + 1))


def test_rank_respects_total_order(spark):
    df = _df(spark, 5000).localCheckpoint()
    rows = _global_rank(df, round_limit=100000).orderBy("rank").collect()
    keys = [(-r["priority"], r["discovered_round"], r["url"]) for r in rows]
    assert keys == sorted(keys)
