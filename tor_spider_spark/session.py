"""SparkSession factory with the engine's tuned configuration.

One place for every conf so tests, bench, and the driver contract agree.
The settings are the SURVEY §4.2 list: AQE (+skew join for hub onion
sites), Arrow-batched pandas UDFs, and shuffle-partition sizing for the
sandbox (local[32]); on a real cluster only master/partitions change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "tor-spider-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        # 3x cores: stragglers from skewed keys (hub hosts) smooth out and
        # AQE coalesces the excess back — same rule on a real cluster
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        cores = 32 if n == "*" else int(n)
        shuffle_partitions = max(8, 3 * cores)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # hub onion sites are heavy-hitter join keys (SURVEY §2.3 J3)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # runtime bloom join pruning as a backstop under our explicit shards
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
