"""Event-time windowed aggregation as a REAL Structured Streaming query
(SURVEY §2.8 noted the reference has no event-time semantics — this is
the engine's forward-looking streaming surface, exercised with an exact
batch oracle).

``stream_tumbling_counts`` drains a parquet table through the file
stream source with ``trigger(availableNow=True)``: a deterministic
run-to-completion micro-batch pass — the same execution machinery a live
deployment uses, minus waiting. Output mode ``complete`` with a
1-hour watermark: the watermark bounds state in a live run, and in a
single-drain run nothing is ever late (the initial watermark is -inf),
so the result is EXACTLY the batch aggregation — which is what makes a
DuckDB oracle possible for a streaming query.

Scale notes: the windowed agg is a streaming hash aggregate keyed by
(window, event_type) — state rows = distinct windows × types, pruned by
the watermark in live mode; the file source lists and batches files, so
parallelism follows file splits like any scan.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_tumbling_counts(
    spark: SparkSession,
    parquet_path: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Run the streaming windowed aggregation over *parquet_path* to
    completion; returns the result as a DataFrame (memory sink table)."""
    # the file stream source requires a DIRECTORY; testdata tables are
    # single files — expose via a symlinked temp dir
    src = parquet_path
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="stream-src-")
        os.symlink(src, os.path.join(d, os.path.basename(src)))
        src = d
    schema = spark.read.parquet(parquet_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        # watermarks need TIMESTAMP (tz-aware); testdata ts is NTZ
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = "stream_win_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
