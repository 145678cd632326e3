"""Update-mode streaming sink (VERDICT r2 #8): a two-drop, two-trigger
drain through the SAME checkpoint must converge the keyed sink table to
exactly the batch aggregation — proving the foreachBatch upsert is
incremental (drop 2 only reprocesses/updates the windows it touches) and
restart-safe (the second drain resumes from the checkpoint, it does not
re-read drop 1)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tor_spider_spark.streaming.windows import stream_update_counts

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _batch_expected(spark, events_path):
    e = spark.read.parquet(events_path)
    return {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            e.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type",
                "n",
                "sum_value",
            )
            .collect()
        )
    }


def test_two_drop_incremental_equals_batch(spark, tmp_path):
    events_path = os.path.join(SF, "events.parquet")
    e = spark.read.parquet(events_path).orderBy("ts", "event_id")
    n = e.count()
    # time-ordered split: drop 2 is never late relative to drop 1's
    # watermark, so the 1-hour watermark drops nothing in this harness
    first = e.limit(n // 2)
    second = e.subtract(first)
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drop(df, stage_name):
        stage = tmp_path / stage_name
        df.coalesce(1).write.parquet(str(stage))
        for i, f in enumerate(sorted(os.listdir(stage))):
            if f.endswith(".parquet"):
                os.rename(stage / f, src / f"{stage_name}-{i}.parquet")

    drop(first, "d1")
    mid = stream_update_counts(spark, str(src), sink_dir=sink, checkpoint_dir=ckpt)
    mid_rows = mid.count()
    assert mid_rows > 0

    drop(second, "d2")
    final = stream_update_counts(spark, str(src), sink_dir=sink, checkpoint_dir=ckpt)

    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in final.collect()
    }
    assert got == _batch_expected(spark, events_path)
