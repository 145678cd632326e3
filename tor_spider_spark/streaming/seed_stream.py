"""Structured-Streaming seed ingestion — the reference's runtime seed
endpoints re-expressed (SURVEY §2.1 S1/S2).

The reference accepts seeds while crawling via HTTP handlers
(``/seed?url=U`` and ``/periodic?url=U&interval=K``, reference
spider/spider.go:232-292); the engine's equivalent is a seed DROPBOX
directory watched by a file-source stream: drop a JSON file
``{"url": ..., "recrawl_every": k}`` (one per line) and the next
micro-batch appends the rows to the frontier snapshot table, where the
next crawl round picks them up with full seed semantics (dedup exempt,
F7).

``foreachBatch`` is the bridge: each micro-batch runs the same
``with_url_identity`` + append path the batch driver uses, so streaming
and batch share one code path.  Used with ``trigger(availableNow=True)``
in tests (deterministic drain); a live deployment runs it continuously
alongside the round loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..functions.urls import with_url_identity
from ..sources.tables import SnapshotTable

SEED_EVENT = StructType(
    [
        StructField("url", StringType()),
        StructField("recrawl_every", IntegerType()),
    ]
)


def seed_rows_for_round(batch: DataFrame, round_no: int) -> DataFrame:
    """Shared batch/stream path: raw seed events → frontier rows."""
    return with_url_identity(batch.select("url")).select(
        "url",
        "url_hash",
        "host",
        "host_hash",
        F.lit(0).alias("depth"),
        F.lit(1.0).alias("priority"),
        F.lit(round_no).alias("discovered_round"),
        F.lit(True).alias("is_seed"),
    )


def ingest_seed_dropbox(
    spark: SparkSession,
    dropbox_dir: str,
    frontier_table: SnapshotTable,
    next_round: int,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch *dropbox_dir* for JSON seed files; append arrivals to the
    frontier. Returns the streaming query (already started)."""
    stream = (
        spark.readStream.schema(SEED_EVENT)
        .option("maxFilesPerTrigger", 64)
        .json(dropbox_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        rows = seed_rows_for_round(batch, next_round)
        if not rows.isEmpty():
            frontier_table.append(rows)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
