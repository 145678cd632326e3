"""Structured-Streaming seed ingestion — the reference's runtime seed
endpoints re-expressed (SURVEY §2.1 S1/S2).

The reference accepts seeds while crawling via HTTP handlers
(``/seed?url=U`` and ``/periodic?url=U&interval=K``, reference
spider/spider.go:232-292); the engine's equivalent is a seed DROPBOX
directory watched by a file-source stream: drop a JSON file
``{"url": ..., "recrawl_every": k}`` (one per line) and the next
micro-batch appends the rows to the ``seed_inbox`` snapshot table.
CrawlDriver drains the inbox at the start of every round (reading only
the versions newer than the checkpoint-recorded consumed version) and
injects the rows as seed-lineage frontier rows — so streamed seeds get
full seed semantics (dedup exempt F7, clearnet traversal) and the
consumed-version bookkeeping survives kill/resume.

``foreachBatch`` is the bridge; used with ``trigger(availableNow=True)``
in tests (deterministic drain); a live deployment runs it continuously
alongside the round loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SEED_INBOX
from ..sources.tables import SnapshotTable


def ingest_seed_dropbox(
    spark: SparkSession,
    dropbox_dir: str,
    inbox_table: SnapshotTable,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch *dropbox_dir* for JSON seed files; append arrivals to the
    seed inbox. Returns the streaming query (already started)."""
    stream = (
        spark.readStream.schema(SEED_INBOX)
        .option("maxFilesPerTrigger", 64)
        .json(dropbox_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        rows = batch.where(F.col("url").isNotNull()).select(
            "url", F.coalesce("recrawl_every", F.lit(0)).alias("recrawl_every")
        )
        if not rows.isEmpty():
            inbox_table.append(rows)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
