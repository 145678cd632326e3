"""Scan-parallelism helper (optimization guide §2.5 "input skew").

The driver's document/embedding tables arrive as ONE small parquet file
(a few MB compressed), which Spark scans as 1-2 input partitions — below
any row-group boundary the scan cannot split further.  Operators that
EXPLODE that input (shingling, token explode, per-pair similarity) then
run their whole map side at file parallelism: measured at sf1.0, the
shingle self-join of dedup_ngram_jaccard processed 256M joined rows on
2 cores of 32 (BENCH_r05: 239 s).

``spread_input`` round-robin repartitions such inputs up to the session's
core count — scale-adaptively: if the input already has at least that
many partitions (the 100 TB case: thousands of files), it is a no-op, so
no shuffle is ever added where the scan is already parallel.  Keyless
repartition is deterministic under task retries (Spark sorts before
round-robin partitioning — SPARK-23207)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition *df* to ``defaultParallelism`` unless its file count
    already provides that much scan parallelism.  *min_factor* multiplies
    the target for stages whose per-row work is extremely uneven (rarely
    needed — AQE handles post-shuffle skew; this only fixes the SCAN
    side).

    The already-parallel check counts input FILES (≈ free) rather than
    asking the RDD for its partition count: compiling the physical plan
    just to count partitions measured 0.15-0.9 s per call.  File count
    under-counts partitions for huge splittable files, in which case the
    repartition is merely redundant (one extra shuffle of an input that
    has its own parallelism), never wrong; non-file inputs (in-memory
    test frames) count as 0 files and are spread."""
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism * min_factor, 4)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
