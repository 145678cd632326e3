"""Real-Iceberg backend behind a feature flag (VERDICT r1 #7).

``SnapshotTable`` (tables.py) is the sandbox stand-in — this module is the
1:1 mapping it documents, usable whenever an Iceberg runtime jar and a
configured Spark catalog are present:

- append        → ``df.writeTo(ident).append()``             (same commit shape)
- overwrite     → ``df.writeTo(ident).createOrReplace()``    (snapshot swap)
- version pin   → ``VERSION AS OF <snapshot_id>``            (time travel)
- parent pin    → ``rollback_to_snapshot`` before re-append   (orphan fencing)
- bucketing     → ``PARTITIONED BY (bucket(B, host_hash))``   (real transform:
                  storage-partitioned joins remove the host_hash exchange)
- compact       → ``rewrite_data_files``; vacuum → ``expire_snapshots``

The container used for development ships no Iceberg jar, so the suite in
tests/test_iceberg.py carries a skip marker keyed on ``iceberg_available``;
on a cluster with ``--packages org.apache.iceberg:iceberg-spark-runtime-*``
and ``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`` the
same tests run against this backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "local_iceberg") -> bool:
    """True iff an Iceberg SparkCatalog class is on the classpath AND the
    named catalog is configured on this session."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}") is not None
    except Exception:
        return False


class IcebergTable:
    """Same surface as sources.tables.SnapshotTable, over a real Iceberg
    catalog. Versions are Iceberg snapshot ids (0 = empty table)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        name: str,
        schema,
        n_buckets: int | None = None,
    ):
        self.spark = spark
        self.name = name
        self.schema = schema
        self.ident = f"{catalog}.crawl.{name}"
        self.catalog = catalog
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.crawl")
        if not spark.catalog.tableExists(self.ident):
            ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
            part = (
                f" PARTITIONED BY (bucket({n_buckets}, host_hash))"
                if n_buckets and any(f.name == "host_hash" for f in schema.fields)
                else ""
            )
            spark.sql(f"CREATE TABLE {self.ident} ({ddl}) USING iceberg{part}")

    # -- version bookkeeping (snapshot ids) ---------------------------------
    def latest_version(self) -> int:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else 0

    def _rollback(self, snapshot_id: int) -> None:
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot('{self.ident}', {snapshot_id})"
        )

    # -- I/O -----------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        if version == 0:
            return spark.createDataFrame([], self.schema)
        if version is None:
            return spark.table(self.ident)
        return spark.read.option("snapshot-id", version).table(self.ident)

    def append(self, df: DataFrame, n_buckets: int | None = None, parent: int | None = None) -> int:
        # orphan fencing ≙ SnapshotTable parent pinning: snapshots written
        # after the checkpoint-pinned parent (a crash mid-round) are rolled
        # back before the re-run's append lands
        if parent is not None and parent != self.latest_version():
            if parent == 0:
                self.spark.sql(f"DELETE FROM {self.ident} WHERE true")
            else:
                self._rollback(parent)
        df.select([f.name for f in self.schema.fields]).writeTo(self.ident).append()
        return self.latest_version()

    def overwrite(self, df: DataFrame, n_buckets: int | None = None) -> int:
        from pyspark.sql import functions as F

        # full-snapshot replace (SnapshotTable.overwrite semantics): an
        # unconditional overwrite, NOT overwritePartitions (which replaces
        # only the partitions present in df)
        df.select([f.name for f in self.schema.fields]).writeTo(self.ident).overwrite(
            F.lit(True)
        )
        return self.latest_version()

    # -- maintenance ----------------------------------------------------------
    def compact(self, spark: SparkSession, n_buckets: int | None = None) -> int:
        spark.sql(f"CALL {self.catalog}.system.rewrite_data_files('{self.ident}')")
        return self.latest_version()

    def vacuum(self, keep_versions: int = 3) -> list:
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots(table => '{self.ident}', "
            f"retain_last => {keep_versions})"
        )
        return []
