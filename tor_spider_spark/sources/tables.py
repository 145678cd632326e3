"""Versioned snapshot tables over parquet — the sandbox stand-in for Iceberg.

The north rule asks for Iceberg tables with round-atomic commits, snapshot
time travel for deterministic resume, and bucket(host_hash) partitioning.
This container ships no Iceberg runtime jar, so this module provides the
same *semantics* on plain parquet:

- a table is a directory: ``data/`` holds immutable parquet commit dirs,
  ``manifests/v{n}.json`` lists which commit dirs a version comprises;
- ``append`` writes a new commit dir and a manifest = old files + new
  (no rewrite of existing data — same shape as an Iceberg append);
- ``overwrite`` writes a manifest pointing only at the new commit;
- readers pin an explicit version (time travel); the ``CheckpointLog``
  records, per round, every table's version — the checkpoint file IS the
  atomic commit point for the round (write temp + rename), so a killed
  job resumes from the last fully-committed round with no torn state.

On a real cluster every call here maps 1:1 onto an Iceberg operation
(append → ``writeTo(...).append()``, overwrite → ``overwritePartitions``,
version pin → ``VERSION AS OF``); only this module changes.

Bucketing: writers repartition by ``pmod(host_hash, n_buckets)`` before
writing, mirroring Iceberg's ``bucket(B, host_hash)`` transform
(SURVEY §4.4) so same-bucket joins co-locate.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, root: str, name: str, schema: StructType):
        self.root = os.path.join(root, name)
        self.name = name
        self.schema = schema
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "manifests"), exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "manifests", f"v{version:06d}.json")

    def latest_version(self) -> int:
        versions = [
            int(f[1:-5])
            for f in os.listdir(os.path.join(self.root, "manifests"))
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def _read_manifest(self, version: int) -> list[str]:
        if version == 0:
            return []
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)["files"]

    def _write_manifest(self, version: int, files: list[str]) -> None:
        tmp = self._manifest_path(version) + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
        os.replace(tmp, self._manifest_path(version))

    # -- I/O -------------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        files = self._read_manifest(v)
        if not files:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*files)

    def _write_commit(self, df: DataFrame, n_buckets: int | None) -> str:
        commit = os.path.join(self.root, "data", uuid.uuid4().hex[:12])
        if n_buckets and "host_hash" in df.columns:
            # bucket(B, host_hash) analog: co-locates frontier/seen joins
            df = df.repartition(n_buckets, F.pmod(F.col("host_hash"), F.lit(n_buckets)))
        df.write.parquet(commit)
        return commit

    def append(self, df: DataFrame, n_buckets: int | None = None, parent: int | None = None) -> int:
        """New version = *parent*'s files + one new commit dir.

        ``parent`` MUST be the checkpoint-pinned version when appends can
        race a crash: versions written after the last committed checkpoint
        are orphans (the round never committed), and building on
        ``latest_version()`` would fold their commit dirs into the new
        manifest — permanently duplicating rows on resume. Defaults to
        latest for standalone (non-checkpointed) use."""
        commit = self._write_commit(df.select([f.name for f in self.schema.fields]), n_buckets)
        base = self.latest_version() if parent is None else parent
        v = self.latest_version() + 1
        self._write_manifest(v, self._read_manifest(base) + [commit])
        return v

    def overwrite(self, df: DataFrame, n_buckets: int | None = None) -> int:
        """New version referencing only the new commit (atomic snapshot swap
        — the claim step's DeleteMany analog, SURVEY §2.1 S6)."""
        commit = self._write_commit(df.select([f.name for f in self.schema.fields]), n_buckets)
        v = self.latest_version() + 1
        self._write_manifest(v, [commit])
        return v

    def row_count(self, version: int | None = None) -> int:
        """Exact row count of a version from parquet FOOTER metadata —
        driver-side file reads only, no Spark job. Used as the scheduler's
        small-round hint (politeness._global_rank picks the single-pass
        top-k path when the frontier is actually small, instead of paying
        the range-sample + offsets passes sized for round_limit)."""
        import pyarrow.parquet as pq

        total = 0
        for commit in self._read_manifest(
            self.latest_version() if version is None else version
        ):
            for f in os.listdir(commit):
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(commit, f)).metadata.num_rows
        return total

    def has_new(self, consumed: int, latest: int) -> bool:
        """True iff *latest* holds rows not yet consumed. SnapshotTable
        versions are monotonic integers, so ordering is meaningful here;
        IcebergTable overrides this with an inequality test (its snapshot
        ids are random longs)."""
        return latest > consumed

    def read_new(self, spark: SparkSession, since: int, upto: int | None = None) -> DataFrame:
        """Rows appended after version *since*, up to *upto* (default
        latest): the manifest-file diff — incremental-scan analog of
        Iceberg's changelog read, used to drain the seed inbox."""
        v = self.latest_version() if upto is None else upto
        base = set(self._read_manifest(since)) if since > 0 else set()
        fresh = [f for f in self._read_manifest(v) if f not in base]
        if not fresh:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*fresh)

    # -- maintenance (Iceberg rewrite_data_files / expire_snapshots analogs) --
    def compact(self, spark: SparkSession, n_buckets: int | None = None) -> int:
        """Rewrite the current version's many commit dirs (one per append —
        the small-file problem at round counts in the hundreds) into a
        single commit. Readers pinned to old versions are unaffected; the
        new version is equivalent row-for-row."""
        return self.overwrite(self.read(spark), n_buckets)

    def vacuum(self, keep_versions: int = 3) -> list[str]:
        """Delete data commits referenced ONLY by expired versions (older
        than the newest *keep_versions*). Time travel keeps working for
        retained versions — resume safety requires keep_versions >= the
        deepest checkpoint still live. Returns removed commit dirs."""
        import shutil

        latest = self.latest_version()
        keep_cut = max(latest - keep_versions + 1, 1)
        live: set[str] = set()
        for v in range(keep_cut, latest + 1):
            if os.path.exists(self._manifest_path(v)):
                live.update(self._read_manifest(v))
        removed = []
        for v in range(1, keep_cut):
            # earlier vacuums already deleted their manifests — skip, so a
            # second vacuum of the same table is a no-op, not a crash
            if not os.path.exists(self._manifest_path(v)):
                continue
            for commit in self._read_manifest(v):
                if commit not in live and os.path.isdir(commit):
                    shutil.rmtree(commit, ignore_errors=True)
                    removed.append(commit)
            os.remove(self._manifest_path(v))
        return removed


class CheckpointLog:
    """Round-atomic commit record (SURVEY §4.3.3): one JSON file per round
    naming every table's pinned version. Written temp+rename AFTER all
    table writes for the round succeed; resume reads the highest round
    file and time-travels each table to the recorded version."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def commit(self, round_no: int, versions: dict[str, int], extra: dict | None = None) -> None:
        payload = {"round": round_no, "versions": versions, **(extra or {})}
        tmp = os.path.join(self.dir, f".tmp{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, os.path.join(self.dir, f"round_{round_no:06d}.json"))

    def last(self) -> dict | None:
        rounds = sorted(f for f in os.listdir(self.dir) if f.startswith("round_"))
        if not rounds:
            return None
        with open(os.path.join(self.dir, rounds[-1])) as fh:
            return json.load(fh)
