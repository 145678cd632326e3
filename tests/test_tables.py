"""Snapshot-table layer: append/overwrite versioning, time travel,
compaction and vacuum (the Iceberg-maintenance analogs)."""

from __future__ import annotations

import os

from tor_spider_spark.schemas import SEEN
from tor_spider_spark.sources.tables import CheckpointLog, SnapshotTable


def _rows(spark, lo, hi):
    return spark.createDataFrame([(i, i % 7, 0) for i in range(lo, hi)], SEEN)


def test_append_versions_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    v1 = t.append(_rows(spark, 0, 10))
    v2 = t.append(_rows(spark, 10, 25))
    assert (v1, v2) == (1, 2)
    assert t.read(spark, v1).count() == 10
    assert t.read(spark, v2).count() == 25
    assert t.read(spark).count() == 25  # latest
    v3 = t.overwrite(_rows(spark, 0, 5))
    assert t.read(spark, v3).count() == 5
    assert t.read(spark, v2).count() == 25  # old snapshot intact


def test_compact_preserves_rows_and_shrinks_commits(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    for i in range(6):
        t.append(_rows(spark, i * 10, i * 10 + 10))
    before = sorted(map(tuple, t.read(spark).collect()))
    assert len(t._read_manifest(t.latest_version())) == 6
    v = t.compact(spark)
    assert len(t._read_manifest(v)) == 1
    assert sorted(map(tuple, t.read(spark, v).collect())) == before


def test_vacuum_removes_only_expired_commits(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    for i in range(5):
        t.append(_rows(spark, i * 10, i * 10 + 10))
    latest = t.latest_version()
    removed = t.vacuum(keep_versions=2)
    # append-only: every old commit is still referenced by the latest
    # manifest -> nothing deletable, old manifests gone
    assert removed == []
    assert t.read(spark, latest).count() == 50

    # overwrites orphan their predecessors
    t2 = SnapshotTable(str(tmp_path), "seen2", SEEN)
    for i in range(5):
        t2.overwrite(_rows(spark, 0, 10 + i))
    removed = t2.vacuum(keep_versions=2)
    assert len(removed) == 3
    assert t2.read(spark).count() == 14
    for commit in removed:
        assert not os.path.exists(commit)


def test_checkpoint_log_last(tmp_path):
    log = CheckpointLog(str(tmp_path))
    assert log.last() is None
    log.commit(0, {"seen": 1})
    log.commit(1, {"seen": 2})
    assert log.last() == {"round": 1, "versions": {"seen": 2}}
