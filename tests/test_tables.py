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


def test_vacuum_twice_is_idempotent(spark, tmp_path):
    """Second vacuum must skip manifests the first one already deleted
    (regression: FileNotFoundError on re-invocation)."""
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    for i in range(5):
        t.overwrite(_rows(spark, 0, 10 + i))
    first = t.vacuum(keep_versions=2)
    assert len(first) == 3
    second = t.vacuum(keep_versions=2)  # must not raise
    assert second == []
    t.overwrite(_rows(spark, 0, 3))
    third = t.vacuum(keep_versions=2)  # keeps working after new writes
    assert len(third) == 1
    assert t.read(spark).count() == 3


def test_append_pins_parent_version(spark, tmp_path):
    """append(parent=) must build the manifest from the pinned parent, so
    orphan versions written after a crash never leak into later manifests."""
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    v1 = t.append(_rows(spark, 0, 10))
    # crash scenario: an uncommitted (orphan) append lands after v1
    orphan = t.append(_rows(spark, 100, 110), parent=v1)
    assert orphan == 2
    # resume re-runs the round against the pinned parent v1 — the orphan's
    # commit dir must NOT be folded in
    v3 = t.append(_rows(spark, 100, 110), parent=v1)
    assert v3 == 3
    got = sorted(r[0] for r in t.read(spark, v3).select("url_hash").collect())
    assert got == sorted(list(range(10)) + list(range(100, 110)))  # no dup 100s


def test_read_new_returns_manifest_diff(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    v1 = t.append(_rows(spark, 0, 10))
    assert t.read_new(spark, since=v1).count() == 0
    v2 = t.append(_rows(spark, 10, 15))
    t.append(_rows(spark, 15, 18))
    assert sorted(r[0] for r in t.read_new(spark, since=v1, upto=v2).collect()) == list(
        range(10, 15)
    )
    assert t.read_new(spark, since=v1).count() == 8
    assert t.read_new(spark, since=0).count() == 18


def test_checkpoint_log_last(tmp_path):
    log = CheckpointLog(str(tmp_path))
    assert log.last() is None
    log.commit(0, {"seen": 1})
    log.commit(1, {"seen": 2})
    assert log.last() == {"round": 1, "versions": {"seen": 2}}
