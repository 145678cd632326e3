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


def test_claim_merge_semantics_and_delta_write_bytes(spark, tmp_path):
    """The delta-cost claim (VERDICT r3 next #1): delete claimed keys +
    append additions in one version, rewriting ONLY footer-pruned files.
    Asserts (a) row semantics equal anti-join+union, (b) untouched file
    paths are carried into the new manifest verbatim, (c) write bytes of
    the transition ∝ the claimed batch, not the table."""
    t = SnapshotTable(
        str(tmp_path), "frontier_like", SEEN, sort_col="url_hash", max_records_per_file=500
    )
    base = spark.createDataFrame([(i, i % 7, 0) for i in range(20_000)], SEEN)
    v1 = t.overwrite(base, n_buckets=4)
    table_bytes = t.version_new_bytes(v1, 0)
    n_files_v1 = sum(len(t._entry_files(e)) for e in t._read_manifest(v1))
    assert n_files_v1 >= 20  # maxRecordsPerFile really split the buckets

    claimed = spark.createDataFrame([(i,) for i in range(1000, 1050)], "url_hash long")
    adds = spark.createDataFrame([(i, i % 7, 1) for i in range(100_000, 100_020)], SEEN)
    v2 = t.claim_merge(spark, claimed, adds, parent=v1, n_buckets=4)

    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    expect = sorted((set(range(20_000)) - set(range(1000, 1050))) | set(range(100_000, 100_020)))
    assert got == expect
    # sorted+chunked files ⇒ the 50-key range claim touches few files;
    # every untouched file is the SAME path as in v1 (zero rewrite)
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    carried = [e for e in t._read_manifest(v2) if e in v1_files]
    assert len(carried) >= n_files_v1 * 0.6, (len(carried), n_files_v1)
    delta_bytes = t.version_new_bytes(v2, v1)
    assert delta_bytes < table_bytes * 0.5, (delta_bytes, table_bytes)

    # a SECOND claim on the new version keeps working (mixed dir/file
    # manifest) and an empty claim writes only the additions
    v3 = t.claim_merge(
        spark,
        spark.createDataFrame([], "url_hash long"),
        spark.createDataFrame([(200_000, 0, 2)], SEEN),
        parent=v2,
        n_buckets=4,
    )
    assert t.read(spark, v3).count() == len(expect) + 1
    assert t.version_new_bytes(v3, v2) < table_bytes * 0.05  # pure append


def test_claim_merge_write_bytes_beat_full_overwrite(spark, tmp_path):
    """Proportionality evidence for the 'done =' criterion: a small
    range-clustered claim must write a small fraction of what the legacy
    full-overwrite claim writes for the SAME logical transition. (Note
    write bytes are NOT monotone in batch size — deleting most of a file
    leaves little to rewrite — so the honest metric is delta vs
    overwrite, not small-batch vs big-batch.)"""
    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash", max_records_per_file=250
    )
    base = spark.createDataFrame([(i, i % 5, 0) for i in range(10_000)], SEEN)
    v1 = t.overwrite(base, n_buckets=4)
    empty = spark.createDataFrame([], SEEN)
    small = spark.createDataFrame([(i,) for i in range(4000, 4200)], "url_hash long")
    v2 = t.claim_merge(spark, small, empty, parent=v1, n_buckets=4)
    b_delta = t.version_new_bytes(v2, v1)
    assert t.read(spark, v2).count() == 9800
    # the legacy path: full rewrite of the anti-joined table
    legacy = t.read(spark, v1).join(small, "url_hash", "left_anti")
    v3 = t.overwrite(legacy, n_buckets=4)
    b_overwrite = t.version_new_bytes(v3, v1)
    assert b_delta < 0.35 * b_overwrite, (b_delta, b_overwrite)


def test_upsert_keys_replaces_matched_rows(spark, tmp_path):
    """Keyed delta upsert (host_state / streaming sink shape): matched
    keys replaced, new keys inserted, everything else carried untouched —
    join key (host ≙ url_hash here) may differ from the prune column."""
    from tor_spider_spark.schemas import HOST_STATE

    t = SnapshotTable(
        str(tmp_path), "hs", HOST_STATE, sort_col="host_hash", max_records_per_file=200
    )
    base = spark.createDataFrame([(f"h{i}", i, 0) for i in range(1000)], HOST_STATE)
    v1 = t.overwrite(base, n_buckets=1)
    delta = spark.createDataFrame(
        [(f"h{i}", i, 5) for i in range(10, 20)] + [("h2000", 2000, 5)], HOST_STATE
    )
    v2 = t.upsert_keys(
        spark, delta, key_cols=("host",), prune_col="host_hash", parent=v1, n_buckets=1
    )
    rows = {r["host"]: r["last_fetch_round"] for r in t.read(spark, v2).collect()}
    assert len(rows) == 1001
    assert all(rows[f"h{i}"] == 5 for i in range(10, 20))
    assert rows["h2000"] == 5
    assert rows["h0"] == 0 and rows["h999"] == 0
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    assert any(e in v1_files for e in t._read_manifest(v2))  # pruning engaged


def test_delta_guard_falls_back_before_any_collect(spark, tmp_path):
    """Above DELTA_KEYS_MAX_ROWS the delta path must fall back to the
    full rewrite — guarded on the KEY ROW COUNT before any driver-side
    collect or forced broadcast (code-review r4 finding #2) — and still
    produce the correct rows."""
    t = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="url_hash")
    t.DELTA_KEYS_MAX_ROWS = 10  # instance override for the test
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(200)], SEEN))
    keys = spark.createDataFrame([(i,) for i in range(0, 100)], "url_hash long")
    v2 = t.claim_merge(spark, keys, spark.createDataFrame([], SEEN), parent=v1)
    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert got == list(range(100, 200))
    # fallback really rewrote: no v1 file carried by path
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    assert not any(e in v1_files for e in t._read_manifest(v2))


def test_delta_null_keys_delete_nothing(spark, tmp_path):
    """NULL keys never match an equi-anti-join; the delta path must treat
    them the same — not crash sorting None against ints (code-review r4
    finding #5)."""
    t = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="url_hash")
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(50)], SEEN))
    keys = spark.createDataFrame([(None,), (7,)], "url_hash long")
    v2 = t.claim_merge(spark, keys, spark.createDataFrame([], SEEN), parent=v1)
    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert got == [i for i in range(50) if i != 7]


def test_delta_null_prune_value_still_deletes_matchable_key(spark, tmp_path):
    """When prune_col differs from the join key, a NULL prune value on a
    key whose join column can still match table rows must not skip the
    delete (code-review r4 pass-2 finding #2): pruning degrades to
    touch-all, semantics stay equal to the legacy anti-join."""
    t = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="host_hash")
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(50)], SEEN))
    # key (url_hash=7, host_hash=NULL): join on url_hash matches row 7
    keys = spark.createDataFrame([(7, None)], "url_hash long, host_hash long")
    v2 = t._delta(spark, keys, ["url_hash"], "host_hash",
                  spark.createDataFrame([], SEEN), v1, None)
    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert got == [i for i in range(50) if i != 7]


def test_delta_saturated_pruning_falls_back_to_overwrite(spark, tmp_path):
    """Adaptive fallback (VERDICT r4 missing #3): a scattered-key claim
    whose keys range-match > DELTA_TOUCHED_FRACTION_MAX of the files must
    take the single-commit overwrite — write bytes ≈ the legacy
    overwrite, NOT overwrite + carried-path bookkeeping + extra commit."""
    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash",
        max_records_per_file=100, range_partition=True,
    )
    base = spark.createDataFrame([(i, i % 7, 0) for i in range(2000)], SEEN)
    v1 = t.overwrite(base, n_buckets=8)
    n_files_v1 = sum(len(t._entry_files(e)) for e in t._read_manifest(v1))
    assert n_files_v1 >= 10
    # every 10th key across the whole range: lands in every ~100-row file
    keys = spark.createDataFrame([(i,) for i in range(0, 2000, 10)], "url_hash long")
    v2 = t.claim_merge(spark, keys, spark.createDataFrame([], SEEN),
                       parent=v1, n_buckets=8)
    manifest = t._read_manifest(v2)
    assert len(manifest) == 1, manifest  # single commit: the overwrite shape
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    assert not any(e in v1_files for e in manifest)
    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert got == [i for i in range(2000) if i % 10 != 0]
    # bytes of the transition ≈ an explicit legacy overwrite of the same rows
    b_fallback = t.version_new_bytes(v2, v1)
    v3 = t.overwrite(t.read(spark, v2), n_buckets=8)
    b_overwrite = t.version_new_bytes(v3, v2)
    assert b_fallback < 1.25 * b_overwrite, (b_fallback, b_overwrite)


def test_delta_skips_empty_commits(spark, tmp_path):
    """ADVICE r4 #3: quiet rounds (empty keys + empty additions, or a
    delete that empties every touched file) must not grow the manifest
    with empty commit dirs."""
    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash", max_records_per_file=200
    )
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(1000)], SEEN))
    empty = spark.createDataFrame([], SEEN)
    no_keys = spark.createDataFrame([], "url_hash long")
    # nothing claimed, nothing added: a true no-op — NO version bump at
    # all (code-review r5 #2: one identical-file-list manifest per quiet
    # round otherwise accrues forever under the keep-all vacuum default),
    # and no manifest file written for a version past v1
    v2 = t.claim_merge(spark, no_keys, empty, parent=v1)
    assert v2 == v1
    assert t.latest_version() == v1
    assert t._read_manifest(v2) == t._read_manifest(v1)
    # quiet round with ORPHANS past the pinned parent (crashed run wrote
    # v2'): the bump doubles as the fence — compact() reads
    # latest_version(), so the no-op skip must NOT apply here
    orphan_keys = spark.createDataFrame([(0,)], "url_hash long")
    v_orphan = t.claim_merge(spark, orphan_keys, empty, parent=v1)
    assert v_orphan > v1
    v_fenced = t.claim_merge(spark, no_keys, empty, parent=v1)
    assert v_fenced > v_orphan  # supersedes the orphan
    assert t.read(spark, v_fenced).count() == 1000  # orphan delete fenced out
    v2 = v_fenced
    # a claim that empties its touched files entirely: neither an empty
    # rewritten commit nor an empty additions commit may appear
    all_keys = spark.createDataFrame([(i,) for i in range(0, 200)], "url_hash long")
    v3 = t.claim_merge(spark, all_keys, empty, parent=v2)
    for entry in t._read_manifest(v3):
        import pyarrow.parquet as pq

        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in t._entry_files(entry))
        assert rows > 0, f"empty commit {entry} in manifest"
    assert t.read(spark, v3).count() == 800


def test_delta_advisory_hint_violation_falls_back(spark, tmp_path):
    """ADVICE r4 #1: keys_rows_hint is advisory — an underestimate must
    not produce an unbounded prune-value collect or a forced broadcast of
    an oversized key set; overflow of the limit-bounded collect proves
    the violation and takes the full rewrite."""
    t = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="url_hash")
    t.DELTA_KEYS_MAX_ROWS = 10  # instance override for the test
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(200)], SEEN))
    keys = spark.createDataFrame([(i,) for i in range(0, 50)], "url_hash long")
    # lying hint: 5 claimed, actually 50 distinct keys (> MAX=10)
    v2 = t.claim_merge(spark, keys, spark.createDataFrame([], SEEN),
                       parent=v1, keys_rows_hint=5)
    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert got == list(range(50, 200))
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    assert not any(e in v1_files for e in t._read_manifest(v2))  # full rewrite


def test_delta_hint_violation_with_collapsed_prune_values(spark, tmp_path):
    """The r4 residual: a lying hint whose oversized key set collapses
    onto FEW distinct prune values used to slip past the distinct-value
    guard and force-broadcast the whole key set. The grouped collect's
    counts sum to the exact key-row count, so this shape now falls back
    to the full rewrite too."""
    t = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="url_hash")
    t.DELTA_KEYS_MAX_ROWS = 10  # instance override for the test
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(200)], SEEN))
    # 50 key ROWS over only 3 distinct host_hash prune values (≤ MAX=10)
    keys = spark.createDataFrame([(i, i % 3) for i in range(0, 50)],
                                 "url_hash long, host_hash long")
    v2 = t.claim_merge(spark, keys, spark.createDataFrame([], SEEN),
                       prune_col="host_hash", parent=v1, keys_rows_hint=5)
    got = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert got == list(range(50, 200))
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    assert not any(e in v1_files for e in t._read_manifest(v2))  # full rewrite


def test_upsert_duplicate_source_keys_collapse(spark, tmp_path):
    """ADVICE r4 #2: duplicate source keys collapse to one row — the
    shared semantics with Iceberg MERGE INTO (which would abort) after
    both backends dropDuplicates the incoming batch."""
    from tor_spider_spark.schemas import HOST_STATE

    t = SnapshotTable(str(tmp_path), "hs", HOST_STATE, sort_col="host_hash")
    v1 = t.overwrite(spark.createDataFrame([("h1", 1, 0), ("h2", 2, 0)], HOST_STATE))
    dup = spark.createDataFrame([("h1", 1, 5), ("h1", 1, 6), ("h3", 3, 5)], HOST_STATE)
    v2 = t.upsert_keys(spark, dup, key_cols=("host",), prune_col="host_hash", parent=v1)
    rows = t.read(spark, v2).collect()
    hosts = sorted(r["host"] for r in rows)
    assert hosts == ["h1", "h2", "h3"], hosts  # exactly one row per key
    h1 = next(r for r in rows if r["host"] == "h1")
    assert h1["last_fetch_round"] in (5, 6)  # one of the dups, not both


def test_compact_and_vacuum_under_delta_claims(spark, tmp_path):
    """Compaction-under-delta (VERDICT r4 next #6, snapshot backend):
    compact() while the manifest carries individual FILES of older
    commits must fold them into one commit; vacuum afterwards removes the
    now-dead originals; further delta claims keep working."""
    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash",
        max_records_per_file=200, range_partition=True,
    )
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(2000)], SEEN), n_buckets=4)
    k1 = spark.createDataFrame([(i,) for i in range(0, 100)], "url_hash long")
    v2 = t.claim_merge(spark, k1, spark.createDataFrame([(9001, 0, 1)], SEEN),
                       parent=v1, n_buckets=4)
    assert any(not os.path.isdir(e) for e in t._read_manifest(v2))  # carried files
    v3 = t.compact(spark, n_buckets=4)
    assert len(t._read_manifest(v3)) == 1
    expect = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    assert sorted(r[0] for r in t.read(spark, v3).select("url_hash").collect()) == expect
    removed = t.vacuum(keep_versions=1)
    assert removed  # pre-compaction commits are dead now
    k2 = spark.createDataFrame([(i,) for i in range(100, 150)], "url_hash long")
    v4 = t.claim_merge(spark, k2, spark.createDataFrame([], SEEN), parent=v3, n_buckets=4)
    got = sorted(r[0] for r in t.read(spark, v4).select("url_hash").collect())
    assert got == [i for i in range(150, 2000)] + [9001]


def test_vacuum_partially_live_commit_dirs(spark, tmp_path):
    """After a delta claim, old commit DIRS are partially live (some files
    carried by name into newer manifests). vacuum must delete only the
    dead files and keep every live one readable."""
    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash", max_records_per_file=300
    )
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(3000)], SEEN))
    claimed = spark.createDataFrame([(i,) for i in range(0, 300)], "url_hash long")
    v2 = t.claim_merge(spark, claimed, spark.createDataFrame([], SEEN), parent=v1)
    expect = sorted(r[0] for r in t.read(spark, v2).select("url_hash").collect())
    removed = t.vacuum(keep_versions=1)  # expire v1
    assert removed, "the claimed-range files of v1 are dead and removable"
    got = sorted(r[0] for r in t.read(spark, t.latest_version()).select("url_hash").collect())
    assert got == expect == sorted(range(300, 3000))


def test_checkpoint_log_last(tmp_path):
    log = CheckpointLog(str(tmp_path))
    assert log.last() is None
    log.commit(0, {"seen": 1})
    log.commit(1, {"seen": 2})
    assert log.last() == {"round": 1, "versions": {"seen": 2}}


def test_stats_sidecar_serves_prune_and_rowcount(spark, tmp_path, monkeypatch):
    """r5: _write_commit records per-file rows + sort-col rowgroup ranges
    in a _stats.json sidecar, so the per-round consumers (row_count, the
    claim's file pruning) cost one JSON read per commit dir instead of
    one parquet footer read per FILE — the O(files) driver pass that
    dominates the claim at the 10^10 design point."""
    import pyarrow.parquet as pq

    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash",
        max_records_per_file=250, range_partition=True,
    )
    v1 = t.overwrite(spark.createDataFrame([(i, i % 5, 0) for i in range(10_000)], SEEN), n_buckets=4)
    (commit,) = t._read_manifest(v1)
    assert os.path.isfile(os.path.join(commit, SnapshotTable.STATS_NAME))

    # a FRESH table object (empty cache), footers made unreadable: every
    # read-only consumer must be served entirely by the sidecar
    t2 = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="url_hash")

    def _boom(*a, **k):
        raise AssertionError("parquet footer read despite stats sidecar")

    vals = [10, 260, 9_999]  # spans several 250-row files
    with monkeypatch.context() as m:
        m.setattr(pq, "ParquetFile", _boom)
        assert t2.row_count(v1) == 10_000
        untouched_sc, touched_sc = t2._prune_entries(
            t2._read_manifest(v1), "url_hash", sorted(vals)
        )
    assert touched_sc and untouched_sc  # pruning engaged, not all-touched

    # parity: deleting the sidecar falls back to footers with IDENTICAL
    # prune decisions (pre-sidecar tables keep working)
    os.remove(os.path.join(commit, SnapshotTable.STATS_NAME))
    t3 = SnapshotTable(str(tmp_path), "f", SEEN, sort_col="url_hash")
    untouched_ft, touched_ft = t3._prune_entries(
        t3._read_manifest(v1), "url_hash", sorted(vals)
    )
    assert (sorted(untouched_sc), sorted(touched_sc)) == (
        sorted(untouched_ft), sorted(touched_ft),
    )
    assert t3.row_count(v1) == 10_000  # footer fallback


def test_stats_encoder_roundtrip():
    """Sidecar stat values survive JSON: int64 hashes, timestamps
    (streaming sink prunes on hour), bytes; unsupported types degrade to
    None (= unknown range → file touched), never to a wrong range."""
    import datetime
    import json as _json

    enc, dec = SnapshotTable._enc_stat, SnapshotTable._dec_stat
    ts = datetime.datetime(2026, 8, 17, 12, 34, 56, 789000)
    for v in (-(2**63), 2**63 - 1, 0, 3.5, "abc", ts, b"\x00\xff"):
        assert dec(_json.loads(_json.dumps(enc(v)))) == v
    assert enc(True) is None  # bool is not a range-comparable stat
    assert enc(object()) is None


def test_torn_stats_sidecar_never_deletes_data(spark, tmp_path, monkeypatch):
    """code-review r5 #3: _commit_if_nonempty must NOT read an
    unreadable/missing stats sidecar as 'zero rows' — a torn read right
    after the write would rmtree a commit that holds the round's rows
    (silent data loss). Contract: sidecar unreadable → footer fallback,
    same as every other sidecar consumer."""
    t = SnapshotTable(
        str(tmp_path), "f", SEEN, sort_col="url_hash", max_records_per_file=200
    )
    v1 = t.overwrite(spark.createDataFrame([(i, i % 3, 0) for i in range(500)], SEEN))

    # every subsequent sidecar read returns None (torn/unreadable)
    monkeypatch.setattr(SnapshotTable, "_load_stats", lambda self, d: None)

    adds = spark.createDataFrame([(10_000 + i, 0, 1) for i in range(100)], SEEN)
    v2 = t.append(adds, parent=v1)
    assert v2 > v1
    assert t.read(spark, v2).count() == 600  # footer fallback kept the rows

    # and an actually-empty commit is still dropped by the footer path
    v3 = t.append(spark.createDataFrame([], SEEN), parent=v2)
    assert t.read(spark, v3).count() == 600
    for entry in t._read_manifest(v3):
        import pyarrow.parquet as pq

        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in t._entry_files(entry))
        assert rows > 0, f"empty commit {entry} in manifest"


def test_stats_cache_bounded_and_evicted_on_vacuum(spark, tmp_path, monkeypatch):
    """r5 review: the driver-side sidecar cache must not grow O(commit
    dirs) for the table object's lifetime (that re-imports the O(files)
    driver cost the sidecars removed, as RAM), and vacuum must drop the
    entries of the commit dirs it deletes."""
    t = SnapshotTable(str(tmp_path), "seen", SEEN)
    monkeypatch.setattr(SnapshotTable, "STATS_CACHE_MAX_DIRS", 3)
    for i in range(6):
        t.append(_rows(spark, i * 10, i * 10 + 10))
    entries = t._read_manifest(t.latest_version())
    for e in entries:
        t._load_stats(e)
    assert len(t._stats_cache) <= 3  # FIFO-bounded, never above the cap
    # evicted dirs re-load correctly from their sidecar on next use
    assert t._load_stats(entries[0])  # per-file records, non-empty

    t.overwrite(_rows(spark, 0, 5))
    removed = t.vacuum(keep_versions=1)
    assert removed
    for dead in removed:
        key = dead if os.path.isdir(dead) or not dead.endswith(".parquet") else os.path.dirname(dead)
        assert key not in t._stats_cache  # no stale entry for a dead dir
