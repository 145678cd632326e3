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
- ``claim_merge``/``upsert_keys`` (r4) delete/replace keyed rows at
  DELTA cost: untouched parquet files are carried into the new manifest
  by PATH, only footer-pruned files rewrite (Iceberg merge-on-read
  DELETE / MERGE INTO analog — see IcebergTable);
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
    def __init__(
        self,
        root: str,
        name: str,
        schema: StructType,
        sort_col: str | tuple[str, ...] | None = None,
        max_records_per_file: int = 0,
        range_partition: bool = False,
    ):
        self.root = os.path.join(root, name)
        self.name = name
        self.schema = schema
        # clustering knobs for the delta-claim path (claim_merge /
        # upsert_keys): sorting commits on the claim key gives parquet
        # files/rowgroups NARROW min-max ranges on it, and
        # maxRecordsPerFile splits each sorted bucket partition into
        # consecutive chunks — together they make the footer-stat file
        # pruning effective (Iceberg analog: write.sort-order + target
        # file size). Defaults off: at fixture scale one file per bucket
        # is right; the 10^10 deployment sets max_records_per_file so a
        # claim batch touches O(batch) files, not O(table).
        self.sort_col = (sort_col,) if isinstance(sort_col, str) else sort_col
        self.max_records_per_file = max_records_per_file
        # range_partition: commits repartitionByRange(sort_col) instead of
        # hash-bucketing, so file min-max ranges on the claim key tile the
        # key space ONCE globally. Hash-bucketed files each tile the FULL
        # range (a bucket's keys are uniform over int64), so any claimed
        # key range-matches one file in EVERY bucket and min-max pruning
        # degrades ×n_buckets (measured: 8 claimed hosts touched 66/505
        # bucket-sorted files vs ≤16 range-partitioned — BENCH/
        # delta_claim.json). Plain parquet gains nothing from hash buckets
        # anyway (no storage-partitioned joins without a metastore); the
        # real-Iceberg backend keeps bucket(B, host_hash) and prunes from
        # its own column-stats metadata instead.
        self.range_partition = range_partition
        # per-commit-dir stats sidecars, loaded at most once per table
        # object (commit dirs are immutable after _write_commit)
        self._stats_cache: dict[str, dict | None] = {}
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
        if (
            self.range_partition
            and n_buckets
            and self.sort_col
            and all(c in df.columns for c in self.sort_col)
        ):
            df = df.repartitionByRange(n_buckets, *[F.col(c) for c in self.sort_col])
        elif n_buckets and "host_hash" in df.columns:
            # bucket(B, host_hash) analog: co-locates frontier/seen joins
            df = df.repartition(n_buckets, F.pmod(F.col("host_hash"), F.lit(n_buckets)))
        if self.sort_col and all(c in df.columns for c in self.sort_col):
            df = df.sortWithinPartitions(*self.sort_col)
        writer = df.write
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", self.max_records_per_file)
        writer.parquet(commit)
        self._write_stats(commit)
        return commit

    STATS_NAME = "_stats.json"

    @staticmethod
    def _enc_stat(v):
        import base64
        import datetime

        if isinstance(v, bool) or v is None:
            return None  # no meaningful range → rowgroup counts as a hit
        if isinstance(v, (int, float, str)):
            return v
        if isinstance(v, datetime.datetime):
            return {"__dt__": v.isoformat()}
        if isinstance(v, bytes):
            return {"__b64__": base64.b64encode(v).decode("ascii")}
        return None

    @staticmethod
    def _dec_stat(v):
        import base64
        import datetime

        if isinstance(v, dict):
            if "__dt__" in v:
                return datetime.datetime.fromisoformat(v["__dt__"])
            if "__b64__" in v:
                return base64.b64decode(v["__b64__"])
            return None
        return v

    def _write_stats(self, commit: str) -> None:
        """Record each data file's row count and (for the sort columns —
        the pruning candidates) per-rowgroup min-max in a ``_stats.json``
        sidecar, read ONCE from the footers the moment the commit is
        written. Per-round consumers (`_prune_entries`, `row_count`,
        `_commit_if_nonempty`) then cost one JSON read per commit dir
        instead of one parquet footer read per FILE — at the 10^10 design
        point (~10^7 files) the per-round footer pass is the claim's
        dominant driver-side cost. Iceberg analog: per-manifest column
        stats (lower/upper bounds) serving metadata-only scan planning."""
        import pyarrow.parquet as pq

        cols = tuple(self.sort_col or ())
        files: dict[str, dict] = {}
        for f in sorted(os.listdir(commit)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(commit, f)).metadata
            entry: dict = {"rows": md.num_rows, "cols": {}}
            if md.num_row_groups > 0:
                idx = {
                    md.row_group(0).column(j).path_in_schema: j
                    for j in range(md.num_columns)
                }
                for c in cols:
                    j = idx.get(c)
                    if j is None:
                        entry["cols"][c] = None  # column absent → touched
                        continue
                    ranges = []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(j).statistics
                        if st is None or not st.has_min_max:
                            ranges.append(None)
                        else:
                            ranges.append(
                                [self._enc_stat(st.min), self._enc_stat(st.max)]
                            )
                    entry["cols"][c] = ranges
            else:
                for c in cols:
                    entry["cols"][c] = []  # empty file: nothing to delete
            files[f] = entry
        tmp = os.path.join(commit, self.STATS_NAME + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"files": files}, fh)
        os.replace(tmp, os.path.join(commit, self.STATS_NAME))

    # bound on _stats_cache entries: commit dirs past this are re-read
    # from their sidecar on next use (one JSON read — cheap) instead of
    # pinned in driver RAM forever. At the 10^10 design point a
    # keep-it-all cache would hold O(files) range dicts — the same
    # O(files) driver cost the sidecars were built to remove, as memory.
    STATS_CACHE_MAX_DIRS = 4096

    def _load_stats(self, commit_dir: str) -> dict | None:
        cached = self._stats_cache.get(commit_dir, False)
        if cached is not False:
            return cached
        path = os.path.join(commit_dir, self.STATS_NAME)
        stats = None
        if os.path.isfile(path):
            try:
                with open(path) as fh:
                    stats = json.load(fh)["files"]
            except (OSError, ValueError, KeyError):
                stats = None  # unreadable sidecar → footer fallback
        while len(self._stats_cache) >= self.STATS_CACHE_MAX_DIRS:
            # FIFO eviction (insertion-ordered dict): old commit dirs are
            # the ones compaction/vacuum retire first anyway
            self._stats_cache.pop(next(iter(self._stats_cache)))
        self._stats_cache[commit_dir] = stats
        return stats

    def _file_meta(self, path: str) -> dict | None:
        """The sidecar record for one data file ({"rows": n, "cols":
        {...}}), or None when the file predates the sidecar (pre-r5
        tables, foreign files) — callers fall back to its footer."""
        stats = self._load_stats(os.path.dirname(path))
        if stats is None:
            return None
        return stats.get(os.path.basename(path))

    @staticmethod
    def _entry_files(entry: str) -> list[str]:
        """Manifest entries are commit DIRS (append/overwrite) or single
        parquet FILE paths (untouched files carried through a delta
        claim). Expand either to concrete parquet files."""
        if os.path.isdir(entry):
            return [
                os.path.join(entry, f)
                for f in sorted(os.listdir(entry))
                if f.endswith(".parquet")
            ]
        return [entry]

    def append(self, df: DataFrame, n_buckets: int | None = None, parent: int | None = None) -> int:
        """New version = *parent*'s files + one new commit dir; an EMPTY
        batch in the no-orphan steady state is a no-op (returns *parent*,
        no manifest bump — ADVICE r4 #3).

        ``parent`` MUST be the checkpoint-pinned version when appends can
        race a crash: versions written after the last committed checkpoint
        are orphans (the round never committed), and building on
        ``latest_version()`` would fold their commit dirs into the new
        manifest — permanently duplicating rows on resume. Defaults to
        latest for standalone (non-checkpointed) use."""
        base = self.latest_version() if parent is None else parent
        new_entries = list(self._read_manifest(base))
        n_carried = len(new_entries)
        self._commit_if_nonempty(
            df.select([f.name for f in self.schema.fields]), n_buckets, new_entries
        )
        if len(new_entries) == n_carried and base == self.latest_version():
            # quiet round (nothing to append — all-dup or end-game rounds
            # hit this on seen/pages every round): no manifest bump. Only
            # in the no-orphan steady state — see _delta_apply's skip.
            return base
        v = self.latest_version() + 1
        self._write_manifest(v, new_entries)
        return v

    def overwrite(self, df: DataFrame, n_buckets: int | None = None) -> int:
        """New version referencing only the new commit (atomic snapshot
        swap). Since r4 the claim step uses :meth:`claim_merge` (the
        delta-cost DeleteMany analog, SURVEY §2.1 S6); overwrite remains
        for compaction, the legacy claim path, and whole-table refreshes."""
        commit = self._write_commit(df.select([f.name for f in self.schema.fields]), n_buckets)
        v = self.latest_version() + 1
        self._write_manifest(v, [commit])
        return v

    # -- delta-cost claim / upsert (VERDICT r3 next #1/#4) --------------------
    # The reference's claim is delta-cost (DeleteMany $in,
    # mongojobsstorage.go:165-180); the former per-round full-table
    # overwrite was O(frontier) write I/O to remove a round_limit-sized
    # batch — the dominant per-round cost at the 10^10-URL design point.
    # These methods rewrite ONLY the parquet files whose footer min-max
    # ranges can contain a deleted key; every other file path is carried
    # into the new manifest verbatim (zero read, zero write). Iceberg
    # analog: merge-on-read positional deletes / MERGE INTO
    # (IcebergTable.claim_merge / upsert_keys).

    # a claim/upsert collects its key batch to the driver for file
    # pruning; the crawl batch is round_limit rows (thousands). Above
    # this bound the delta path would itself be driver-heavy, so it
    # falls back to the full rewrite the old path always paid.
    DELTA_KEYS_MAX_ROWS = 4_000_000

    # pruning-saturation fallback (VERDICT r4 missing #3): when a claim's
    # keys range-match almost every file, the delta path costs what the
    # overwrite costs PLUS footer reads, carried-path bookkeeping and an
    # extra commit dir (measured: a url-scattered 4,096-key claim touched
    # 506/509 files = 99.9% of table bytes, BENCH/delta_claim.json). Above
    # this touched-file fraction _delta_apply takes the single-commit
    # overwrite instead. Set high on purpose: at 63% touched the delta
    # still writes 63% of the bytes (a win); only near saturation does
    # the bookkeeping stop paying for itself.
    DELTA_TOUCHED_FRACTION_MAX = 0.9

    def _prune_entries(
        self, entries: list[str], prune_col: str, sorted_vals: list
    ) -> tuple[list[str], list[str]]:
        """Split a manifest's parquet files into (untouched, touched) by
        rowgroup min-max stats on *prune_col*: a file none of whose
        rowgroup ranges contains any claimed value cannot hold a deleted
        row. Missing stats → conservatively touched. Ranges come from the
        commit-time ``_stats.json`` sidecar (ONE driver JSON read per
        commit dir — r5; the pre-sidecar shape read every file's footer
        every round, O(files) driver I/O per claim at the 10^10 design
        point); files without a sidecar record fall back to their
        footer."""
        import bisect

        untouched, touched = [], []
        for entry in entries:
            for path in self._entry_files(entry):
                ranges = self._prune_ranges(path, prune_col)
                hit = False
                for pair in ranges:
                    if pair is None:  # stats unavailable for this rowgroup
                        hit = True
                        break
                    mn, mx = pair
                    i = bisect.bisect_left(sorted_vals, mn)
                    if i < len(sorted_vals) and sorted_vals[i] <= mx:
                        hit = True
                        break
                (touched if hit else untouched).append(path)
        return untouched, touched

    def _prune_ranges(self, path: str, prune_col: str) -> list:
        """Per-rowgroup [min, max] pairs (None = unknown → touched) for
        *path*'s *prune_col*, from the sidecar when recorded, else from
        the parquet footer. An empty list means an empty file (nothing
        deletable)."""
        meta = self._file_meta(path)
        if meta is not None and prune_col in meta.get("cols", {}):
            recorded = meta["cols"][prune_col]
            if recorded is None:  # column absent from the file
                return [None]
            decoded = []
            for p in recorded:
                mn = self._dec_stat(p[0]) if p is not None else None
                mx = self._dec_stat(p[1]) if p is not None else None
                # a value the encoder could not represent decodes to None
                # → unknown range → rowgroup counts as a hit
                decoded.append(None if mn is None or mx is None else [mn, mx])
            return decoded
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        if md.num_row_groups == 0:
            return []
        col_idx = next(
            (
                j
                for j in range(md.num_columns)
                if md.row_group(0).column(j).path_in_schema == prune_col
            ),
            None,
        )
        if col_idx is None:
            return [None]
        out = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            out.append(None if st is None or not st.has_min_max else [st.min, st.max])
        return out

    def _delta(
        self,
        spark: SparkSession,
        delete_keys: DataFrame,
        join_cols: list[str],
        prune_col: str,
        additions: DataFrame,
        parent: int | None,
        n_buckets: int | None,
        keys_rows_hint: int | None = None,
    ) -> int:
        cols = [f.name for f in self.schema.fields]
        missing = [c for c in dict.fromkeys([*join_cols, prune_col]) if c not in delete_keys.columns]
        if missing:
            raise ValueError(
                f"delete_keys must carry {missing}: when prune_col differs from "
                "the join key it rides along the key rows (see claim_merge)"
            )
        base = self.latest_version() if parent is None else parent
        entries = self._read_manifest(base)
        # keep the prune column alongside the join keys (they may differ:
        # host_state joins on host but prunes on host_hash); the anti-join
        # below matches on join_cols only, extra columns ride along
        keys = delete_keys.select(*dict.fromkeys([*join_cols, prune_col])).distinct()
        # guard the KEY ROW COUNT (what the broadcast below ships and what
        # bounds the prune-value collect) BEFORE collecting anything to
        # the driver — guarding distinct prune values after the collect
        # would both collect an unbounded set and let a huge key rowset
        # through to a forced broadcast (code-review r4 finding #2)
        keys = keys.persist()  # evaluated 2-3x below: (count,) collect, anti-join
        try:
            # a caller-supplied upper bound (the crawl driver passes
            # round_limit — the scheduler's hard cap) skips the guard's
            # count job on the per-round hot path; unhinted callers pay it
            def full_rewrite() -> int:
                # unbounded key set: the old overwrite cost — one shared
                # path for the count guard and the violated-hint fallback
                merged = self.read(spark, base).join(keys, join_cols, "left_anti")
                return self.overwrite(
                    merged.unionByName(additions.select(cols)), n_buckets
                )

            n_keys = keys_rows_hint if keys_rows_hint is not None else keys.count()
            if n_keys > self.DELTA_KEYS_MAX_ROWS:
                return full_rewrite()
            # the hint is ADVISORY (ADVICE r4 #1): a caller under-reporting
            # the key count must not turn this collect into an unbounded
            # one, so it is limit-bounded. The collect is GROUPED, not
            # distinct, for the same single-job price (hash aggregate
            # either way): the group counts sum to the EXACT key-row
            # count, so a violated hint is caught even when the keys
            # collapse onto few prune values (the r4 residual — a lying
            # hint can no longer force a broadcast of an oversized key
            # set through a small prune-value set). Either overflow —
            # too many groups, or counts summing past MAX — proves the
            # violation and takes the full rewrite.
            grouped = (
                keys.groupBy(prune_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .limit(self.DELTA_KEYS_MAX_ROWS + 1)
                .collect()
            )
            if (
                len(grouped) > self.DELTA_KEYS_MAX_ROWS
                or sum(r["n"] for r in grouped) > self.DELTA_KEYS_MAX_ROWS
            ):
                return full_rewrite()
            raw = [r[0] for r in grouped]
            vals = sorted(v for v in raw if v is not None)
            if any(v is None for v in raw) and (
                len(join_cols) != 1 or join_cols[0] != prune_col
            ):
                # a NULL prune value on a key whose JOIN columns may still
                # match table rows cannot be located by footer stats —
                # conservatively touch every file (correct, just unpruned).
                # When the prune col IS the sole join col, a null key never
                # matches an equi-anti-join, so dropping it is exact.
                vals = None
            return self._delta_apply(
                spark, keys, join_cols, prune_col, vals, additions, entries,
                n_buckets, base,
            )
        finally:
            keys.unpersist()

    def _delta_apply(
        self, spark, keys, join_cols, prune_col, vals, additions, entries,
        n_buckets, base,
    ) -> int:
        cols = [f.name for f in self.schema.fields]
        new_entries: list[str] = []
        if vals is None:
            # unprunable (null prune value on a matchable key): rewrite all
            untouched: list[str] = []
            touched = [f for e in entries for f in self._entry_files(e)]
        elif vals:
            untouched, touched = self._prune_entries(entries, prune_col, vals)
        else:
            untouched, touched = list(entries), []
        untouched_files = [f for e in untouched for f in self._entry_files(e)]
        n_files = len(touched) + len(untouched_files)
        if touched and len(touched) > self.DELTA_TOUCHED_FRACTION_MAX * n_files:
            # pruning saturated (VERDICT r4 missing #3): rewriting nearly
            # every file through the delta path costs overwrite + footer
            # reads + an extra commit + carried-path bookkeeping. Take the
            # single-commit overwrite instead — version_new_bytes of the
            # transition ≈ the legacy overwrite, not overwrite-plus.
            all_files = touched + untouched_files
            merged = (
                spark.read.schema(self.schema)
                .parquet(*all_files)
                .join(F.broadcast(keys), join_cols, "left_anti")
            )
            return self.overwrite(merged.unionByName(additions.select(cols)), n_buckets)
        new_entries.extend(untouched)
        n_carried = len(new_entries)
        if touched:
            rewritten = (
                spark.read.schema(self.schema)
                .parquet(*touched)
                .join(F.broadcast(keys), join_cols, "left_anti")
            )
            self._commit_if_nonempty(rewritten.select(cols), n_buckets, new_entries)
        # skip-if-empty (ADVICE r4 #3): quiet rounds (no additions — e.g.
        # host_state when nothing fetched, drained-frontier end-game)
        # otherwise accrue one empty commit dir + manifest growth per
        # round between compactions
        self._commit_if_nonempty(additions.select(cols), n_buckets, new_entries)
        if (
            not touched
            and len(new_entries) == n_carried
            and base == self.latest_version()
        ):
            # true no-op transition (no file rewritten, nothing added —
            # e.g. host_state on a round with no host changes): skip the
            # manifest bump entirely, or quiet rounds accrue one
            # identical-file-list manifest per round forever (vacuum
            # defaults to keep-all). ONLY in the no-orphan steady state:
            # when a crashed round left versions past the pinned parent,
            # the bump doubles as the fence — compact() reads
            # latest_version() and would otherwise resurrect orphan rows.
            return base
        v = self.latest_version() + 1
        self._write_manifest(v, new_entries)
        return v

    def _commit_if_nonempty(self, df: DataFrame, n_buckets, new_entries: list[str]) -> None:
        """Write a commit dir and register it ONLY if it holds rows.
        Emptiness is checked AFTER the write from the commit's stats
        sidecar (one driver JSON read; _write_commit just built it from
        the footers) — cheaper than a count job on the unmaterialized
        DataFrame, and the write was needed anyway in the non-empty
        case."""
        import shutil

        commit = self._write_commit(df, n_buckets)
        stats = self._load_stats(commit)
        if stats is not None:
            nonempty = any(meta.get("rows", 0) > 0 for meta in stats.values())
        else:
            # unreadable/missing sidecar: do NOT assume empty — a torn
            # read here must never delete a commit that holds rows.
            # Fall back to the footers (same source the sidecar was
            # built from); an I/O error there raises instead of losing
            # data, matching the pre-sidecar behavior.
            import pyarrow.parquet as pq

            nonempty = any(
                pq.ParquetFile(f).metadata.num_rows > 0
                for f in self._entry_files(commit)
            )
        if nonempty:
            new_entries.append(commit)
        else:
            shutil.rmtree(commit, ignore_errors=True)
            self._stats_cache.pop(commit, None)

    def claim_merge(
        self,
        spark: SparkSession,
        claimed_keys: DataFrame,
        additions: DataFrame,
        key_col: str = "url_hash",
        prune_col: str | None = None,
        parent: int | None = None,
        n_buckets: int | None = None,
        keys_rows_hint: int | None = None,
    ) -> int:
        """Atomic round transition at delta cost: new version = *parent*'s
        rows minus every row whose *key_col* is in *claimed_keys*, plus
        *additions* — write I/O ∝ files containing claimed keys +
        additions, never O(table). One manifest version = one atomic
        commit point, exactly like overwrite().

        *prune_col* (default *key_col*) picks which column's footer
        ranges gate the file rewrite; it may differ from the join key
        ONLY when the table's prune_col value is functionally determined
        by its key (the frontier claim prunes on host_hash while deleting
        by url_hash — sound because url determines host, so every row
        with a claimed url_hash sits in a file whose host_hash range
        contains that key's host_hash). The scheduler's batches are
        HOST-clustered (per-host top-k), so with commits sorted by
        (host_hash, url_hash) a claim touches ≈ one file run per claimed
        host — independent of bucket count, unlike url_hash pruning,
        whose uniform keys cross-match every bucket's url ranges
        (measured in BENCH/delta_claim.json)."""
        return self._delta(
            spark,
            claimed_keys,
            [key_col],
            prune_col or key_col,
            additions,
            parent,
            n_buckets,
            keys_rows_hint,
        )

    def upsert_keys(
        self,
        spark: SparkSession,
        rows: DataFrame,
        key_cols: tuple[str, ...],
        prune_col: str | None = None,
        parent: int | None = None,
        n_buckets: int | None = None,
        keys_rows_hint: int | None = None,
    ) -> int:
        """Keyed upsert at delta cost: rows whose *key_cols* match an
        incoming row are replaced, everything else untouched (host_state's
        1-row-per-host merge; the streaming sink's per-trigger upsert —
        Iceberg MERGE INTO analog). *prune_col* is the column whose footer
        stats gate the file rewrite (defaults to the first key col; must
        be carried by *rows*).

        Duplicate source keys collapse to ONE (arbitrary) row — the same
        defined semantics on both backends (ADVICE r4 #2: Iceberg MERGE
        INTO fails at runtime on multi-match, while this path used to
        append both rows). Callers needing a specific winner must
        pre-aggregate. Cost: one hash-aggregate exchange over the
        incoming BATCH (≤ round_limit rows on the crawl path, one
        trigger's keys on the streaming path) — O(batch), never
        O(table)."""
        rows = rows.dropDuplicates(list(key_cols))
        pc = prune_col or key_cols[0]
        keys = rows.select(*dict.fromkeys([*key_cols, pc]))
        return self._delta(
            spark, keys, list(key_cols), pc, rows, parent, n_buckets, keys_rows_hint
        )

    def version_new_bytes(self, version: int, parent: int) -> int:
        """Bytes of data files present in *version* but not *parent* —
        the write cost of the transition, measured driver-side. The
        delta-claim bench/tests assert this scales with the claimed
        batch, not the table (VERDICT r3 next #1 'done =' criterion)."""
        old: set[str] = set()
        for e in self._read_manifest(parent):
            old.update(self._entry_files(e))
        total = 0
        for e in self._read_manifest(version):
            for f in self._entry_files(e):
                if f not in old:
                    total += os.path.getsize(f)
        return total

    def row_count(self, version: int | None = None) -> int:
        """Exact row count of a version from commit metadata — the
        ``_stats.json`` sidecar when recorded (one JSON read per commit
        dir, r5), the parquet footer otherwise. Driver-side file reads
        only, no Spark job. Used as the scheduler's small-round hint
        (politeness._global_rank picks the single-pass top-k path when
        the frontier is actually small, instead of paying the
        range-sample + offsets passes sized for round_limit)."""
        import pyarrow.parquet as pq

        total = 0
        for entry in self._read_manifest(
            self.latest_version() if version is None else version
        ):
            for f in self._entry_files(entry):
                meta = self._file_meta(f)
                if meta is not None and "rows" in meta:
                    total += meta["rows"]
                else:
                    total += pq.ParquetFile(f).metadata.num_rows
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
        live_entries: set[str] = set()
        for v in range(keep_cut, latest + 1):
            if os.path.exists(self._manifest_path(v)):
                live_entries.update(self._read_manifest(v))
        # delta claims reference individual FILES of older commit dirs, so
        # a dead dir can be partially live — liveness is per-file
        live_files: set[str] = set()
        for e in live_entries:
            if os.path.isdir(e) or os.path.isfile(e):
                live_files.update(self._entry_files(e))
        removed = []
        for v in range(1, keep_cut):
            # earlier vacuums already deleted their manifests — skip, so a
            # second vacuum of the same table is a no-op, not a crash
            if not os.path.exists(self._manifest_path(v)):
                continue
            for entry in self._read_manifest(v):
                if entry in live_entries:
                    continue
                if os.path.isdir(entry):
                    files = self._entry_files(entry)
                    if any(f in live_files for f in files):
                        for f in files:  # partially live: drop dead files only
                            if f not in live_files:
                                os.remove(f)
                                removed.append(f)
                        self._stats_cache.pop(entry, None)
                    else:
                        shutil.rmtree(entry, ignore_errors=True)
                        self._stats_cache.pop(entry, None)
                        removed.append(entry)
                elif os.path.isfile(entry) and entry not in live_files:
                    os.remove(entry)
                    self._stats_cache.pop(os.path.dirname(entry), None)
                    removed.append(entry)
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
