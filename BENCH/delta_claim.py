"""Delta-claim write-cost leg (VERDICT r3 next #1 'done =' criterion):
per-round frontier write bytes must scale with the SCHEDULED BATCH, not
the frontier.

Builds a synthetic frontier-shaped table (5M rows, bucket(16, host_hash)
layout, sortWithinPartitions(host_hash, url_hash), maxRecordsPerFile=10k
-> ~500 files with narrow HOST ranges — the driver's r4 layout), then
claims batches in the shapes that occur in practice, pruning on
host_hash (sound: url determines host), and measures bytes written vs
the legacy full-overwrite path:

- HOST-CLUSTERED claims — the scheduler's actual shape (per-host top-k,
  budget rows per host): a claim touches ≈ one file run per claimed
  HOST, so rewritten bytes ∝ claimed hosts, independent of bucket count
  and total file count.
- URL-SCATTERED claims (worst case: every key a distinct host): file
  pruning degrades to 1 - exp(-hosts/n_files) — ∝ batch below
  saturation, everything once distinct-hosts ≳ files. At saturation the
  delta path costs what the overwrite it replaces cost (never more) —
  and the design-point answer there is the ICEBERG backend's
  merge-on-read DELETE, whose write cost is O(batch) positional-delete
  records regardless of layout (call sequence contract-tested in
  tests/test_iceberg_contract.py; no jar in this sandbox to execute it).

Writes BENCH/delta_claim.json. Run:  python BENCH/delta_claim.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 5_000_000
N_BUCKETS = 16
MAX_RECORDS_PER_FILE = 10_000


def main() -> None:
    from pyspark.sql import functions as F

    from tor_spider_spark.schemas import FRONTIER
    from tor_spider_spark.session import get_spark
    from tor_spider_spark.sources.tables import SnapshotTable

    spark = get_spark(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      app_name="delta-claim-bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="delta-claim-")
    t = SnapshotTable(root, "frontier", FRONTIER,
                      sort_col=("host_hash", "url_hash"),
                      max_records_per_file=MAX_RECORDS_PER_FILE,
                      range_partition=True)
    base = (
        spark.range(N_ROWS)
        .select(
            F.concat(F.lit("http://h"), (F.col("id") % 100_000).cast("string"),
                     F.lit(".onion/p"), F.col("id")).alias("url"),
            F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
            F.concat(F.lit("h"), (F.col("id") % 100_000).cast("string")).alias("host"),
            F.xxhash64((F.col("id") % 100_000).cast("string")).alias("host_hash"),
            F.lit(3).alias("depth"),
            F.lit(0.25).alias("priority"),
            F.lit(0).alias("discovered_round"),
            F.lit(False).alias("is_seed"),
        )
        .persist()
    )
    base.count()
    v1 = t.overwrite(base, N_BUCKETS)
    table_bytes = t.version_new_bytes(v1, 0)
    v1_files = {f for e in t._read_manifest(v1) for f in t._entry_files(e)}
    n_files = len(v1_files)
    adds = base.limit(0)  # isolate the DELETE side's write cost

    def claim(keys_df, label, n_hosts):
        keys_df = keys_df.persist()
        n_keys = keys_df.count()
        t0 = time.time()
        v = t.claim_merge(spark, keys_df, adds, prune_col="host_hash",
                          parent=v1, n_buckets=N_BUCKETS)
        wall = time.time() - t0
        carried = sum(1 for e in t._read_manifest(v) if e in v1_files)
        keys_df.unpersist()
        return {
            "shape": label,
            "batch": n_keys,
            "distinct_hosts": n_hosts,
            "delta_bytes": t.version_new_bytes(v, v1),
            "delta_frac_of_table": round(t.version_new_bytes(v, v1) / table_bytes, 4),
            "files_carried": carried,
            "files_total": n_files,
            "wall_sec": round(wall, 2),
        }

    out = {
        "frontier_rows": N_ROWS,
        "n_hosts": 100_000,
        "table_bytes": table_bytes,
        "n_files": n_files,
        "max_records_per_file": MAX_RECORDS_PER_FILE,
        "claims": [],
    }
    # HOST-CLUSTERED (scheduler shape): budget=8 rows for each of H hosts;
    # row ids for host j are j + k*100_000
    for n_hosts in (8, 64, 512):
        keys = (
            spark.range(n_hosts * 8)
            .select(
                (F.col("id") % n_hosts).alias("_j"),
                (F.col("id") % n_hosts + (F.col("id") / n_hosts).cast("long") * 100_000).alias("_rid"),
            )
            .select(
                F.xxhash64(F.concat(F.lit("u"), F.col("_rid"))).alias("url_hash"),
                F.xxhash64(F.col("_j").cast("string")).alias("host_hash"),
            )
        )
        out["claims"].append(claim(keys, "host_clustered_budget8", n_hosts))
    # URL-SCATTERED (worst case: ~every key its own host)
    for batch in (64, 4_096):
        keys = (
            base.select("url_hash", "host_hash")
            .sample(batch / N_ROWS * 1.2, seed=batch)
            .limit(batch)
        )
        out["claims"].append(claim(keys, "url_scattered", batch))

    # the legacy cost for the smallest batch: full overwrite of the
    # anti-joined table (what every round used to pay)
    keys = base.select("url_hash").limit(64)
    t0 = time.time()
    v_ow = t.overwrite(t.read(spark, v1).join(keys, "url_hash", "left_anti"), N_BUCKETS)
    out["legacy_overwrite"] = {
        "batch": 64,
        "bytes": t.version_new_bytes(v_ow, v1),
        "wall_sec": round(time.time() - t0, 2),
    }
    out["ratio_smallest_batch_delta_vs_overwrite_bytes"] = round(
        out["claims"][0]["delta_bytes"] / out["legacy_overwrite"]["bytes"], 4
    )
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(__file__), "delta_claim.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
