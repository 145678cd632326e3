"""SparkSession factory with the engine's tuned configuration.

One place for every conf so tests, bench, and the driver contract agree.
The settings are the SURVEY §4.2 list: AQE (+skew join for hub onion
sites), Arrow-batched pandas UDFs, and shuffle-partition sizing for the
sandbox (local[32]); on a real cluster only master/partitions change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "tor-spider-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # Under spark-submit the JVM gateway already holds --master /
    # --py-files / --conf (PythonRunner marks itself via
    # PYSPARK_GATEWAY_PORT); forcing builder.master() here would silently
    # override the submitted cluster with local[32] — the "on a cluster
    # only --master changes" contract (scripts/run_crawl.py) depends on
    # honoring the submit conf when no caller/env pins a master.
    submitted = (
        master is None
        and "SPARK_MASTER" not in os.environ
        and "PYSPARK_GATEWAY_PORT" in os.environ
    )
    if not submitted:
        master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None and not submitted:
        # 3x cores: stragglers from skewed keys (hub hosts) smooth out and
        # AQE coalesces the excess back — same rule on a real cluster
        spec = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        if master.startswith("local-cluster"):
            # local-cluster[N,cores,memMB]: N executor JVMs — the truest
            # single-box analog of an N-executor cluster
            n_exec, cores_each = int(spec.split(",")[0]), int(spec.split(",")[1])
            cores = n_exec * cores_each
        else:
            cores = 32 if spec == "*" else int(spec)
        shuffle_partitions = max(8, 3 * cores)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # hub onion sites are heavy-hitter join keys (SURVEY §2.3 J3)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # runtime bloom join pruning as a backstop under our explicit shards
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (guide §3.1/§9) — skips the per-partition sort;
        # r6 A/B at sf1.0: skew_join 2.07->1.58s, anti_join 1.09->0.84s,
        # core scheduling leg 5.27->4.84s, no regressions (oracle rows and
        # crawl<->simulator parity unchanged — join strategy is physical)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # scan split size (guide §6): the driver fixtures are single
        # ~100 MB-scale files whose 128 MB default yields 1-2 map tasks
        # on 32 cores; 32m splits them at row-group granularity (r6 A/B:
        # skew_join 2.0->1.7s, q1 0.69->0.43s, crawl leg no worse). At
        # petabyte inputs with thousands of files RAISE this (512m-1g —
        # fewer, larger map tasks feed shuffles better, guide §2.2); env
        # knob so a cluster submit can set it without code changes.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "32m"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if not submitted:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # S12 profiling analog (reference pprof hook, main.go:43-48)
    eventlog_dir = os.environ.get("SPARK_EVENTLOG_DIR")
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        builder = builder.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", eventlog_dir
        )
    if not submitted and master.startswith("local-cluster"):
        builder = builder.config(
            "spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "6g")
        )
    spark = builder.getOrCreate()
    if submitted and shuffle_partitions is None:
        # size from the cluster the submit conf gave us (runtime-settable)
        # — but ONLY when the submit conf didn't set it explicitly: an
        # operator's --conf spark.sql.shuffle.partitions wins, same
        # honor-the-submit-conf contract as --master above
        if not spark.sparkContext.getConf().contains("spark.sql.shuffle.partitions"):
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(8, 3 * cores)))
    if not submitted and master.startswith("local-cluster"):
        # executor JVMs spawn their own Python workers: ship the package
        # the same way a real cluster submit does (--py-files); under a
        # real spark-submit the --py-files flag already did
        spark.sparkContext.addPyFile(_package_zip())
    return spark


def _package_zip() -> str:
    """Zip tor_spider_spark for --py-files-style shipping. Cached, but
    rebuilt whenever any package source file is newer than the zip — a
    stale zip would silently ship OLD executor-side code to the worker
    JVMs' Python workers (multi-executor tests would then exercise a
    phantom version of probe/UDF code while driver-side code is current)."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join("/tmp", "tor_spider_spark_pyfiles.zip")
    sources = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(pkg_dir)
        if "__pycache__" not in root
        for f in files
        if f.endswith(".py")
    ]
    stale = not os.path.exists(out) or any(
        os.path.getmtime(s) >= os.path.getmtime(out) for s in sources
    )
    if stale:
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "tor_spider_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        os.replace(tmp, out)
    return out
