"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM; the configs
below are chosen so the same code is correct and fast on a large cluster:

- AQE on (runtime coalesce + skew-join splitting) so shuffle partition
  counts self-tune between sf0.001 local runs and 100 TB cluster runs.
- shuffle.partitions sized to local cores here; on a real cluster this
  is overridden by AQE's coalescing from a high initial value.
- Arrow enabled for every Python boundary (pandas UDFs, toPandas).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pixie_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Adversarial-session overrides (the correctness re-check SCALE.md
    # documents: non-UTC TZ, AQE off, oversized shuffle partitioning —
    # results must not depend on any of these):
    #   SPARK_GRAFT_TZ / SPARK_GRAFT_AQE / SPARK_GRAFT_SHUFFLE_PARTITIONS
    tz = os.environ.get("SPARK_GRAFT_TZ", "UTC")
    aqe = os.environ.get("SPARK_GRAFT_AQE", "true")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Single-JVM local mode: driver heap IS the executor heap. 8g
        # OOM'd once the test suite passed ~600 tests in one session
        # (localCheckpoint blocks + streaming state accumulate until the
        # ContextCleaner catches up); the box has 128 GiB — size for the
        # long-session case.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Console progress bars write \r-frames to stderr/stdout that
        # pollute line-oriented captures — the round-7 driver bench
        # record lost its headline medians to them (BENCH_r07.json
        # "parsed": null). bench.py's contract is ONE parseable JSON
        # line on stdout; nothing in this repo wants the progress bar.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Materialization strategy for every lineage-cut in the package
        # (pixie_spark.materialize): localCheckpoint (local-mode default)
        # | persist (DISK_ONLY, cluster-safe) | checkpoint (reliable, for
        # 1000-executor runs — set spark.pixie_spark.checkpointDir to a
        # durable filesystem). Runtime-settable via spark.conf.set.
        .config(
            "spark.pixie_spark.materialize",
            os.environ.get("SPARK_GRAFT_MATERIALIZE", "localCheckpoint"),
        )
        # reliable-checkpoint files are reclaimed when their RDD is
        # GC'd — without this the checkpoint strategy leaks one file
        # set per iteration of CC/PageRank for the app's lifetime
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # Generated-code cache sized to the package's composed pipelines
        # (optimization r11): the 100-entry default is smaller than ONE
        # run of the corpus funnel (207 generated classes, measured via
        # CodegenMetrics), so the query evicts its own entries and every
        # re-run — bench repeats, each CC/PageRank round in a session —
        # re-pays janino compile (~85 ms/class of serial driver time;
        # 205 recompiles on the funnel's second run at the default, 0 at
        # 4096). Driver-side planning cache, scale-independent: entries
        # are (source, compiled-class) pairs of a few tens of KB.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
