"""SparkSession factory.

This is the conf embodiment of SURVEY.md §4: everything the reference
engineers by hand in its shuffle path (writer-strategy selection, map-side
combine, Tungsten sort, LZ4+Kryo, async fetch, AQE compatibility) is already
inside Spark's sort-based shuffle — we turn the right knobs on and keep every
operator AQE-compatible.  Where the reference must disable AQE local shuffle
reads (/root/reference/src/main/scala/org/apache/spark/shuffle/
Ors2ShuffleManager.scala:77-80), Spark's own shuffle supports them, so we keep
the full AQE feature set ON (coalesce, skew join, local read).

Data integrity: the reference checksums every (map, partition) with CRC32 and
verifies on read (Ors2BlockManager.scala:127-136,
ShufflePartitionReader.java:217-249).  Spark 3.2+ ships the same mechanism
behind ``spark.shuffle.checksum.enabled`` — we enable it, and additionally
expose query-level checksums in operators/integrity.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32] test harness; on a real cluster the same builder is
# used with master/memory supplied by the cluster manager.  Shuffle partition
# count is a *starting* value only: AQE coalesces or splits at runtime, which
# is what makes these settings scale-portable (at 100 TB you raise
# initialPartitionNum, not rewrite queries).
_DEFAULTS = {
    # local[N] is a single JVM: driver heap IS executor memory.  Spark's
    # 1g default OOMs the first serious broadcast/state at stress scale on
    # this 128 GiB box; size like an executor, leave room for Python
    # workers (Arrow UDFs) and the OS page cache.  SPARK_GRAFT_DRIVER_MEM
    # overrides; ignored (with the rest of first-session conf) if a
    # session already exists.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.driver.maxResultSize": "8g",
    # AQE: runtime re-planning replaces the reference's static
    # worker-count/group heuristics (Ors2ShuffleManager.scala:372-413).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    # Shuffle integrity — built-in twin of the reference's CRC32 protocol.
    "spark.shuffle.checksum.enabled": "true",
    # Same wire format choices as the reference (Kryo + LZ4,
    # Ors2Compression.scala:41-59) — Spark defaults to lz4 already.
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.io.compression.codec": "lz4",
    # Oracle comparability: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # events.ts is parquet TIMESTAMP(NANOS) which vanilla Spark rejects
    # (PARQUET_TYPE_ILLEGAL); read as epoch-nanos long, catalog converts to
    # a microsecond timestamp (floor), matching DuckDB's ns->us cast.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for the pandas-UDF slow path (vectorized, not row-at-a-time).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local[N] has no dynamic executors; keep partitions ~ cores for tests.
    "spark.sql.shuffle.partitions": "32",
    "spark.default.parallelism": "32",
    # Scan-split note (measured, not configured): the driver's tables are
    # single parquet files with ONE row group each, so scan + partial-agg
    # parallelism is structurally 1 task regardless of
    # spark.sql.files.maxPartitionBytes (splits snap to row groups; extra
    # splits are empty).  Smaller splits were tried and reverted — no
    # effect.  Real deployments get scan parallelism from file count x
    # row groups; io.compact(row_group_bytes=...) is the engine-side dial
    # that keeps compacted files split-readable, and catalog.load_table's
    # ingest relayout (see catalog._ingest_relayout) re-lays single-row-
    # group sources into 1 MiB row groups once per session so every
    # subsequent scan parallelizes.
    # Split planning sizes splits as max(openCostInBytes, bytes/parallelism)
    # capped at maxPartitionBytes; the 4 MiB default openCost floors MB-scale
    # tables at ~6 splits.  1 MiB aligns splits with the relayout's row
    # groups (measured: 6 -> 14 tasks, checksum scan 0.43 s -> 0.27 s at
    # sf0.1).  At real scale bytes/parallelism dominates and this is inert.
    "spark.sql.files.openCostInBytes": str(1 << 20),
    # InferFiltersFromGenerate clones the generator input into a pre-filter;
    # with an expensive higher-order-function input (shingling) that filter
    # re-evaluates the whole expression twice per row in interpreted mode —
    # measured 3x slowdown on explode-heavy dedup plans.  The inferred
    # filter only skips empty arrays, worthless for our generators.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # Broadcast threshold: dims (region/nation/customer/supplier/part at test
    # SF) broadcast; at 100 TB the same queries still broadcast region/nation
    # and AQE converts sort-merge->broadcast when runtime stats allow.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Managed-table warehouse (bucketed tables, sources/io.py) out of the
    # source tree; production overrides with a DFS URI.
    "spark.sql.warehouse.dir": "/tmp/shuttle_spark_warehouse",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_session(app_name: str = "shuttle_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract) and
    accepts per-call conf overrides for tests.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
