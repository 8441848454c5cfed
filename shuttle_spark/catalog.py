"""Catalog: the driver's testdata parquet tables as DataFrames/temp views.

Schemas are declared (FIXTURES.md), not inferred — parquet footers carry them,
but declaring the expectation lets us fail fast on drift.  Load pattern is a
plain ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and partition pruning for free on every contract query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrame reuse across queries in one session: re-creating a reader per
# query re-lists files and re-reads footers; the logical plan is immutable so
# sharing it is safe.  Keyed by application id so a fresh session misses.
_df_cache: dict[tuple[str, str, str], DataFrame] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to session-timezone TIMESTAMP at microsecond grain.

    The driver has shipped two physical encodings across rounds:
    epoch-nanos int64 (parquet TIMESTAMP(NANOS) under nanosAsLong) and
    plain parquet timestamp[us] (read by Spark as TIMESTAMP_NTZ).  Both map
    to the same instant DuckDB sees via ``ts::TIMESTAMP`` — nanos floor to
    micros; NTZ wall-clock is interpreted in the UTC session timezone.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # The driver may hand us a session without these confs; both are
        # runtime-settable, so set them defensively before the read.  The
        # timezone matters because the NTZ->TIMESTAMP cast in
        # normalize_events_ts resolves the session zone at ANALYSIS time
        # (i.e. here, eagerly) and the result is memoized in _df_cache for
        # the app's lifetime — so UTC is scoped to this build and the
        # caller's own session timezone is restored afterwards (contract
        # comparisons separately pin UTC via contracts.ensure_conf).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            df = normalize_events_ts(spark.read.parquet(table_path(sf_dir, name)))
        finally:
            if prev_tz is None:
                spark.conf.unset("spark.sql.session.timeZone")
            else:
                spark.conf.set("spark.sql.session.timeZone", prev_tz)
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    _df_cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (SQL surface of the engine)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
