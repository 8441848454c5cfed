"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``shuttle_spark.contracts`` — a registry where
every operator from SURVEY.md §2.B is a named (Spark builder, DuckDB oracle)
pair built for bit-stable cross-engine agreement.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shuttle_spark import contracts as _contracts  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 shape on sf0.001 — scan -> filter ->
    partial/final hash aggregate, the exact pipeline the reference's shuffle
    service exists to serve (SURVEY.md §2.B B5)."""
    return _contracts.REGISTRY["agg_tpch_q1"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _contracts.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted -> rows-only check)."""
    return _contracts.oracle_sql()
