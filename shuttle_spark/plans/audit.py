"""Physical-plan audit: inspect what Catalyst actually planned.

The reference picks its shuffle write strategy by inspecting the dependency
shape (bypass/unsafe/sort, Ors2ShuffleManager.scala:162-171) and hand-builds
its map-side combine; our engine's contract is that Catalyst makes the
equivalent-or-better choice.  This module is how that contract is *checked* —
in tests (tests/test_plans.py) and interactively while tuning a query:

    from shuttle_spark.plans import audit
    audit(df)  # -> {"exchanges": 1, "broadcast_joins": 1, ...}

Every operator's merge criteria at scale: filters pushed to the scan, columns
pruned, partial aggregation before every exchange, broadcast where a side is
small, no cartesian products, wide whole-stage-codegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (possibly pre-AQE) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """`df.explain('formatted')` as a string (nodes + detail sections,
    including PushedFilters and ReadSchema per scan)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All data-source filter lists that reached a scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", explain_formatted(df))


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names each scan actually reads (column-pruning witness)."""
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", explain_formatted(df))
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()]
        for s in schemas
    ]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded) — the
    number the whole reference system exists to serve; fewer is better."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def audit(df: DataFrame) -> dict[str, object]:
    """One-call plan summary for a query under tuning."""
    plan = executed_plan(df)
    fmt = explain_formatted(df)
    return {
        "exchanges": count_exchanges(df),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": "CartesianProduct" in plan,
        "partial_aggregates": len(
            re.findall(r"HashAggregate.*partial", plan, flags=re.I)
        )
        or plan.count("HashAggregate") // 2,
        "top_k": "TakeOrderedAndProject" in plan,
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", fmt))),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed_filters": pushed_filters(df),
        "scan_columns": read_schema_columns(df),
    }


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    no_cartesian: bool = True,
    require_broadcast: bool = False,
    require_partial_agg: bool = False,
) -> dict[str, object]:
    """Raise AssertionError when the plan violates its scale budget; returns
    the audit for logging.  Use in tests to pin a query's physical shape."""
    a = audit(df)
    if no_cartesian and a["cartesian"]:
        raise AssertionError(f"cartesian product in plan: {a}")
    if max_exchanges is not None and int(a["exchanges"]) > max_exchanges:
        raise AssertionError(
            f"{a['exchanges']} exchanges > budget {max_exchanges}: {a}"
        )
    if require_broadcast and not a["broadcast_joins"]:
        raise AssertionError(f"expected a broadcast join: {a}")
    if require_partial_agg and not a["partial_aggregates"]:
        raise AssertionError(f"expected partial aggregation: {a}")
    return a
