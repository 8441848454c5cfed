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


def pushed_filters(df: DataFrame, fmt: str | None = None) -> list[str]:
    """All data-source filter lists that reached a scan.  The capture runs
    to the LAST ``]`` on the line: a non-greedy/negated-class match would
    stop at the first ``]`` inside an ``In(x, [1,2,3])`` filter, dropping
    every filter after it and corrupting the In — misreporting the exact
    pushdown witness this module exists to provide."""
    if fmt is None:
        fmt = explain_formatted(df)
    return re.findall(r"PushedFilters: \[(.*)\]", fmt)


def read_schema_columns(
    df: DataFrame, fmt: str | None = None
) -> list[list[str]]:
    """TOP-LEVEL column names each scan actually reads (column-pruning
    witness).  Greedy to the last ``>`` on the line so nested struct
    ReadSchemas don't truncate at the inner ``>``; the split counts only
    depth-0 commas, so a nested field's members never leak in as phantom
    top-level columns."""
    if fmt is None:
        fmt = explain_formatted(df)
    schemas = re.findall(r"ReadSchema: struct<(.*)>", fmt)
    out: list[list[str]] = []
    for sch in schemas:
        cols, depth, cur = [], 0, ""
        for ch in sch:
            if ch == "," and depth == 0:
                cols.append(cur)
                cur = ""
                continue
            depth += ch in "<(" 
            depth -= ch in ">)"
            cur += ch
        cols.append(cur)
        out.append([c.split(":")[0].strip() for c in cols if c.strip()])
    return out


def count_exchanges(df: DataFrame, plan: str | None = None) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded) — the
    number the whole reference system exists to serve; fewer is better.
    RoundRobinPartitioning (keyless repartition) IS a full-table shuffle
    and counts; a regex listing only hash/range/Single would let an
    accidental round-robin exchange through every budget."""
    if plan is None:
        plan = executed_plan(df)
    return len(
        re.findall(r"\bExchange (?:hash|range|Single|RoundRobin)", plan)
    )


def single_partition_windows(df: DataFrame, plan: str | None = None) -> int:
    """Count Window nodes with an EMPTY partition spec — the plan shape
    that moves ALL rows to one partition (Spark logs "Moving all data to
    a single partition" and the operator stops scaling past one core).

    One such window is a deliberate, documented semantics dial
    (``window_ntile_pctrank``: global ntile/percent_rank is
    single-partition BY DEFINITION; the distributed twins
    ``global_pctrank_distributed`` / ``global_rank_distributed`` are the
    scale path) — but an UNDOCUMENTED one is a hidden scale-killer, and
    until r12 no PLANS.md column would have exposed it (VERDICT r11
    item 5).  Detection: a ``Window`` node prints ``[exprs],
    [partitionSpec], [orderSpec]`` with EMPTY specs omitted — so both a
    global ordered window (``[exprs], [orderSpec]``) and a partitioned
    UNORDERED window (``[exprs], [partitionSpec]`` — e.g. a COUNT over
    ``partitionBy(k)`` with no ordering, which scales fine) print two
    top-level bracket groups.  The first cut of this detector counted
    groups alone and false-positived on every partitioned-unordered
    window (caught on the first full PLANS regeneration, r12); the
    groups are now distinguished by content: a sort spec always renders
    its direction (``col ASC NULLS FIRST``), a partition spec never
    does.  Single-partition == one group only, or two groups whose
    second is a sort spec.  (``WindowGroupLimit`` doesn't match the
    ``Window [`` token; bracket groups are tracked at depth 0 so nested
    brackets inside window expressions can't miscount.)"""
    if plan is None:
        plan = executed_plan(df)
    n = 0
    for line in plan.splitlines():
        m = re.search(r"(?:^|\s)Window\s+(\[.*)$", line)
        if not m:
            continue
        depth = 0
        groups: list[list[str]] = []
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups.append([])
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    continue
            if depth >= 1 and groups:
                groups[-1].append(ch)
        second = "".join(groups[1]) if len(groups) > 1 else ""
        is_sort_spec = bool(re.search(r" (ASC|DESC) NULLS ", second))
        if len(groups) <= 1 or (len(groups) == 2 and is_sort_spec):
            n += 1
    return n


def audit(df: DataFrame) -> dict[str, object]:
    """One-call plan summary for a query under tuning.  The plan strings
    are fetched ONCE and threaded through the helpers — each refetch is a
    JVM explainString plus the full tree over py4j (the measured tree-cost
    lesson), which would quintuple the price inside test loops."""
    plan = executed_plan(df)
    fmt = explain_formatted(df)
    return {
        "exchanges": count_exchanges(df, plan),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": "CartesianProduct" in plan,
        "partial_aggregates": len(
            re.findall(r"HashAggregate.*partial", plan, flags=re.I)
        )
        or plan.count("HashAggregate") // 2,
        "top_k": "TakeOrderedAndProject" in plan,
        "single_partition_windows": single_partition_windows(df, plan),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", fmt))),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed_filters": pushed_filters(df, fmt),
        "scan_columns": read_schema_columns(df, fmt),
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
