from shuttle_spark.plans.audit import (
    assert_plan,
    audit,
    count_exchanges,
    executed_plan,
    explain_formatted,
    pushed_filters,
    single_partition_windows,
    read_schema_columns,
)

__all__ = [
    "assert_plan",
    "audit",
    "count_exchanges",
    "executed_plan",
    "explain_formatted",
    "pushed_filters",
    "single_partition_windows",
    "read_schema_columns",
]
