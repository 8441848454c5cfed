"""Sources/sinks: format round-trips, partition pruning from partitioned
writes, and shuffle-free joins from bucketed tables."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from shuttle_spark import sources as IO
from shuttle_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tmp(name: str) -> str:
    return tempfile.mkdtemp(prefix=f"src_{name}_") + "/data"


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_roundtrip(spark):
    nation = load_table(spark, SF, "nation")
    p = _tmp("pq")
    IO.write(nation, p, "parquet")
    back = IO.read(spark, p, "parquet")
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_csv_roundtrip_requires_schema(spark):
    nation = load_table(spark, SF, "nation")
    p = _tmp("csv")
    IO.write(nation, p, "csv")
    with pytest.raises(ValueError, match="schema"):
        IO.read(spark, p, "csv")
    back = IO.read(spark, p, "csv", schema=nation.schema)
    assert back.schema == nation.schema
    assert back.count() == nation.count()


def test_json_roundtrip(spark):
    region = load_table(spark, SF, "region")
    p = _tmp("json")
    IO.write(region, p, "json")
    back = IO.read(spark, p, "json", schema=region.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, region.collect()))


def test_orc_roundtrip(spark):
    supplier = load_table(spark, SF, "supplier")
    p = _tmp("orc")
    IO.write(supplier, p, "orc", compression="zstd")
    back = IO.read(spark, p, "orc")
    assert back.count() == supplier.count()


def test_partitioned_write_prunes(spark):
    orders = load_table(spark, SF, "orders")
    p = _tmp("part")
    IO.write_partitioned(orders, p, ["o_orderpriority"])
    back = IO.read(spark, p, "parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    txt = _formatted(back)
    # pruning happened at the source: the partition filter is on the scan,
    # and only the matching directory is read
    assert "PartitionFilters" in txt
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == want


def test_bucketed_join_skips_shuffle(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    IO.write_bucketed_table(orders, "orders_b", ["o_custkey"], 8)
    IO.write_bucketed_table(customer, "cust_b", ["c_custkey"], 8)
    j = (
        spark.table("orders_b")
        .hint("merge")  # force SMJ so broadcast doesn't mask the bucketing
        .join(
            spark.table("cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucketing replaced it
    # and the join is still correct
    want = orders.join(customer, F.col("o_custkey") == F.col("c_custkey")).count()
    assert j.count() == want
