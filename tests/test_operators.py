"""Operator unit tests, modeled on the reference's test strategy (SURVEY §5):
the golden smoke constants of Ors2ShuffleManagerTest plus targeted semantics
checks on constructed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from shuttle_spark.operators import dedup as D
from shuttle_spark.operators import integrity as I
from shuttle_spark.operators import relational as R


def test_reference_golden_smoke(spark):
    """The reference's canonical E2E test: 1..10000, repartition(10),
    agg(count, sum) == (10000, 50005000)
    (/root/reference/src/test/scala/org/apache/spark/shuffle/
    Ors2ShuffleManagerTest.scala:60-69) — here the same pipeline through
    Spark's own shuffle via the engine's exchange operator."""
    df = spark.range(1, 10001).toDF("value")
    out = R.exchange(df, 10, "value").agg(
        F.count("*").alias("cnt"), F.sum("value").alias("total")
    )
    row = out.collect()[0]
    assert (row.cnt, row.total) == (10000, 50005000)


def test_exchange_preserves_rows(spark):
    df = spark.range(0, 1000).toDF("k")
    assert R.exchange(df, 7, "k").count() == 1000
    assert R.exchange(df, 3).count() == 1000


def test_keep_latest_semantics(spark):
    """Stale-attempt twin: newest (ts, id) per key survives, exactly once."""
    rows = [
        (1, 10, "old"),
        (1, 20, "new"),
        (2, 5, "only"),
        (3, 7, "tie-low"),
        (3, 7, "tie-low2"),  # same ts -> id tiebreak
    ]
    df = spark.createDataFrame(rows, "k int, ts int, v string").withColumn(
        "id", F.monotonically_increasing_id()
    )
    out = D.keep_latest(df, ["k"], [F.desc("ts"), F.desc("id")])
    got = {r.k: r.v for r in out.collect()}
    assert got[1] == "new" and got[2] == "only" and got[3] == "tie-low2"
    assert out.count() == 3


def test_exact_text_dedup_collapses(spark):
    rows = [
        (1, "Hello   World"),
        (2, "hello world"),  # same after normalization
        (3, "different doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert D.exact_text_dedup(df).count() == 2


def test_checksum_verify_raises(spark):
    df = spark.range(0, 100).toDF("v")
    good = I.checksum(df, F.col("v")).collect()[0][0]
    assert I.verify(df, F.col("v"), good) == good
    try:
        I.verify(df, F.col("v"), good + 1)
        raise AssertionError("expected ChecksumMismatch")
    except I.ChecksumMismatch:
        pass


def test_checksum_order_independent(spark):
    df = spark.range(0, 1000).toDF("v")
    a = I.checksum(df, F.col("v")).collect()[0][0]
    b = I.checksum(R.exchange(df, 13, "v"), F.col("v")).collect()[0][0]
    assert a == b


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [(g, i, g * 100 + i) for g in range(3) for i in range(10)],
        "g int, i int, score int",
    )
    out = R.top_k_per_group(df, ["g"], [F.desc("score")], 2)
    assert out.count() == 6
    per_g = {(r.g, r.i) for r in out.collect()}
    assert per_g == {(0, 9), (0, 8), (1, 9), (1, 8), (2, 9), (2, 8)}


def test_setops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "v int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "v int")
    assert sorted(r.v for r in R.intersect(a, b).collect()) == [2, 3]
    assert sorted(r.v for r in R.except_all(a, b).collect()) == [1, 2]
    assert R.union_all(a, b).count() == 7
