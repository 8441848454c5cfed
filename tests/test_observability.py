"""Observability surface: in-query observe() metrics + per-stage shuffle
accounting from the status store (engine twin of the reference's worker
health metrics, ShuffleWorker.java:116-144)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shuttle_spark import observability as O


def test_observed_counts_rows_for_free(spark):
    df = spark.range(0, 10_000).withColumn("k", F.col("id") % 7)
    out, obs = O.observed(df.groupBy("k").count(), "agg_out")
    rows = out.collect()
    assert obs.get["rows"] == len(rows) == 7
    assert obs.get["content_hash"] is not None


def test_measure_captures_shuffle_bytes(spark):
    df = spark.range(0, 500_000).withColumn("k", F.col("id") % 97)
    _, m = O.measure(spark, lambda: df.groupBy("k").count().collect())
    assert m.n_stages >= 2  # map + reduce at minimum
    assert m.shuffle_write_bytes > 0
    assert m.shuffle_read_bytes > 0
    # partial aggregation means far fewer shuffled records than input rows
    assert sum(s.shuffle_write_records for s in m.stages) < 500_000


def test_measure_scopes_to_action(spark):
    df = spark.range(0, 1000)
    _, warm = O.measure(spark, lambda: df.count())
    _, m = O.measure(spark, lambda: df.count())
    # second run sees only its own stages, not cumulative history
    assert 0 < m.n_stages <= warm.n_stages + 1
