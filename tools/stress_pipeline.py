"""Stress the round-3 pipeline operators at replicated corpus scale.

Replicates the sf0.1 documents table in-plan (cross-join with a copy
index; every token salted with the copy id so copies share nothing) and
measures decontaminate / cleanse / repetition / tf-idf wall times at
1x / 20x / 100x.  Structure per copy is preserved, so correct outputs
scale exactly linearly (checked for decontamination counts).

    PYTHONPATH=/root/repo python tools/stress_pipeline.py [max_mult]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shuttle_spark import get_session
from shuttle_spark.catalog import load_table
from shuttle_spark.functions import text as TX
from shuttle_spark.operators import pipeline as P

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, mult: int):
    docs = load_table(spark, SF, "documents")
    if mult == 1:
        return docs
    copies = spark.range(mult).withColumnRenamed("id", "copy")
    rep = docs.crossJoin(copies)
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_"), F.col("copy").cast("string")),
        ),
        " ",
    )
    return rep.select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
    )


def main() -> None:
    max_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_session("stress-pipeline")
    for mult in (1, 20, 100):
        if mult > max_mult:
            break
        docs = replicated(spark, mult).persist()
        n = docs.count()
        print(f"== {mult}x: {n} docs")

        bench = docs.filter(F.col("doc_id") % 97 == 0)
        corpus = docs.filter(F.col("doc_id") % 97 != 0)
        t0 = time.perf_counter()
        bad = P.contaminated_ids(corpus, bench, n=5).count()
        print(f"decontaminate: {bad} contaminated, {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        clean = P.cleanse(docs, min_quality=0.0).count()
        print(f"cleanse: {clean} survivors, {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        # collect() (not count()) so column pruning cannot drop the score
        rep = (
            P.repetition_scores(docs, n=5, keep=("source",))
            .groupBy("source")
            .agg(F.avg("repetition"))
            .collect()
        )
        print(f"repetition: {len(rep)} sources, {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        words = docs.select(
            "doc_id", "source", F.explode(TX.tokens(F.col("text"))).alias("term")
        )
        tf = words.groupBy("source", "term").agg(F.count("*").alias("tf"))
        df = words.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
        top = tf.join(df.hint("merge"), "term").count()
        print(f"tfidf tf/df join: {top} rows, {time.perf_counter()-t0:.1f}s")
        docs.unpersist()


if __name__ == "__main__":
    main()
