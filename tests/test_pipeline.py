"""End-to-end training-data pipeline: the composition the engine exists for.

documents -> exact dedup (normalized-hash) -> near-dup dedup (MinHash-LSH
verified) -> quality floor -> text features (lang, tokens, fingerprint) ->
partitioned parquet, with a stage-checksum audit — i.e., the north-star LLM
data pipeline, run as one lazy DataFrame composition (no intermediate
materialization; Catalyst fuses the narrow stages)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shuttle_spark import sources as IO
from shuttle_spark.catalog import load_table
from shuttle_spark.functions import text as TX
from shuttle_spark.operators import dedup as D
from shuttle_spark.operators import integrity as I
from shuttle_spark.operators import neardup as N

SF = "/root/testdata/sf0.001"


def test_document_pipeline_end_to_end(spark):
    docs = load_table(spark, SF, "documents")
    n0 = docs.count()

    # 1. exact dedup on normalized content hash
    stage1 = D.exact_text_dedup(docs)
    n1 = stage1.count()
    assert n1 <= n0

    # 2. near-dup dedup, MinHash-LSH candidates + exact Jaccard verify
    pairs = N.minhash_near_dup_pairs(stage1, tau=0.6)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    stage2 = stage1.join(losers, "doc_id", "left_anti")
    n2 = stage2.count()
    assert n2 < n1  # the corpus contains known near-dups

    # 3. quality floor + feature columns
    featured = (
        stage2.withColumn("quality", TX.quality_score(F.col("text")))
        .withColumn("lid", TX.lang_id(F.col("text")))
        .withColumn("n_tokens", TX.token_count(F.col("text")))
        .withColumn("fp", TX.fingerprint64(F.col("text")))
        .filter(F.col("quality") >= 0.3)
    )
    n3 = featured.count()
    assert 0 < n3 <= n2

    # fingerprints must be unique post-dedup (exact dedup removed hash dups)
    assert featured.select("fp").distinct().count() == n3

    # 4. integrity checksum audit across the write boundary
    chk = I.checksum(featured, F.col("fp")).collect()[0][0]

    out = tempfile.mkdtemp(prefix="pipe_") + "/clean_docs"
    IO.write_partitioned(featured, out, ["lid"])
    back = IO.read(spark, out, "parquet")
    assert back.count() == n3
    assert I.verify(back, F.col("fp"), chk) == chk  # nothing lost or mutated

    # partition pruning works on the output layout
    en = back.filter(F.col("lid") == "en")
    txt = en._sc._jvm.PythonSQLUtils.explainString(
        en._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in txt


def test_pipeline_is_lazy_single_plan(spark):
    """The composed pipeline (before actions) is ONE plan: narrow stages
    fuse; only the near-dup band join and dedups exchange."""
    docs = load_table(spark, SF, "documents")
    stage1 = D.exact_text_dedup(docs)
    featured = stage1.withColumn("quality", TX.quality_score(F.col("text"))).filter(
        F.col("quality") >= 0.3
    )
    plan = featured._jdf.queryExecution().executedPlan().toString()
    # exactly the dedup's one exchange; quality stage fused into scan side
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# operators/pipeline.py unit semantics (decontaminate / repetition / cleanse)
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_decontaminate_semantics(spark):
    from shuttle_spark.operators import pipeline as P

    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta", "en", "b")])
    corpus = _docs(
        spark,
        [
            # shares the full benchmark 5-gram run -> contaminated
            (1, "x alpha beta gamma delta epsilon y", "en", "c"),
            # shares only 4-gram overlap -> clean at n=5
            (2, "alpha beta gamma delta zonk", "en", "c"),
            # disjoint -> clean
            (3, "one two three four five six", "en", "c"),
            # too short for any 5-gram -> clean
            (4, "tiny doc", "en", "c"),
        ],
    )
    bad = {r.doc_id for r in P.contaminated_ids(corpus, bench, n=5).collect()}
    assert bad == {1}
    clean = {r.doc_id for r in P.decontaminate(corpus, bench, n=5).collect()}
    assert clean == {2, 3, 4}


def test_repetition_score_bounds(spark):
    from shuttle_spark.operators import pipeline as P

    df = _docs(
        spark,
        [
            (1, "a b c d e a b c d e a b c d e", "en", "s"),  # repeated 5-grams
            (2, "q w e r t y u i o p", "en", "s"),            # all distinct
            (3, "short", "en", "s"),                           # < n tokens -> 0
        ],
    ).select("doc_id", P.repetition_score(F.col("text"), n=5).alias("r"))
    got = {r.doc_id: r.r for r in df.collect()}
    assert got[3] == 0.0
    assert got[2] == 0.0
    assert 0.0 < got[1] < 1.0
    # doc 1: 11 gram positions, 5 distinct cyclic grams -> 1 - 5/11
    assert abs(got[1] - round(1 - 5 / 11, 6)) < 1e-9


def test_repetition_score_null_text_is_zero(spark):
    # NULL text => NULL gram array; the score must still be 0, not NULL
    # (ADVICE r3: the when-condition over size(NULL) was NULL-propagating).
    from shuttle_spark.operators import pipeline as P

    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e f")], "doc_id long, text string"
    ).select("doc_id", P.repetition_score(F.col("text"), n=5).alias("r"))
    got = {r.doc_id: r.r for r in df.collect()}
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_cleanse_filters_and_dedups(spark):
    from shuttle_spark.operators import pipeline as P

    base = "word " * 30  # 30 tokens, passes length gate
    df = _docs(
        spark,
        [
            (1, base + "one", "en", "s"),
            (2, base + "one", "en", "s"),      # exact dup of 1 -> one survives
            (3, base + "two", "fr", "s"),      # wrong lang
            (4, "too short", "en", "s"),       # length gate
            (5, base + "three", "en", "s"),
        ],
    )
    out = P.cleanse(df, lang="en", min_tokens=20, max_tokens=1000, min_quality=0.0)
    ids = sorted(r.doc_id for r in out.collect())
    assert len(ids) == 2  # one of {1,2} plus 5
    assert 5 in ids and (1 in ids or 2 in ids)
    assert "content_hash" in out.columns
