"""Round-13: resolve the ivf_upsert_equal consolidation regression
(VERDICT r12 item 1).  Three variants of the contract's verification,
interleaved A/B on one bench-profiled session, REAL verification-job
plans dumped (the r12 dumps were boolean stubs):

  tagged      — the shipped r12 form: maintained/rebuilt union under a tag
                column; the plan contains `maintained` 3x and `rebuilt` 2x
                unless ReuseExchange fires.
  sequential  — the r11 form: 4 sequential driver actions.
  unionw      — candidate rewrite: union maintained(+1)/rebuilt(-1), ONE
                aggregate over (vec_id, cell); each subtree evaluated ONCE.
                mismatch = sum(|cm-cr|) == |m\\r| + |r\\m| (exceptAll both
                ways); n_maintained = sum(cm).  `ok = mismatch==0` is
                equivalent to the shipped predicate because mismatch==0
                already implies n_maintained == n_post (rebuilt is
                row-for-row with post).

Usage: PYTHONPATH=/root/repo python tools/ivf_upsert_ab.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shuttle_spark import get_session
from shuttle_spark.catalog import load_table
from shuttle_spark.operators import similarity as S2

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pieces(spark):
    emb = load_table(spark, SF, "embeddings")
    indexed, cents = S2.ivf_build(emb, dim=64, n_cells=16)
    rot = lambda n: F.concat(  # noqa: E731
        F.slice(F.col("embedding"), n + 1, 10_000),
        F.slice(F.col("embedding"), 1, n),
    )
    vid = F.col("vec_id")
    upd = emb.filter(vid % 17 == 0).select(
        F.lit("U").alias("op"), "vec_id", rot(1).alias("embedding"), "label"
    )
    dele = emb.filter((vid % 17 != 0) & (vid % 19 == 1)).select(
        F.lit("D").alias("op"), "vec_id",
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit(None).cast("int").alias("label"),
    )
    ins = emb.filter(vid % 23 == 2).select(
        F.lit("I").alias("op"), (vid + 1_000_000_000).alias("vec_id"),
        rot(2).alias("embedding"), "label",
    )
    changes = upd.unionByName(dele).unionByName(ins)
    maintained = S2.ivf_upsert(indexed, cents, changes).select("vec_id", "cell")
    post = (
        emb.join(
            changes.filter(F.col("op").isin("D", "U")).select("vec_id"),
            "vec_id", "left_anti",
        ).unionByName(
            changes.filter(F.col("op").isin("I", "U")).select(
                "vec_id", "embedding", "label"
            )
        )
    )
    rebuilt = S2.assign_cells(post, cents).select("vec_id", "cell")
    return maintained, rebuilt, post


def v_tagged(spark):
    maintained, rebuilt, post = _pieces(spark)
    tag = lambda df, t: df.select(F.lit(t).alias("t"))  # noqa: E731
    cdf = (
        tag(maintained.exceptAll(rebuilt), "xm")
        .unionAll(tag(rebuilt.exceptAll(maintained), "xr"))
        .unionAll(tag(maintained, "m"))
        .unionAll(tag(post, "p"))
        .groupBy("t")
        .count()
    )
    census = dict(cdf.collect())
    n_m = census.get("m", 0)
    mismatch = census.get("xm", 0) + census.get("xr", 0)
    ok = mismatch == 0 and n_m == census.get("p", 0)
    return (bool(ok), bool(n_m > 0)), cdf


def v_sequential(spark):
    maintained, rebuilt, post = _pieces(spark)
    n_m = maintained.count()
    mm = maintained.exceptAll(rebuilt).count()
    rr = rebuilt.exceptAll(maintained).count()
    ok = mm == 0 and rr == 0 and n_m == post.count()
    return (bool(ok), bool(n_m > 0)), None


def v_unionw(spark):
    maintained, rebuilt, post = _pieces(spark)
    u = maintained.withColumn("w", F.lit(1)).unionByName(
        rebuilt.withColumn("w", F.lit(-1))
    )
    sdf = (
        u.groupBy("vec_id", "cell")
        .agg(
            F.sum("w").alias("d"),
            F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).alias("cm"),
        )
        .agg(
            F.sum(F.abs(F.col("d"))).alias("mismatch"),
            F.sum("cm").alias("n_m"),
        )
    )
    row = sdf.collect()[0]
    mismatch = row["mismatch"] or 0
    n_m = row["n_m"] or 0
    return (bool(mismatch == 0), bool(n_m > 0)), sdf


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_session("ivf-ab", data_dir=SF)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)
    from shuttle_spark.plans.audit import explain_formatted

    # warm: build the staged IVF index once (cold has the Lloyd training)
    variants = {"tagged": v_tagged, "sequential": v_sequential,
                "unionw": v_unionw}
    results = {k: [] for k in variants}
    answers = {}
    for k, fn in variants.items():
        ans, plan_df = fn(spark)  # warm pass (also correctness capture)
        answers[k] = ans
        if plan_df is not None:
            with open(os.path.join(
                    plans_dir, f"ivf_upsert_verifyjob_{k}.txt"), "w") as f:
                f.write(explain_formatted(plan_df))
    print("answers:", answers)
    assert len(set(answers.values())) == 1, "variants disagree!"
    for r in range(rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark)
            results[k].append(round(time.perf_counter() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"runs": results, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
