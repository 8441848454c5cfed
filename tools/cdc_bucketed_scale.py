"""Prices the CDC snapshot-diff deployment shape (VERDICT r9 item 3).

``changeset_roundtrip`` / ``mv_incremental_totals`` carry the two worst
unexplained scale-curve marginals.  Their contracts are asymmetric BY
CONSTRUCTION — the engine derives the changeset from two full snapshots
(full-outer join) and applies/maintains it, while the oracle aggregates
the NEW snapshot directly — so the honest decomposition is:

  engine wall  =  oracle-equivalent work (checksum/aggregate of new)
               +  diff cost (full-outer join of both snapshots)
               +  apply cost (anti-join + union + re-checksum)

This tool measures each term, then prices the DEPLOYMENT FIX the
operator docstring promises: snapshots bucketed on the diff key
(``keys_nullable=False`` plain-equality join) elide the full-outer
join's BOTH exchanges — verified from the executed plan's Exchange
count, not assumed.

Run (idle box; writes nothing outside /tmp and prints one JSON line):

    PYTHONPATH=/root/repo python tools/cdc_bucketed_scale.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

PASSES = 3
BUCKETS = 16


def _wall(fn):
    samples = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def _checksum(df):
    from shuttle_spark.operators.integrity import md5_prefix32

    term = md5_prefix32(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            F.col("o_custkey").cast("string"),
            F.lit(":"),
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        )
    )
    return df.agg(F.count("*").alias("n_rows"), F.sum(term).alias("chk"))


def run_point(spark, sf_dir: str) -> dict:
    from shuttle_spark.contracts import _cdc_new, _cdc_old
    from shuttle_spark.operators import lineage as L

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    tag = "".join(ch if ch.isalnum() else "_" for ch in tag)
    old_src, new_src = _cdc_old(spark, sf_dir), _cdc_new(spark, sf_dir)

    # Materialize both snapshots ONCE (plain parquet and key-bucketed
    # tables) so every timed variant reads identical bytes; the diff is
    # what's priced, not _cdc_new's derivation arithmetic.
    plain_old = f"/tmp/cdc_scale_{tag}/old"
    plain_new = f"/tmp/cdc_scale_{tag}/new"
    old_src.write.mode("overwrite").parquet(plain_old)
    new_src.write.mode("overwrite").parquet(plain_new)
    for t, p in ((f"cdc_old_{tag}", plain_old), (f"cdc_new_{tag}", plain_new)):
        spark.sql(f"DROP TABLE IF EXISTS {t}_b")
        (
            spark.read.parquet(p)
            .write.bucketBy(BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(f"{t}_b")
        )

    def pipeline(old, new):
        changes = L.snapshot_diff(
            old, new, ["o_orderkey"], ["o_custkey", "o_totalprice"],
            keys_nullable=False,
        )
        return _checksum(L.apply_changeset(old, changes, ["o_orderkey"]))

    p_old = lambda: spark.read.parquet(plain_old)  # noqa: E731
    p_new = lambda: spark.read.parquet(plain_new)  # noqa: E731
    b_old = lambda: spark.table(f"cdc_old_{tag}_b")  # noqa: E731
    b_new = lambda: spark.table(f"cdc_new_{tag}_b")  # noqa: E731

    # warm each variant once (codegen, footers) before the timed passes
    pipeline(p_old(), p_new()).collect()
    pipeline(b_old(), b_new()).collect()
    _checksum(p_new()).collect()

    diff_only_plain = lambda: L.snapshot_diff(  # noqa: E731
        p_old(), p_new(), ["o_orderkey"], ["o_custkey", "o_totalprice"],
        keys_nullable=False,
    )
    diff_only_plain().count()

    out = {
        "sf_dir": sf_dir,
        "n_old": spark.read.parquet(plain_old).count(),
        # the oracle-equivalent term: checksum the new snapshot directly
        "oracle_equiv_sec": _wall(lambda: _checksum(p_new()).collect()),
        # diff alone (changeset row count as the action)
        "diff_plain_sec": _wall(lambda: diff_only_plain().count()),
        # full contract pipeline, plain vs bucketed inputs
        "pipeline_plain_sec": _wall(
            lambda: pipeline(p_old(), p_new()).collect()
        ),
        "pipeline_bucketed_sec": _wall(
            lambda: pipeline(b_old(), b_new()).collect()
        ),
        "exchanges_plain": _exchanges(pipeline(p_old(), p_new())),
        "exchanges_bucketed": _exchanges(pipeline(b_old(), b_new())),
    }
    return out


def main() -> None:
    from shuttle_spark import get_session

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_session("cdc-bucketed-scale", data_dir=sf_dirs[0])
    points = [run_point(spark, d) for d in sf_dirs]
    print(json.dumps({"buckets": BUCKETS, "passes": PASSES,
                      "points": points}, indent=1))


if __name__ == "__main__":
    main()
