"""Synthesize larger scale points from the driver's sf0.1 testdata.

VERDICT r3 item 1: the perf defense ("Spark's per-query floor amortizes as
data grows") needs a measured ratio CURVE, which needs data bigger than the
shipped sf0.1.  This derives sfN = N x sf0.1 by replica-offset expansion of
the driver's own tables (never hand-rolled distributions — the verdict's
"synthesize 10x lineitem+documents" option):

* Fact/dim tables replicate with per-replica KEY OFFSETS (replica i adds
  i * (max_key+1) to every key column), so join fan-outs, group counts and
  per-key cardinalities scale exactly like TPC-H does between SFs: 10x
  rows, 10x keys, same per-group row counts per key, same value
  distributions.
* ``documents`` additionally prefixes every token with a replica tag
  (``r3_word``): within-replica n-gram/MinHash similarity structure is
  IDENTICAL to sf0.1 while cross-replica similarity is zero — without
  this, every document would be a near-duplicate of its 9 clones and the
  pair count would grow O(replicas^2) instead of O(replicas).
* ``embeddings`` offsets vec_id and rotates each vector by a deterministic
  per-replica permutation (cosine structure within a replica preserved,
  cross-replica collisions/ties avoided).
* ``region``/``nation`` stay fixed (TPC-H semantics: constant dims).

Usage:
    python tools/make_scale_data.py [--replicas 10] [--out .scaledata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# key columns to offset per table: {table: {col: domain_table_or_self}}
KEYED = {
    "customer": ["c_custkey", "c_nationkey:fixed"],
    "supplier": ["s_suppkey", "s_nationkey:fixed"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def _maxes(spark, tables: set[str]) -> dict[str, int]:
    out = {}
    for t, cols in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for spec in cols:
            col = spec.split(":")[0]
            if spec.endswith(":fixed") or col in out:
                continue
            out[col] = df.agg(F.max(col)).collect()[0][0]
    return out


def _replicate(df: DataFrame, table: str, maxes: dict[str, int], n: int) -> DataFrame:
    reps = []
    for i in range(n):
        r = df
        for spec in KEYED[table]:
            col = spec.split(":")[0]
            if spec.endswith(":fixed"):
                continue  # nationkey etc: dims stay constant across SFs
            r = r.withColumn(col, (F.col(col) + i * (maxes[col] + 1)).cast("long"))
        if table == "documents" and i > 0:
            # per-replica token tag: identical intra-replica similarity
            # structure, zero cross-replica similarity (see module doc).
            r = r.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}_$1")
            )
        if table == "embeddings" and i > 0:
            # deterministic rotation: shift the float array by i positions.
            r = r.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), i + 1, 10_000),
                    F.slice(F.col("embedding"), 1, i),
                ),
            )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        f"sf{args.replicas / 10:g}",
    )
    os.makedirs(out_dir, exist_ok=True)

    from shuttle_spark import get_session

    spark = get_session("make-scale-data")
    maxes = _maxes(spark, set(KEYED))
    for t in FIXED:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t in KEYED:
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        big = _replicate(src, t, maxes, args.replicas)
        # a few output files per table so downstream scans parallelize the
        # way a real sfN table (many row groups) would
        big.repartition(max(4, args.replicas)).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"{t}: x{args.replicas} -> {big.count()} rows")
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
