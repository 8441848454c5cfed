"""Reconciliation LOCALIZATION on the scale curve (VERDICT r8 item 3).

tools/bench_scale.py's ``table_recon_*`` rows use the gate contract
verbatim — fixed-FRACTION corruption, so corrupt keys grow with SF and
by sf0.3 nearly every one of the 64 buckets is suspect: the drill
honestly degrades toward a full-table diff.  That row prices the
worst case, not the claim.

The claim worth a measured cell is the 100 TB migration-verification
shape: a replica that is almost equal (a FIXED handful of corrupt keys
no matter how big the table), where

* the CENSUS collapses both tables to 64 (count, hash-sum) rows — cost
  = two scans + two tiny aggregates, near-flat per byte scanned;
* the DRILL filters both sides to the ~dozen suspect buckets BEFORE the
  exceptAll, so the expensive multiset diff shuffles only
  suspect-bucket rows (~bad/64 of the table), never the table.

This harness corrupts a fixed COUNT (~8 content flips + ~4 deletes,
moduli derived from the row count) at every scale point and measures
census, drill, and — the naive alternative the drill exists to avoid —
a full-table two-way exceptAll, recording suspect-row volume so the
"shuffles only the suspect buckets" claim is a number, not prose.
Caveat recorded in the note: the drill's SCAN is still full-table
(the bucket predicate is md5-of-key, not a parquet-prunable column);
storing the table bucketed BY the recon bucket would prune that too.

Run AFTER make_scale_data.py has materialized .scaledata/sf*:

    PYTHONPATH=/root/repo python tools/recon_scale.py [sf-labels...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.3", os.path.join(REPO, ".scaledata", "sf0.3")),
    ("sf1", os.path.join(REPO, ".scaledata", "sf1")),
    ("sf3", os.path.join(REPO, ".scaledata", "sf3")),
    ("sf10", os.path.join(REPO, ".scaledata", "sf10")),
]

N_BUCKETS = 64
TARGET_FLIPS = 8
TARGET_DROPS = 4


def timed2(fn) -> float:
    """Best-of-2 with an unmeasured warm pass (bench_scale convention)."""
    fn()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    only = set(sys.argv[1:])
    from pyspark.sql import functions as F

    from shuttle_spark import get_session
    from shuttle_spark.catalog import load_table
    from shuttle_spark.operators.integrity import (
        md5_prefix32,
        table_recon,
        table_recon_drill,
    )

    spark = get_session("recon-scale")
    path = os.path.join(REPO, "BENCH_SCALE.json")
    out: dict = {"points": {}, "queries": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    row = out["queries"].setdefault("table_recon_localized", {})
    row["label"] = "no-oracle"
    row["note"] = (
        "fixed-COUNT corruption (~8 flips + ~4 drops at EVERY SF) — the"
        " almost-equal-replica case the census/drill split exists for;"
        " absolute engine walls, no ratio (the gate contract's"
        " fixed-fraction twin rides bench_scale).  drill_sec shuffles"
        " only suspect-bucket rows (suspect_rows column); full_diff_sec"
        " is the naive full-table two-way exceptAll it replaces.  The"
        " drill SCAN is still full-table (md5-of-key bucket predicate"
        " is not parquet-prunable); a table STORED bucketed by the recon"
        " bucket would prune the scan too."
    )
    cols = ["o_orderkey", "o_custkey", "cents"]
    for label, sf_dir in POINTS:
        if only and label not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"SKIP {label}: {sf_dir} missing", file=sys.stderr)
            continue
        base = load_table(spark, sf_dir, "orders")
        n_rows = base.count()
        flip_mod = max(2, n_rows // TARGET_FLIPS)
        drop_mod = max(3, n_rows // TARGET_DROPS)
        cents = F.round(F.col("o_totalprice") * 100).cast("long")
        left = base.select("o_orderkey", "o_custkey", cents.alias("cents"))
        right = base.filter(F.col("o_orderkey") % drop_mod != 1).select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("o_orderkey") % flip_mod == 0, cents + 1)
            .otherwise(cents)
            .alias("cents"),
        )

        census_sec = timed2(
            lambda: table_recon(left, right, cols, N_BUCKETS).collect()
        )
        census = table_recon(left, right, cols, N_BUCKETS).collect()
        bad = [r["bucket"] for r in census if r["status"] != "match"]
        # suspect-bucket row volume (unmeasured bookkeeping): what the
        # drill's exceptAll is allowed to shuffle
        bucket = F.pmod(
            md5_prefix32(F.col("o_orderkey").cast("string")), F.lit(N_BUCKETS)
        )
        suspect_rows = left.filter(bucket.isin([int(b) for b in bad])).count()

        drill_sec = timed2(
            lambda: table_recon_drill(left, right, cols, bad, N_BUCKETS)
            .groupBy("side")
            .count()
            .collect()
        )
        full_diff_sec = timed2(
            lambda: (
                left.exceptAll(right).count(),
                right.exceptAll(left).count(),
            )
        )
        row[label] = {
            "census_sec": round(census_sec, 4),
            "drill_sec": round(drill_sec, 4),
            "full_diff_sec": round(full_diff_sec, 4),
            "rows": n_rows,
            "suspect_rows": suspect_rows,
            "suspect_frac": round(suspect_rows / n_rows, 4),
            "bad_buckets": len(bad),
            "n_buckets": N_BUCKETS,
        }
        print(
            f"{label:7s} rows={n_rows:>9d} bad={len(bad):2d}/{N_BUCKETS}"
            f" suspect={suspect_rows:>8d} census={census_sec:6.2f}s"
            f" drill={drill_sec:6.2f}s full_diff={full_diff_sec:6.2f}s",
            flush=True,
        )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
