"""Incremental IVF maintenance on the scale curve (VERDICT r8 item 5).

``ivf_upsert``'s claim: once centroids freeze, assignment is a pure
per-vector function, so maintaining the index under an arriving I/U/D
changeset costs O(churn) assignment work — re-indexing the corpus per
batch is never the plan.  The equality gate (ivf_upsert_equal) proves
the SEMANTICS; this harness prices the claim at sf1..sf10 with churn
held at ~5% updates / ~2.5% deletes / ~4% inserts.

Protocol per point:

* build the index once and WRITE IT OUT (production maintains an index
  that already exists on storage — timing upsert against a lazy build
  plan would smuggle the full corpus assignment into the "incremental"
  wall);
* ``delta_sec`` — assign cells to just the arriving I/U vectors: the
  O(churn) kernel, what a merge-on-read index write actually pays;
* ``upsert_sec`` — full ``ivf_upsert`` output materialized (anti-join
  + union + churn assignment): the copy-on-write variant, which scans
  the corpus but runs the Arrow assignment only on churn rows;
* ``rebuild_sec`` — ``assign_cells`` over the post-change corpus
  materialized the same way: the do-over baseline.

Expectation: delta_sec ~ flat in corpus size at fixed churn;
upsert_sec tracks the corpus SCAN (cheap, no Python); rebuild_sec
tracks corpus x Arrow-assignment and separates from upsert_sec as SF
grows.  All forced through the same aggregate (count + sum of cell) so
no column-pruning lets either side skip the assignment.

Run AFTER make_scale_data.py has materialized .scaledata/sf*:

    PYTHONPATH=/root/repo python tools/ivf_upsert_scale.py [sf-labels...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.3", os.path.join(REPO, ".scaledata", "sf0.3")),
    ("sf1", os.path.join(REPO, ".scaledata", "sf1")),
    ("sf3", os.path.join(REPO, ".scaledata", "sf3")),
    ("sf10", os.path.join(REPO, ".scaledata", "sf10")),
]

DIM = 64
N_CELLS = 16


def timed2(fn) -> float:
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
    from shuttle_spark.operators import similarity as S

    spark = get_session("ivf-upsert-scale")
    path = os.path.join(REPO, "BENCH_SCALE.json")
    out: dict = {"points": {}, "queries": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    row = out["queries"].setdefault("ivf_upsert", {})
    row["label"] = "no-oracle"
    row["note"] = (
        "equality-gated (ivf_upsert_equal); absolute engine walls against"
        " a MATERIALIZED on-disk index.  delta_sec = assignment of just"
        " the arriving I/U vectors (the merge-on-read write path, the"
        " O(churn) claim); upsert_sec = full copy-on-write ivf_upsert"
        " output (corpus scan, churn-only Python); rebuild_sec = frozen-"
        "centroid reassignment of the whole post-change corpus.  All"
        " forced via count+sum(cell) so column pruning cannot skip the"
        " assignment."
    )

    force = lambda df: df.agg(  # noqa: E731
        F.count("cell").alias("n"), F.sum("cell").alias("s")
    ).collect()

    for label, sf_dir in POINTS:
        if only and label not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"SKIP {label}: {sf_dir} missing", file=sys.stderr)
            continue
        emb = load_table(spark, sf_dir, "embeddings")
        n_vec = emb.count()
        indexed_lazy, cents = S.ivf_build(
            emb, dim=DIM, n_cells=N_CELLS, reuse=False
        )
        tmp = tempfile.mkdtemp(prefix=f"ivf_{label}_")
        idx_path = os.path.join(tmp, "index.parquet")
        try:
            indexed_lazy.write.mode("overwrite").parquet(idx_path)
            indexed = spark.read.parquet(idx_path)

            vid = F.col("vec_id")
            rot = lambda n: F.concat(  # noqa: E731
                F.slice(F.col("embedding"), n + 1, 10_000),
                F.slice(F.col("embedding"), 1, n),
            )
            upd = emb.filter(vid % 20 == 0).select(
                F.lit("U").alias("op"), "vec_id",
                rot(1).alias("embedding"), "label",
            )
            dele = emb.filter((vid % 20 != 0) & (vid % 40 == 1)).select(
                F.lit("D").alias("op"), "vec_id",
                F.lit(None).cast("array<float>").alias("embedding"),
                F.lit(None).cast("int").alias("label"),
            )
            ins = emb.filter(vid % 25 == 2).select(
                F.lit("I").alias("op"),
                (vid + 1_000_000_000).alias("vec_id"),
                rot(2).alias("embedding"), "label",
            )
            # changeset lands materialized too (it ARRIVES; generating it
            # from the corpus inside the timed region would bill a corpus
            # scan to the churn path)
            chg_path = os.path.join(tmp, "changes.parquet")
            upd.unionByName(dele).unionByName(ins).write.mode(
                "overwrite"
            ).parquet(chg_path)
            changes = spark.read.parquet(chg_path)
            n_churn = changes.count()

            delta_sec = timed2(
                lambda: force(
                    S.assign_cells(
                        changes.filter(F.col("op").isin("I", "U")).select(
                            "vec_id", "embedding", "label"
                        ),
                        cents,
                    )
                )
            )
            upsert_sec = timed2(
                lambda: force(S.ivf_upsert(indexed, cents, changes))
            )
            post = (
                emb.join(
                    changes.filter(F.col("op").isin("D", "U")).select(
                        "vec_id"
                    ),
                    "vec_id",
                    "left_anti",
                )
                .unionByName(
                    changes.filter(F.col("op").isin("I", "U")).select(
                        "vec_id", "embedding", "label"
                    )
                )
            )
            rebuild_sec = timed2(lambda: force(S.assign_cells(post, cents)))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        row[label] = {
            "delta_sec": round(delta_sec, 4),
            "upsert_sec": round(upsert_sec, 4),
            "rebuild_sec": round(rebuild_sec, 4),
            "vectors": n_vec,
            "churn_rows": n_churn,
            "churn_frac": round(n_churn / n_vec, 4),
            "n_cells": N_CELLS,
        }
        print(
            f"{label:7s} vecs={n_vec:>7d} churn={n_churn:>6d}"
            f" delta={delta_sec:6.3f}s upsert={upsert_sec:6.3f}s"
            f" rebuild={rebuild_sec:6.3f}s",
            flush=True,
        )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()


