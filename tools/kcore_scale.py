"""kcore on the scale curve (VERDICT r7 item 2).

k-core has no SQL oracle (a greatest fixed point; gated by replay
equality instead), so it can't ride tools/bench_scale.py's ratio rows —
but its cost model (rounds x per-round degree-aggregate + eager
localCheckpoint, a driver-coordinated loop) was untested beyond sf0.01.
This harness prices it: at each scale point it builds a bipartite
customer–order-bucket graph whose node space and edge count grow
LINEARLY with the data (unlike the gate contract's bounded residue
graph, which saturates at 211x199 nodes), runs the peel, and records
wall, rounds, per-round seconds, and the surviving core size into
BENCH_SCALE.json under ``kcore_peel``.

Graph: ``a = o_custkey``, ``b = OFFSET + o_orderkey // 8`` — each order
is one edge; a-degree = orders-per-customer (~10), b-degree = ~8-ish
distinct customers per key-adjacent order bucket; both sides' degree
distributions are SF-invariant under replica expansion, so every point
peels the same shape, just wider.  k=6 peels a real fraction of both
sides over several rounds at every SF (tuned at sf0.1).

Run AFTER make_scale_data.py has materialized .scaledata/sf*:

    PYTHONPATH=/root/repo python tools/kcore_scale.py [sf-labels...]
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

K = 6
B_OFFSET = 10_000_000_000_000_000  # keeps b-nodes disjoint from custkeys


def main() -> None:
    only = set(sys.argv[1:])
    from pyspark.sql import functions as F

    from shuttle_spark import get_session
    from shuttle_spark.catalog import load_table
    from shuttle_spark.operators import components as CC

    spark = get_session("kcore-scale")
    path = os.path.join(REPO, "BENCH_SCALE.json")
    out: dict = {"points": {}, "queries": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    row = out["queries"].setdefault("kcore_peel", {})
    row["label"] = "no-oracle"
    row["note"] = (
        "replay-equality gated (kcore_peel_equal); no SQL twin exists for"
        " a greatest fixed point, so these are absolute engine walls on a"
        " linearly-growing bipartite graph, not ratios"
    )
    for label, sf_dir in POINTS:
        if only and label not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"SKIP {label}: {sf_dir} missing", file=sys.stderr)
            continue
        pairs = load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("id_a"),
            (F.lit(B_OFFSET) + (F.col("o_orderkey") / 8).cast("long")).alias(
                "id_b"
            ),
        )
        n_edges = pairs.count()
        # one unmeasured warmup at the smallest point only would under-warm
        # bigger points' scans; instead every point runs twice and keeps
        # the second (parquet footers + codegen warm, same convention as
        # bench_scale's timed()).
        walls, stats = [], {}
        for _ in range(2):
            stats = {}
            t0 = time.perf_counter()
            core_nodes = CC.kcore(pairs, K, stats=stats).count()
            walls.append(time.perf_counter() - t0)
        row[label] = {
            "spark_sec": round(min(walls), 4),
            "rounds": stats["rounds"],
            "round_secs": stats["round_secs"],
            "edges": n_edges,
            "core_nodes": core_nodes,
            "k": K,
        }
        print(
            f"{label:7s} edges={n_edges:>10,} wall={min(walls):7.2f}s"
            f" rounds={stats['rounds']} core={core_nodes:,}",
            flush=True,
        )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
