"""Round-12 optimization measurement harness.

Times individual contracts (bench.py methodology: cold + 2 warm collect()
runs on a corpus-profiled session) and dumps each query's
``explain("formatted")`` to plans/r12/<name>_<tag>.txt so before/after plan
claims in OPTIMIZATION_r12.md are checkable artifacts.

Usage:
    PYTHONPATH=/root/repo python tools/opt_measure.py --tag before [--sf DIR]
        [--runs N] name [name ...]
    PYTHONPATH=/root/repo python tools/opt_measure.py --tag after --json OUT \
        name ...

Timing matches bench.py (collect), and a separate noop-sink time is
recorded (guide §1.4) so computation is separable from result transfer.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from shuttle_spark import get_session
from shuttle_spark.contracts import REGISTRY


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--plans-dir", default="r13",
                    help="subdirectory of plans/ for the explain dumps")
    args = ap.parse_args()

    unknown = set(args.names) - set(REGISTRY)
    if unknown:
        raise SystemExit(f"unknown contract(s): {sorted(unknown)}")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_session("opt-measure", data_dir=args.sf)
    # Warm-up (bench.py convention)
    REGISTRY["agg_tpch_q1"].build(spark, args.sf).collect()

    out: dict[str, dict] = {}
    for name in args.names:
        c = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        t0 = time.perf_counter()
        df = c.build(spark, args.sf)
        df.collect()
        cold = time.perf_counter() - t0
        warm = []
        n_jobs = None
        for i in range(args.runs):
            group = f"opt_{name}_{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            c.build(spark, args.sf).collect()
            warm.append(time.perf_counter() - t0)
            # sequential-job count for this warm run (the fixed-cost
            # multiplier at test SF; guide §1.2)
            tracker = spark.sparkContext._jsc.sc().statusTracker()
            n_jobs = len(tracker.getJobIdsForGroup(group))
            spark.sparkContext.setJobGroup(f"opt_{name}_done", name)
        # noop-sink time (computation without the collect transfer)
        t0 = time.perf_counter()
        c.build(spark, args.sf).write.format("noop").mode("overwrite").save()
        noop = time.perf_counter() - t0
        if not args.no_plans:
            from shuttle_spark.plans.audit import explain_formatted

            plan = explain_formatted(c.build(spark, args.sf))
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        rec = {
            "cold": round(cold, 3),
            "warm": [round(w, 3) for w in warm],
            "warm_min": round(min(warm), 3),
            "noop": round(noop, 3),
            "jobs": n_jobs,
        }
        out[name] = rec
        print(name, json.dumps(rec))
        spark.sparkContext.setJobDescription(None)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
