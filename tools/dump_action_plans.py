"""Dump the REAL plan of every internal driver action a contract's build
performs (round 13, VERDICT r12 item 1: the r12 plan dumps for the
property-contract consolidations were stubs of the final boolean
DataFrame — the evidence needed is the tagged-union verification job's
plan, which only exists inside the build function).

Hooks DataFrame.collect/count/toPandas for the duration of each build and
writes plans/r13/<contract>_action<N>_<verb>.txt for each action, so
ReuseExchange / duplicated-subtree claims are checkable artifacts.

Usage:
    PYTHONPATH=/root/repo python tools/dump_action_plans.py [--sf DIR] name ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the abstract facade; live objects are
# classic.dataframe.DataFrame, whose own methods win attribute lookup —
# hook the concrete class.
from pyspark.sql.classic.dataframe import DataFrame

from shuttle_spark import get_session
from shuttle_spark.contracts import REGISTRY
from shuttle_spark.plans.audit import explain_formatted


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="r13")
    args = ap.parse_args()
    unknown = set(args.names) - set(REGISTRY)
    if unknown:
        raise SystemExit(f"unknown contract(s): {sorted(unknown)}")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.out)
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_session("dump-plans", data_dir=args.sf)

    real = {"collect": DataFrame.collect, "count": DataFrame.count,
            "toPandas": DataFrame.toPandas}
    state = {"name": None, "n": 0}

    def _mk(verb):
        orig = real[verb]

        def hooked(self, *a, **kw):
            if state["name"] is not None:
                state["n"] += 1
                path = os.path.join(
                    plans_dir,
                    f"{state['name']}_action{state['n']}_{verb}.txt",
                )
                try:
                    with open(path, "w") as f:
                        f.write(explain_formatted(self))
                except Exception as e:  # plan dump must never fail the build
                    print(f"  (plan dump failed: {e})")
            return orig(self, *a, **kw)

        return hooked

    for verb in real:
        setattr(DataFrame, verb, _mk(verb))
    try:
        for name in args.names:
            state["name"], state["n"] = name, 0
            REGISTRY[name].build(spark, args.sf)
            print(f"{name}: {state['n']} internal actions dumped")
            state["name"] = None
    finally:
        for verb, fn in real.items():
            setattr(DataFrame, verb, fn)
    spark.stop()


if __name__ == "__main__":
    main()
