"""Local mirror of the driver's correctness gate.

Runs every contract in shuttle_spark.contracts at a given SF: the Spark
builder and the DuckDB oracle side-by-side, compares row count, column
names, and canonicalized values.  Usage:

    PYTHONPATH=/root/repo python tools/check_contracts.py [sf_dir] [name ...]
    PYTHONPATH=/root/repo python tools/check_contracts.py --json OUT.json [sf_dir]

--json writes the full-registry result file (the driver's CORRECTNESS file
covers only the first 50 registry entries; this artifact covers ALL).
"""

from __future__ import annotations

import json
import sys
import time

from shuttle_spark import get_session
from shuttle_spark.contracts import REGISTRY
from shuttle_spark.testing import compare, duckdb_views


def run(sf_dir: str, only: list[str], json_out: str | None = None) -> int:
    unknown = set(only) - set(REGISTRY)
    if unknown:
        # a misspelled name would otherwise skip silently and the gate
        # would print ALL GREEN having run nothing
        print(f"unknown contract name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_session("check-contracts")
    con = duckdb_views(sf_dir)
    failures = 0
    results: dict[str, dict] = {}
    for name, c in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = c.build(spark, sf_dir)
            if c.oracle is None:
                n = sdf.count()
                print(f"ROWS  {name}: {n} rows (no oracle) [{time.time()-t0:.1f}s]")
                results[name] = {"ok": None, "rows": n, "err": "no_oracle",
                                 "sec": round(time.time() - t0, 2)}
                continue
            msgs = compare(sdf, con, c.oracle)
        except Exception as e:
            print(f"FAIL  {name}: {str(e).splitlines()[0][:200]}")
            failures += 1
            results[name] = {"ok": False, "err": str(e).splitlines()[0][:200]}
            continue
        results[name] = {"ok": not msgs, "err": "; ".join(msgs) or None,
                         "sec": round(time.time() - t0, 2)}
        if msgs:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]  " + "; ".join(msgs))
        else:
            print(f"OK    {name} [{time.time()-t0:.1f}s]")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_contracts": len(results),
                    "n_failed": failures,
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return failures


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    n = run(sf, argv[1:], json_out)
    print("ALL GREEN" if n == 0 else f"{n} FAILURES")
    sys.exit(1 if n else 0)
