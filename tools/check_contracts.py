"""Local mirror of the driver's correctness gate.

Runs every contract in shuttle_spark.contracts at a given SF: the Spark
builder and the DuckDB oracle side-by-side, compares row count, column
names, and canonicalized values.  Usage:

    PYTHONPATH=/root/repo python tools/check_contracts.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

from shuttle_spark import get_session
from shuttle_spark.contracts import REGISTRY
from shuttle_spark.testing import compare, duckdb_views


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_session("check-contracts")
    con = duckdb_views(sf_dir)
    failures = 0
    for name, c in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = c.build(spark, sf_dir)
            if c.oracle is None:
                n = sdf.count()
                print(f"ROWS  {name}: {n} rows (no oracle) [{time.time()-t0:.1f}s]")
                continue
            msgs = compare(sdf, con, c.oracle)
        except Exception as e:
            print(f"FAIL  {name}: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        if msgs:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]  " + "; ".join(msgs))
        else:
            print(f"OK    {name} [{time.time()-t0:.1f}s]")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = run(sf, sys.argv[2:])
    print("ALL GREEN" if n == 0 else f"{n} FAILURES")
    sys.exit(1 if n else 0)
