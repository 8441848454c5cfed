"""Cross-engine comparison helpers shared by tests/ and tools/.

Mirrors the driver's correctness gate: canonicalize both engines' rows
(doubles -> 12 significant digits, timestamps -> ISO-8601, NULL -> sentinel),
sort, compare.  See FIXTURES.md "Canonicalization & hashing rules".
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from shuttle_spark.catalog import TABLES, table_path

NULL = "∅"


def canon_cell(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.12g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def canon_rows(rows) -> list[tuple[str, ...]]:
    return sorted(tuple(canon_cell(c) for c in row) for row in rows)


def duckdb_views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with the testdata tables registered as views —
    the driver's oracle environment."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def compare(sdf, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Run a Spark DataFrame vs a DuckDB oracle; return human-readable
    mismatch messages (empty == match)."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    msgs: list[str] = []
    if scols != ocols:
        msgs.append(f"columns: spark={scols} oracle={ocols}")
    if len(srows) != len(orows):
        msgs.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not msgs:
        cs, co = canon_rows(srows), canon_rows(orows)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            msgs.append(f"values differ; first diffs: {diffs}")
    return msgs
