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
    the driver's oracle environment.  Tables may be single parquet files
    (the driver's testdata) or directories of part files (the synthesized
    scale points under .scaledata/)."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _dtype_kind(t: str) -> str:
    """Normalize a Spark dtype / DuckDB type string to a comparison kind.

    The driver's compare goes through pandas, where DuckDB HUGEINT and
    DECIMAL become lossy float64 while Spark decimals stay exact Decimal
    objects — so any decimal/hugeint output diverges between engines even
    when the values are identical (this bit us in CORRECTNESS_r02:
    checksum_lineitem / write_roundtrip_checksum / full_outer_nulls).
    Contracts must emit only pandas-stable kinds; 'unsafe:*' kinds are
    flagged unconditionally.
    """
    t = t.strip().lower()
    if t.startswith("decimal") or t == "hugeint":
        return f"unsafe:{t}"
    if t.endswith("[]") or t.startswith("array"):
        return "array"
    if t.startswith("struct") or t.startswith("map"):
        return t.split("(")[0].split("<")[0]
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "real", "double"):
        return "float"
    if t in ("varchar", "string", "text"):
        return "str"
    if t == "boolean":
        return "bool"
    if t.startswith("timestamp"):
        return "timestamp"
    return t


def dtype_mismatches(spark_dtypes, oracle_types, oracle_cols) -> list[str]:
    """Column-by-column dtype-kind parity between engines (driver-safe)."""
    msgs = []
    for (sc, st), ot, oc in zip(spark_dtypes, oracle_types, oracle_cols):
        sk, ok = _dtype_kind(st), _dtype_kind(str(ot))
        if sk.startswith("unsafe:") or ok.startswith("unsafe:"):
            msgs.append(
                f"pandas-unsafe dtype {sc}: spark={st} oracle={ot}"
                " (decimal/hugeint diverge in the driver's pandas compare)"
            )
        elif sk != ok:
            msgs.append(f"dtype kind {sc}: spark={st}({sk}) oracle={ot}({ok})")
    return msgs


def compare(sdf, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Run a Spark DataFrame vs a DuckDB oracle; return human-readable
    mismatch messages (empty == match)."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(oracle)
    ocols = list(rel.columns)
    otypes = list(rel.types)
    orows = rel.fetchall()
    msgs: list[str] = []
    if scols != ocols:
        msgs.append(f"columns: spark={scols} oracle={ocols}")
    msgs += dtype_mismatches(sdf.dtypes, otypes, ocols)
    if len(srows) != len(orows):
        msgs.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not msgs:
        cs, co = canon_rows(srows), canon_rows(orows)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            msgs.append(f"values differ; first diffs: {diffs}")
    return msgs
