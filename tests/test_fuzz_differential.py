"""Differential query fuzzer (VERDICT r4 item 8): hypothesis-generated
agg / sort / join / window specs compiled to BOTH engines — the Spark
DataFrame API and DuckDB SQL over the same parquet — and compared with the
driver's canonicalization (testing.canon_rows).

The r4 half-tie find (hypothesis caught a real cross-engine rounding trap
in the mixture test) proved the strategy out; this generalizes it: instead
of fixed contract queries, the fuzzer searches the SPEC space — random
predicate combinations, grouping sets, aggregate subsets, sort directions,
limits, rank cutoffs — for semantic gaps between the engines (rounding,
null ordering, tie handling, type widening).

Cross-engine discipline (the traps are known and deliberately designed
around, so a failure here is a real bug, not comparison noise):

* doubles are never summed/averaged directly — money aggregates use the
  scaled-long form ``FLOOR(x*100 + 0.5)::BIGINT`` on both sides
  (association-free, bit-stable; Python round() is banker's so the
  reference is floor(+0.5), see shuttle-testdata notes);
* DuckDB SUM(BIGINT) returns HUGEINT — every SQL sum is CAST back to
  BIGINT to stay pandas-safe (testing._dtype_kind flags it otherwise);
* every ORDER BY / window ORDER BY carries the unique o_orderkey tiebreak
  so LIMIT / rank cutoffs select identical row sets in both engines.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from shuttle_spark.catalog import load_table
from shuttle_spark.testing import canon_rows, duckdb_views

SF = "/root/testdata/sf0.001"

import os

# FUZZ_EXAMPLES overrides the per-mode example budget (default 70 keeps CI
# time bounded; deep sweeps set hundreds — the search is the product).
FUZZ = settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "70")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_views(SF)
    yield con
    con.close()


# ---------------------------------------------------------------------------
# Spec vocabulary: each entry is (spark_builder, sql_fragment) over `orders`
# (o_orderkey unique -> deterministic tiebreaks everywhere).
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUSES = ["O", "F", "P"]


def _filters():
    """Strategy for a list of 0-2 cross-engine-identical predicates."""
    price = st.integers(1_000, 400_000).map(
        lambda v: (
            lambda df: df.filter(F.col("o_totalprice") < float(v)),
            f"o_totalprice < {v}",
        )
    )
    prio = st.sampled_from(_PRIORITIES).map(
        lambda p: (
            lambda df: df.filter(F.col("o_orderpriority") == p),
            f"o_orderpriority = '{p}'",
        )
    )
    status = st.sampled_from(_STATUSES).map(
        lambda s: (
            lambda df: df.filter(F.col("o_orderstatus") == s),
            f"o_orderstatus = '{s}'",
        )
    )
    mod = st.tuples(st.integers(2, 13), st.integers(0, 12)).map(
        lambda mr: (
            lambda df: df.filter(F.col("o_custkey") % mr[0] == mr[1] % mr[0]),
            f"o_custkey % {mr[0]} = {mr[1] % mr[0]}",
        )
    )
    date = st.tuples(st.integers(1995, 2001), st.integers(1, 12)).map(
        lambda ym: (
            lambda df: df.filter(
                F.col("o_orderdate") >= F.lit(datetime.date(ym[0], ym[1], 1))
            ),
            f"o_orderdate >= DATE '{ym[0]}-{ym[1]:02d}-01'",
        )
    )
    return st.lists(
        st.one_of(price, prio, status, mod, date), min_size=0, max_size=2
    )


# group columns: (name, spark Column factory, sql expr).  Factories, not
# Columns: building a Column needs an active SparkContext, which does not
# exist at module import time.
_GROUPS = {
    "prio": (lambda: F.col("o_orderpriority").alias("prio"), "o_orderpriority"),
    "status": (lambda: F.col("o_orderstatus").alias("status"), "o_orderstatus"),
    "yr": (
        lambda: F.year("o_orderdate").alias("yr"),
        "CAST(YEAR(o_orderdate) AS INT)",
    ),
}

# aggregates: (name, spark Column factory, sql expr) — scaled-long money,
# no HUGEINT
_SCALED = "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
_AGGS = {
    "cnt": (lambda: F.count("*").alias("cnt"), "COUNT(*) AS cnt"),
    "sum_price_c": (
        lambda: F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("sum_price_c"),
        f"{_SCALED} AS sum_price_c",
    ),
    "min_key": (
        lambda: F.min("o_orderkey").alias("min_key"),
        "MIN(o_orderkey) AS min_key",
    ),
    "max_key": (
        lambda: F.max("o_orderkey").alias("max_key"),
        "MAX(o_orderkey) AS max_key",
    ),
    "n_cust": (
        lambda: F.countDistinct("o_custkey").alias("n_cust"),
        "COUNT(DISTINCT o_custkey) AS n_cust",
    ),
}


def _apply(df, filters):
    for fn, _ in filters:
        df = fn(df)
    return df


def _where(filters) -> str:
    return (
        " WHERE " + " AND ".join(sql for _, sql in filters) if filters else ""
    )


def _check(sdf, duck, sql):
    srows = canon_rows([tuple(r) for r in sdf.collect()])
    orows = canon_rows(duck.execute(sql).fetchall())
    assert srows == orows, f"mismatch for oracle: {sql}"


# ---------------------------------------------------------------------------
# Mode 1: filter -> groupBy -> agg  (the B5/B6 shape)
# ---------------------------------------------------------------------------

@given(
    filters=_filters(),
    groups=st.lists(
        st.sampled_from(sorted(_GROUPS)), unique=True, min_size=0, max_size=2
    ),
    aggs=st.lists(
        st.sampled_from(sorted(_AGGS)), unique=True, min_size=1, max_size=3
    ),
)
@FUZZ
def test_fuzz_filter_group_agg(spark, duck, filters, groups, aggs):
    orders = _apply(load_table(spark, SF, "orders"), filters)
    gcols = [_GROUPS[g][0]() for g in groups]
    acols = [_AGGS[a][0]() for a in aggs]
    sdf = orders.groupBy(*gcols).agg(*acols) if groups else orders.agg(*acols)
    gsql = ", ".join(f"{_GROUPS[g][1]} AS {g}" for g in groups)
    asql = ", ".join(_AGGS[a][1] for a in aggs)
    sel = ", ".join(x for x in (gsql, asql) if x)
    sql = f"SELECT {sel} FROM orders{_where(filters)}"
    if groups:
        sql += " GROUP BY " + ", ".join(_GROUPS[g][1] for g in groups)
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 2: filter -> project -> order by (dirs) -> limit  (the B2/B9 shape)
# ---------------------------------------------------------------------------

@given(
    filters=_filters(),
    descs=st.lists(st.booleans(), min_size=1, max_size=2),
    limit=st.integers(1, 120),
)
@FUZZ
def test_fuzz_sort_limit(spark, duck, filters, descs, limit):
    sort_cols = ["o_totalprice", "o_custkey"][: len(descs)]
    orders = _apply(load_table(spark, SF, "orders"), filters)
    sort = [
        (F.col(c).desc() if d else F.col(c).asc())
        for c, d in zip(sort_cols, descs)
    ] + [F.col("o_orderkey")]
    sdf = orders.select("o_orderkey", "o_custkey").orderBy(*sort).limit(limit)
    osql = ", ".join(
        f"{c} {'DESC' if d else 'ASC'}" for c, d in zip(sort_cols, descs)
    )
    sql = (
        f"SELECT o_orderkey, o_custkey FROM orders{_where(filters)}"
        f" ORDER BY {osql}, o_orderkey LIMIT {limit}"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 3: filtered join -> group agg  (the B12 shape)
# ---------------------------------------------------------------------------

@given(
    filters=_filters(),
    aggs=st.lists(
        st.sampled_from(["cnt", "sum_price_c", "n_cust"]),
        unique=True,
        min_size=1,
        max_size=2,
    ),
)
@FUZZ
def test_fuzz_join_group_agg(spark, duck, filters, aggs):
    orders = _apply(load_table(spark, SF, "orders"), filters)
    cust = load_table(spark, SF, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    sdf = joined.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        *[_AGGS[a][0]() for a in aggs]
    )
    asql = ", ".join(_AGGS[a][1] for a in aggs)
    sql = (
        f"SELECT c_mktsegment AS seg, {asql}"
        f" FROM orders JOIN customer ON o_custkey = c_custkey"
        f"{_where(filters)} GROUP BY c_mktsegment"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 4: ranking window with cutoff  (the B18 shape; total order via key)
# ---------------------------------------------------------------------------

@given(
    filters=_filters(),
    method=st.sampled_from(["rank", "dense_rank", "row_number"]),
    cutoff=st.integers(1, 15),
    desc=st.booleans(),
)
@FUZZ
def test_fuzz_window_rank_cutoff(spark, duck, filters, method, cutoff, desc):
    fns = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}
    orders = _apply(load_table(spark, SF, "orders"), filters)
    order = (
        [F.col("o_totalprice").desc(), F.col("o_orderkey")]
        if desc
        else [F.col("o_totalprice").asc(), F.col("o_orderkey")]
    )
    w = Window.partitionBy("o_orderpriority").orderBy(*order)
    sdf = (
        orders.select(
            "o_orderkey",
            F.col("o_orderpriority").alias("prio"),
            fns[method]().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= cutoff)
    )
    direction = "DESC" if desc else "ASC"
    sql = (
        f"SELECT o_orderkey, o_orderpriority AS prio, rnk FROM ("
        f"SELECT o_orderkey, o_orderpriority,"
        f" CAST({method.upper()}() OVER (PARTITION BY o_orderpriority"
        f" ORDER BY o_totalprice {direction}, o_orderkey) AS INT) AS rnk"
        f" FROM orders{_where(filters)}) WHERE rnk <= {cutoff}"
    )
    _check(sdf, duck, sql)

# ---------------------------------------------------------------------------
# Mode 5: rollup aggregates  (the B16 shape; grouping-null semantics)
# ---------------------------------------------------------------------------

@given(
    filters=_filters(),
    aggs=st.lists(
        st.sampled_from(["cnt", "sum_price_c", "min_key"]),
        unique=True,
        min_size=1,
        max_size=2,
    ),
)
@FUZZ
def test_fuzz_rollup_agg(spark, duck, filters, aggs):
    orders = _apply(load_table(spark, SF, "orders"), filters)
    sdf = orders.rollup(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
    ).agg(*[_AGGS[a][0]() for a in aggs])
    asql = ", ".join(_AGGS[a][1] for a in aggs)
    sql = (
        f"SELECT o_orderpriority AS prio, o_orderstatus AS status, {asql}"
        f" FROM orders{_where(filters)}"
        f" GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
    )
    srows = canon_rows([tuple(r) for r in sdf.collect()])
    orows = canon_rows(duck.execute(sql).fetchall())
    if not srows and len(orows) == 1:
        # REAL cross-engine gap, FOUND BY THIS FUZZER (round 5): over an
        # empty input, SQL-standard ROLLUP still emits the () grouping-set
        # row — a global aggregate over zero rows — so DuckDB (and
        # Postgres) return one (NULL, NULL, count=0, ...) row while Spark's
        # rollup returns zero rows.  Pinned here as the exact divergence
        # (anything else still fails); documented in
        # operators/relational.py rollup_aggregate.
        row = orows[0]
        assert row[0] == row[1] == "∅", f"unexpected shape: {row} for {sql}"
        return
    assert srows == orows, f"mismatch for oracle: {sql}"


# ---------------------------------------------------------------------------
# Mode 6: set operations on filtered key projections  (the B15 shape)
# ---------------------------------------------------------------------------

@given(
    f_left=_filters(),
    f_right=_filters(),
    op=st.sampled_from(["intersect", "except", "union_all"]),
)
@FUZZ
def test_fuzz_set_ops(spark, duck, f_left, f_right, op):
    base = load_table(spark, SF, "orders")
    l = _apply(base, f_left).select("o_custkey")
    r = _apply(base, f_right).select("o_custkey")
    if op == "intersect":
        sdf, sop = l.intersect(r), "INTERSECT"
    elif op == "except":
        # subtract = SET difference (SQL EXCEPT); exceptAll is the bag form
        # and diverges whenever a key is more frequent on the left.
        sdf, sop = l.subtract(r), "EXCEPT"
    else:
        sdf, sop = l.unionAll(r), "UNION ALL"
    sdf = sdf.agg(F.count("*").alias("cnt"))
    sql = (
        f"SELECT COUNT(*) AS cnt FROM ("
        f"SELECT o_custkey FROM orders{_where(f_left)}"
        f" {sop} "
        f"SELECT o_custkey FROM orders{_where(f_right)})"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 7: scalar-function projections  (the B19 shape)
# ---------------------------------------------------------------------------

# (name, spark Column factory, sql expr) — cross-engine-identical scalars;
# date_trunc returns TIMESTAMP in Spark vs DATE in DuckDB, so the date
# scalars use trunc()/CAST to keep dtype kinds aligned; DOW shifts by one
# (DuckDB Sunday=0, Spark dayofweek Sunday=1).
_SCALARS = {
    "name8": (
        lambda: F.substring("o_orderpriority", 1, 4).alias("name8"),
        "SUBSTR(o_orderpriority, 1, 4) AS name8",
    ),
    "price_r1": (
        lambda: F.round(F.col("o_totalprice"), 1).alias("price_r1"),
        "ROUND(o_totalprice, 1) AS price_r1",
    ),
    "month_start": (
        lambda: F.trunc("o_orderdate", "month").alias("month_start"),
        "CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start",
    ),
    "dow": (
        lambda: (F.dayofweek("o_orderdate") - 1).alias("dow"),
        "EXTRACT(DOW FROM o_orderdate)::INT AS dow",
    ),
    "key_mod": (
        lambda: (F.col("o_orderkey") % 97).alias("key_mod"),
        "o_orderkey % 97 AS key_mod",
    ),
}


@given(
    filters=_filters(),
    scalars=st.lists(
        st.sampled_from(sorted(_SCALARS)), unique=True, min_size=1, max_size=3
    ),
    limit=st.integers(1, 80),
)
@FUZZ
def test_fuzz_scalar_projection(spark, duck, filters, scalars, limit):
    orders = _apply(load_table(spark, SF, "orders"), filters)
    sdf = (
        orders.select("o_orderkey", *[_SCALARS[s][0]() for s in scalars])
        .orderBy("o_orderkey")
        .limit(limit)
    )
    ssql = ", ".join(_SCALARS[s][1] for s in scalars)
    sql = (
        f"SELECT o_orderkey, {ssql} FROM orders{_where(filters)}"
        f" ORDER BY o_orderkey LIMIT {limit}"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 8: HAVING — post-aggregation filters on aggregate values
# ---------------------------------------------------------------------------

@given(
    filters=_filters(),
    min_cnt=st.integers(1, 400),
)
@FUZZ
def test_fuzz_group_having(spark, duck, filters, min_cnt):
    orders = _apply(load_table(spark, SF, "orders"), filters)
    sdf = (
        orders.groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("o_orderkey").alias("min_key"),
        )
        .filter(F.col("cnt") >= min_cnt)
    )
    sql = (
        f"SELECT o_orderpriority AS prio, COUNT(*) AS cnt,"
        f" MIN(o_orderkey) AS min_key"
        f" FROM orders{_where(filters)} GROUP BY o_orderpriority"
        f" HAVING COUNT(*) >= {min_cnt}"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 9: null-injected outer joins  (the B14 shape — NULL join keys and
# NULL aggregate inputs flowing through inner/left/full joins into
# sentinel aggregates, the divergence class the round-5 review caught in
# full_outer_nulls' eager-aggregation rewrite)
# ---------------------------------------------------------------------------

@given(
    how=st.sampled_from(["inner", "left", "full"]),
    key_mod=st.integers(2, 9),
    price_mod=st.integers(2, 7),
    filters=_filters(),
)
@FUZZ
def test_fuzz_null_injected_outer_join(
    spark, duck, how, key_mod, price_mod, filters
):
    """NULLs are injected deterministically on BOTH engines: every
    key_mod-th order loses its join key (NULL never matches — those rows
    survive only via the outer side, landing in the NULL-segment group)
    and every price_mod-th order loses its price (per-row -1 sentinel over
    groups that mix NULL and non-NULL inputs).  Searches join-type x
    null-rate x predicate space for null-semantics gaps: null-key
    matching, outer-row fabrication, NULL group keys, sentinel CASE
    evaluation order."""
    orders = _apply(load_table(spark, SF, "orders"), filters).select(
        F.when(
            F.col("o_orderkey") % key_mod == 0, F.lit(None).cast("bigint")
        )
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        F.when(
            F.col("o_orderkey") % price_mod == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
    )
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = orders.join(cust, orders.k == cust.c_custkey, how)
    sdf = joined.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("cnt"),
        F.count("p").alias("n_priced"),
        F.sum(
            F.when(F.col("p").isNull(), F.lit(-1).cast("long")).otherwise(
                F.floor(F.col("p") * 100 + F.lit(0.5)).cast("long")
            )
        )
        .cast("long")
        .alias("sentinel_c"),
    )
    jtype = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "full": "FULL OUTER JOIN",
    }[how]
    sql = (
        "SELECT c_mktsegment AS seg, COUNT(*) AS cnt, COUNT(p) AS n_priced,"
        " CAST(SUM(CASE WHEN p IS NULL THEN CAST(-1 AS BIGINT)"
        "  ELSE CAST(FLOOR(p * 100 + 0.5) AS BIGINT) END) AS BIGINT)"
        " AS sentinel_c"
        " FROM (SELECT"
        f"  CASE WHEN o_orderkey % {key_mod} = 0 THEN NULL"
        "   ELSE o_custkey END AS k,"
        f"  CASE WHEN o_orderkey % {price_mod} = 0 THEN NULL"
        "   ELSE o_totalprice END AS p"
        f"  FROM orders{_where(filters)}) o"
        f" {jtype} customer ON k = c_custkey"
        " GROUP BY c_mktsegment"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 10: calendar arithmetic  (B19 date functions — truncation, month
# ends, interval shifts, ISO weekday/week numbering; the classic
# cross-engine divergence area: week-numbering conventions, weekday
# origins, month-end clamping)
# ---------------------------------------------------------------------------

# (name, spark Column factory, sql expr) — each pair chosen so the two
# engines state the SAME convention explicitly: Spark weekday() is Mon=0
# while DuckDB isodow() is Mon=1, so the Spark side ships +1; interval
# adds produce TIMESTAMP in DuckDB, so the SQL side casts back to DATE.
_DATE_EXPRS = {
    "month_start": (
        lambda n: F.trunc("o_orderdate", "month"),
        lambda n: "CAST(date_trunc('month', o_orderdate) AS DATE)",
    ),
    "month_end": (
        lambda n: F.last_day("o_orderdate"),
        lambda n: "last_day(o_orderdate)",
    ),
    "plus_days": (
        lambda n: F.date_add("o_orderdate", n),
        # INTERVAL -1 DAY is a parse error in DuckDB; multiply instead
        lambda n: f"CAST(o_orderdate + ({n}) * INTERVAL 1 DAY AS DATE)",
    ),
    "iso_weekday": (
        lambda n: (F.weekday("o_orderdate") + F.lit(1)).cast("int"),
        lambda n: "CAST(isodow(o_orderdate) AS INT)",
    ),
    "iso_week": (
        lambda n: F.weekofyear("o_orderdate").cast("int"),
        lambda n: "CAST(weekofyear(o_orderdate) AS INT)",
    ),
    "days_since": (
        lambda n: F.datediff(
            "o_orderdate", F.lit(datetime.date(1995, 1, 1))
        ).cast("int"),
        lambda n: "CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT)",
    ),
}


@given(
    expr=st.sampled_from(sorted(_DATE_EXPRS)),
    n=st.integers(-400, 400),
    filters=_filters(),
)
@FUZZ
def test_fuzz_date_arithmetic(spark, duck, expr, n, filters):
    orders = _apply(load_table(spark, SF, "orders"), filters)
    scol, ssql = _DATE_EXPRS[expr]
    sdf = orders.groupBy(scol(n).alias("d")).agg(
        F.count("*").alias("cnt"),
        F.min("o_orderkey").alias("min_key"),
    )
    sql = (
        f"SELECT {ssql(n)} AS d, COUNT(*) AS cnt, MIN(o_orderkey) AS min_key"
        f" FROM orders{_where(filters)} GROUP BY 1"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 11: null-aware membership  (B14's null-aware anti join — NOT IN
# over a subquery that may produce NULLs is three-valued-logic territory:
# one NULL in the list annihilates every NOT IN row)
# ---------------------------------------------------------------------------

@given(
    neg=st.booleans(),
    inject_null=st.booleans(),
    bal=st.integers(-900, 9000),
    mod=st.integers(2, 9),
)
@FUZZ
def test_fuzz_null_aware_membership(spark, duck, neg, inject_null, bal, mod):
    """IN / NOT IN over a correlated-free subquery, with and without NULLs
    injected into the membership list (every mod-th custkey nulled).  The
    same SQL text runs on both engines — Spark plans NOT IN as a
    null-aware anti join whose semantics (empty result once the list
    holds a NULL) both engines must state identically."""
    member = (
        f"CASE WHEN c_custkey % {mod} = 0 THEN NULL ELSE c_custkey END"
        if inject_null
        else "c_custkey"
    )
    op = "NOT IN" if neg else "IN"
    sql = (
        f"SELECT COUNT(*) AS cnt,"
        f" COALESCE(MIN(o_orderkey), -1) AS min_key FROM orders"
        f" WHERE o_custkey {op}"
        f" (SELECT {member} FROM customer WHERE c_acctbal < {bal})"
    )
    load_table(spark, SF, "orders").createOrReplaceTempView("orders")
    load_table(spark, SF, "customer").createOrReplaceTempView("customer")
    srows = canon_rows([tuple(r) for r in spark.sql(sql).collect()])
    orows = canon_rows(duck.execute(sql).fetchall())
    assert srows == orows, f"mismatch for: {sql}"


# ---------------------------------------------------------------------------
# Mode 12: string-function pipelines  (B19 string functions — position
# origins, negative starts, NULL propagation, concat_ws NULL-skipping)
# ---------------------------------------------------------------------------

_STR_EXPRS = {
    "substr_pos": (
        lambda n: F.substring("o_orderpriority", (n % 5) + 1, 3),
        lambda n: f"SUBSTR(o_orderpriority, {(n % 5) + 1}, 3)",
    ),
    "substr_neg": (
        lambda n: F.substring("o_orderpriority", -((n % 4) + 1), 2),
        lambda n: f"SUBSTR(o_orderpriority, -{(n % 4) + 1}, 2)",
    ),
    "lpad": (
        lambda n: F.lpad(F.col("o_orderstatus"), (n % 6) + 1, "*"),
        lambda n: f"LPAD(o_orderstatus, {(n % 6) + 1}, '*')",
    ),
    "replace": (
        lambda n: F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_" * ((n % 2) + 1))
        ),
        lambda n: f"REPLACE(o_orderpriority, '-', '{'_' * ((n % 2) + 1)}')",
    ),
    "concat_ws": (
        lambda n: F.concat_ws("|", "o_orderstatus", "o_orderpriority"),
        lambda n: "CONCAT_WS('|', o_orderstatus, o_orderpriority)",
    ),
    "instr": (
        lambda n: F.instr(F.col("o_orderpriority"), "E").cast("int"),
        lambda n: "CAST(INSTR(o_orderpriority, 'E') AS INT)",
    ),
    "upper_trim": (
        lambda n: F.upper(F.trim(F.col("o_orderpriority"))),
        lambda n: "UPPER(TRIM(o_orderpriority))",
    ),
}


@given(
    expr=st.sampled_from(sorted(_STR_EXPRS)),
    n=st.integers(0, 40),
    filters=_filters(),
)
@FUZZ
def test_fuzz_string_functions(spark, duck, expr, n, filters):
    """String-function pipelines grouped and counted: 1-based positions,
    negative starts (both engines count from the end), NULL propagation,
    and CONCAT_WS's NULL-skipping must agree exactly."""
    orders = _apply(load_table(spark, SF, "orders"), filters)
    scol, ssql = _STR_EXPRS[expr]
    sdf = orders.groupBy(scol(n).alias("s")).agg(
        F.count("*").alias("cnt"), F.min("o_orderkey").alias("min_key")
    )
    sql = (
        f"SELECT {ssql(n)} AS s, COUNT(*) AS cnt, MIN(o_orderkey) AS min_key"
        f" FROM orders{_where(filters)} GROUP BY 1"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 12: per-group z-score outlier census  (round-6 — the exact-moment
# broadcast-back operator; fuzzes the claim that every float in the
# pipeline is an identical integer-derived IEEE expression in both
# engines, including the |z| boundary itself)
# ---------------------------------------------------------------------------

@given(
    keys=st.sampled_from(
        [("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
    ),
    value=st.sampled_from(["l_extendedprice", "l_quantity"]),
    z=st.sampled_from([1.0, 1.5, 2.0, 3.0]),
    key_mod=st.integers(2, 9),
)
@FUZZ
def test_fuzz_group_outliers(spark, duck, keys, value, z, key_mod):
    from shuttle_spark.operators import relational as R

    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_orderkey") % key_mod != 0
    )
    sdf = R.group_outliers_zscore(li, list(keys), value, z=z)
    kl = ", ".join(keys)
    sql = (
        f"WITH v AS (SELECT {kl}, CAST(ROUND({value}) AS BIGINT) AS ui"
        f"  FROM lineitem WHERE l_orderkey % {key_mod} <> 0),"
        f" s AS (SELECT {kl}, COUNT(*) AS n_rows,"
        f"  CAST(SUM(ui) AS BIGINT) AS s1, CAST(SUM(ui * ui) AS BIGINT) AS s2"
        f"  FROM v GROUP BY ALL),"
        f" m AS (SELECT {kl}, n_rows, CAST(s1 AS DOUBLE) / n_rows AS mean,"
        f"  CASE WHEN n_rows > 1 THEN"
        f"   SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_rows)"
        f"    / (n_rows - 1)) END AS std FROM s)"
        f" SELECT {', '.join('v.' + k for k in keys)}, MIN(m.n_rows) AS n_rows,"
        f"  COUNT(*) FILTER (WHERE ABS(v.ui - m.mean) > {z} * m.std)"
        f"   AS n_outliers,"
        f"  ROUND(MIN(m.mean), 6) AS mean_value, ROUND(MIN(m.std), 6)"
        f"   AS std_value"
        f" FROM v JOIN m USING ({kl}) GROUP BY ALL"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 13: Markov transition matrix  (round-6 — lead() tie determinism
# under arbitrary event-type subsets and key partitions: sparser sequences
# make same-timestamp adjacency MORE likely, stressing the tiebreak)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@given(
    types=st.lists(
        st.sampled_from(_EVENT_TYPES), unique=True, min_size=2, max_size=5
    ),
    user_mod=st.integers(1, 5),
)
@FUZZ
def test_fuzz_event_transitions(spark, duck, types, user_mod):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events").filter(
        F.col("event_type").isin(types) & (F.col("user_id") % user_mod == 0)
    )
    sdf = R.event_transition_matrix(ev)
    tl = ", ".join(f"'{t}'" for t in types)
    sql = (
        f"WITH f AS (SELECT * FROM events WHERE event_type IN ({tl})"
        f"  AND user_id % {user_mod} = 0),"
        f" seq AS (SELECT user_id, event_type AS from_type,"
        f"  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f"   AS to_type FROM f),"
        f" mat AS (SELECT from_type, to_type, COUNT(*) AS n_transitions"
        f"  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)"
        f" SELECT from_type, to_type, CAST(n_transitions AS BIGINT)"
        f"   AS n_transitions,"
        f"  ROUND(CAST(n_transitions AS DOUBLE)"
        f"    / SUM(n_transitions) OVER (PARTITION BY from_type), 6) AS p"
        f" FROM mat"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 14: diversity Gini  (round-6 — scaled-long squared-probability sums
# under swapped group/class roles and row subsets)
# ---------------------------------------------------------------------------

@given(
    roles=st.sampled_from([("source", "lang"), ("lang", "source")]),
    doc_mod=st.integers(1, 7),
)
@FUZZ
def test_fuzz_diversity_gini(spark, duck, roles, doc_mod):
    from shuttle_spark.operators import pipeline as P

    g, c = roles
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % doc_mod == 0
    )
    sdf = P.group_diversity_gini(docs, g, c)
    sql = (
        f"WITH f AS (SELECT * FROM documents WHERE doc_id % {doc_mod} = 0),"
        f" cnts AS (SELECT {g}, {c}, COUNT(*) AS cnt FROM f GROUP BY 1, 2),"
        f" w AS (SELECT {g}, {c}, cnt,"
        f"  SUM(cnt) OVER (PARTITION BY {g}) AS tot FROM cnts)"
        f" SELECT {g}, CAST(MIN(tot) AS BIGINT) AS n_docs,"
        f"  COUNT(*) AS n_classes,"
        f"  ROUND(1.0 - SUM(CAST(ROUND((CAST(cnt AS DOUBLE) / tot)"
        f"    * (CAST(cnt AS DOUBLE) / tot) * 1e12) AS BIGINT)) / 1e12, 6)"
        f"   AS gini"
        f" FROM w GROUP BY 1"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 15: pagerank recurrence  (round-6 — the quantized power iteration
# under varying graph shapes, iteration depths, and damping factors; the
# oracle is UNROLLED programmatically so every spec gets an exact SQL twin.
# Heavier per example than the other modes — iterative multi-stage jobs —
# so the example budget is smaller.)
# ---------------------------------------------------------------------------

def _pagerank_sql(p: int, q: int, iters: int, d: float) -> str:
    cte = [
        f"e AS (SELECT DISTINCT o_custkey % {p} AS src,"
        f" o_orderkey % {q} AS dst FROM orders"
        f" WHERE o_custkey % {p} <> o_orderkey % {q})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT COUNT(*) AS n FROM nodes)",
        "od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1)",
        "s0 AS (SELECT node, ROUND(1.0 / n.n, 9) AS score"
        " FROM nodes CROSS JOIN n)",
    ]
    for k in range(1, iters + 1):
        cte.append(
            f"i{k} AS (SELECT dst AS node,"
            f" SUM(CAST(ROUND(score / od * 1e9) AS BIGINT)) / 1e9 AS infl"
            f" FROM e JOIN s{k-1} ON s{k-1}.node = e.src"
            f" JOIN od ON od.src = e.src GROUP BY 1)"
        )
        cte.append(
            f"s{k} AS (SELECT nodes.node,"
            f" ROUND((1.0 - {d!r}) / n.n + {d!r} * COALESCE(infl, 0), 9)"
            f" AS score FROM nodes CROSS JOIN n"
            f" LEFT JOIN i{k} ON i{k}.node = nodes.node)"
        )
    return (
        "WITH "
        + ", ".join(cte)
        + f" SELECT node, ROUND(score, 6) AS score FROM s{iters}"
    )


FUZZ_HEAVY = settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES_HEAVY", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    p=st.sampled_from([13, 29, 61, 97]),
    q=st.sampled_from([11, 37, 89]),
    iters=st.integers(1, 4),
    d=st.sampled_from([0.85, 0.5]),
)
@FUZZ_HEAVY
def test_fuzz_pagerank(spark, duck, p, q, iters, d):
    from shuttle_spark.operators import components as CC

    o = load_table(spark, SF, "orders").select(
        (F.col("o_custkey") % p).alias("src"),
        (F.col("o_orderkey") % q).alias("dst"),
    )
    sdf = CC.pagerank(o, iters=iters, damping=d)
    _check(sdf, duck, _pagerank_sql(p, q, iters, d))


# ---------------------------------------------------------------------------
# Mode 15: EWMA anomaly detection  (round-6 late — the integer FIR path
# under arbitrary window lengths, weights regenerated per spec: the SQL
# twin is UNROLLED programmatically, so the lag-chain recurrence has an
# exact oracle at every generated point, the pagerank pattern applied to
# a window recurrence)
# ---------------------------------------------------------------------------


def _ewma_sql(window: int, min_lags: int, thr: int, user_mod: int) -> str:
    lags = ", ".join(
        f"LAG(cents,{j}) OVER w AS l{j}" for j in range(1, window + 1)
    )
    wsum = " + ".join(
        f"COALESCE(l{j}*{1 << (window - j)}, 0)" for j in range(1, window + 1)
    )
    denom = " + ".join(
        f"(CASE WHEN l{j} IS NULL THEN 0 ELSE {1 << (window - j)} END)"
        for j in range(1, window + 1)
    )
    return (
        f"WITH e AS (SELECT event_id, user_id, ts,"
        f"  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents"
        f" FROM events WHERE value IS NOT NULL"
        f"  AND user_id % {user_mod} = 0),"
        f" l AS (SELECT event_id, user_id, cents, {lags}"
        f" FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
        f" f AS (SELECT event_id, user_id, cents, {wsum} AS wsum,"
        f"  {denom} AS denom, l{min_lags} IS NOT NULL AS scored FROM l)"
        f" SELECT event_id, user_id, cents, wsum, denom FROM f"
        f" WHERE scored AND ABS(cents*denom - wsum) > {thr}*denom"
    )


@given(
    window=st.integers(2, 10),
    min_lags_frac=st.integers(1, 100),
    thr=st.sampled_from([1000, 3000, 5000, 10000, 20000]),
    user_mod=st.integers(1, 4),
)
@FUZZ
def test_fuzz_ewma_anomalies(spark, duck, window, min_lags_frac, thr, user_mod):
    from shuttle_spark.operators import relational as R

    min_lags = 1 + (min_lags_frac * window) // 101
    ev = load_table(spark, SF, "events").filter(F.col("user_id") % user_mod == 0)
    sdf = R.ewma_deviants(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        "value",
        threshold_cents=thr,
        window=window,
        min_lags=min_lags,
    ).select("event_id", "user_id", "cents", "wsum", "denom")
    _check(sdf, duck, _ewma_sql(window, min_lags, thr, user_mod))


# ---------------------------------------------------------------------------
# Mode 16: greedy sequence packing  (round-6 late — the sequential fill
# recurrence vs a parameterized recursive CTE: budgets straddle the doc
# size distribution so bins range from 1-doc to dozens-of-docs)
# ---------------------------------------------------------------------------


@given(
    budget=st.sampled_from([64, 300, 700, 2048, 10000]),
    doc_mod=st.integers(1, 5),
    key=st.sampled_from(["source", "lang"]),
)
@FUZZ
def test_fuzz_pack_greedy_bins(spark, duck, budget, doc_mod, key):
    from shuttle_spark.operators import pipeline as P

    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % doc_mod == 0
    )
    sdf = P.pack_greedy_bins(docs, key, "doc_id", "n_chars", budget).select(
        key, "doc_id", "bin_id"
    )
    sql = (
        f"WITH RECURSIVE s AS ("
        f" SELECT {key}, doc_id, n_chars,"
        f"  ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY doc_id) AS rn"
        f" FROM documents WHERE doc_id % {doc_mod} = 0"
        f"  AND n_chars IS NOT NULL),"
        f" r AS ("
        f" SELECT {key}, doc_id, rn, CAST(0 AS BIGINT) AS bin_id,"
        f"  n_chars AS cum FROM s WHERE rn = 1"
        f" UNION ALL"
        f" SELECT s.{key}, s.doc_id, s.rn,"
        f"  CASE WHEN r.cum + s.n_chars > {budget} THEN r.bin_id + 1"
        f"   ELSE r.bin_id END,"
        f"  CASE WHEN r.cum + s.n_chars > {budget} THEN s.n_chars"
        f"   ELSE r.cum + s.n_chars END"
        f" FROM r JOIN s ON s.{key} = r.{key} AND s.rn = r.rn + 1)"
        f" SELECT {key}, doc_id, bin_id FROM r"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 17: repeated-span detection  (round-6 late — window grid geometry:
# width/stride combinations change which windows exist at all, so the
# explode/distinct/HAVING chain is exercised at every alignment)
# ---------------------------------------------------------------------------


@given(
    width=st.sampled_from([8, 12, 16, 24, 32]),
    stride_frac=st.sampled_from([1, 2, 4]),
    doc_mod=st.integers(1, 3),
)
@FUZZ
def test_fuzz_repeated_spans(spark, duck, width, stride_frac, doc_mod):
    from shuttle_spark.operators import dedup as D

    stride = max(1, width // stride_frac)
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % doc_mod == 0
    )
    sdf = D.repeated_span_doc_ids(
        docs, width=width, stride=stride
    ).select("doc_id")
    sql = (
        f"WITH g AS (SELECT UNNEST(generate_series(0,"
        f"  (SELECT CAST(FLOOR((MAX(length(text))-{width})/{stride}.0)"
        f"   AS BIGINT) FROM documents))) AS g),"
        f" w AS (SELECT DISTINCT doc_id,"
        f"   substr(text, (g*{stride})+1, {width}) AS win"
        f"  FROM documents, g WHERE doc_id % {doc_mod} = 0"
        f"   AND g*{stride} <= length(text) - {width}),"
        f" shared AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) > 1)"
        f" SELECT DISTINCT doc_id FROM w WHERE win IN (SELECT win FROM shared)"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 18: semantic dedup  (round-6 late — threshold sweep over the
# integer-exact quantized cosine: every generated tau is a straddle
# probe, and corpus subsets change which lower-id vector dominates)
# ---------------------------------------------------------------------------


@given(
    tau_pct=st.integers(30, 60),
    vec_mod=st.integers(1, 4),
)
@FUZZ_HEAVY
def test_fuzz_semantic_dedup(spark, duck, tau_pct, vec_mod):
    from shuttle_spark.operators import similarity as S

    tau = tau_pct / 100.0
    emb = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") % vec_mod == 0
    )
    sdf = S.semantic_dedup(emb, threshold=tau).select("vec_id")
    sql = (
        f"WITH s AS (SELECT vec_id, embedding,"
        f"  GREATEST(list_max(list_transform(embedding,"
        f"   x -> ABS(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS s"
        f" FROM embeddings WHERE embedding IS NOT NULL"
        f"  AND vec_id % {vec_mod} = 0),"
        f" q AS (SELECT vec_id, list_transform(embedding,"
        f"   x -> FLOOR(CAST(x AS DOUBLE) / s + 0.5)) AS qv FROM s),"
        f" n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM q),"
        f" dom AS (SELECT DISTINCT b.vec_id FROM n a JOIN n b"
        f"  ON a.vec_id < b.vec_id"
        f"  AND list_dot_product(a.qv, b.qv) / sqrt(a.n2 * b.n2)"
        f"   >= {tau!r})"
        f" SELECT vec_id FROM embeddings WHERE vec_id % {vec_mod} = 0"
        f"  AND vec_id NOT IN (SELECT vec_id FROM dom)"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 19: linear attribution  (round-6 late — window length, event-type
# roles, and user subsets regenerated per spec; the integer credit split
# must re-sum exactly at every point)
# ---------------------------------------------------------------------------


@given(
    days=st.integers(1, 30),
    roles=st.sampled_from(
        [("purchase", "click"), ("purchase", "view"), ("signup", "click"),
         ("error", "view")]
    ),
    user_mod=st.integers(1, 4),
)
@FUZZ
def test_fuzz_linear_attribution(spark, duck, days, roles, user_mod):
    from shuttle_spark.operators import relational as R

    conv_t, touch_t = roles
    ev = load_table(spark, SF, "events").filter(
        F.col("user_id") % user_mod == 0
    )
    sdf = R.linear_attribution(
        ev, conv_type=conv_t, touch_type=touch_t, window_days=days
    ).select("t_id", "user_id", "n_conversions", "credit_cents")
    sql = (
        f"WITH ev AS (SELECT * FROM events WHERE user_id % {user_mod} = 0),"
        f" conv AS (SELECT event_id AS c_id, user_id, ts::TIMESTAMP AS c_ts,"
        f"  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c_cents FROM ev"
        f"  WHERE event_type = '{conv_t}' AND value IS NOT NULL),"
        f" touch AS (SELECT event_id AS t_id, user_id, ts::TIMESTAMP AS t_ts"
        f"  FROM ev WHERE event_type = '{touch_t}'),"
        f" j AS (SELECT t_id, t.user_id, c_id, c_cents,"
        f"   COUNT(*) OVER (PARTITION BY c_id) AS n,"
        f"   ROW_NUMBER() OVER (PARTITION BY c_id ORDER BY t_ts, t_id) AS rn"
        f"  FROM conv c JOIN touch t ON c.user_id = t.user_id"
        f"   AND t_ts <= c_ts AND t_ts > c_ts - INTERVAL {days} DAY)"
        f" SELECT t_id, user_id, COUNT(*) AS n_conversions,"
        f"  CAST(SUM(CAST(FLOOR(CAST(c_cents AS DOUBLE) / n) AS BIGINT)"
        f"   + CASE WHEN rn <= c_cents % n THEN 1 ELSE 0 END) AS BIGINT)"
        f"   AS credit_cents"
        f" FROM j GROUP BY 1, 2"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 20: winsorized stats  (round-6 late — quantile pair x key sweep:
# every (lo,hi) lands on different order statistics, probing the
# ceil(q*n) boundary arithmetic)
# ---------------------------------------------------------------------------


@given(
    lo_pct=st.integers(1, 30),
    hi_pct=st.integers(70, 100),
    key=st.sampled_from(["event_type", "user_id"]),
)
@FUZZ
def test_fuzz_winsorized_stats(spark, duck, lo_pct, hi_pct, key):
    from shuttle_spark.operators import relational as R

    lo, hi = lo_pct / 100.0, hi_pct / 100.0
    ev = load_table(spark, SF, "events")
    sdf = R.winsorized_stats(ev, [key], "value", lo_q=lo, hi_q=hi).select(
        key, "lo_cents", "hi_cents", "n_rows", "winsorized_sum_cents"
    )
    sql = (
        f"WITH v AS (SELECT {key},"
        f"  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c"
        f" FROM events WHERE value IS NOT NULL),"
        f" r AS (SELECT {key}, c,"
        f"  ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY c) AS rn,"
        f"  COUNT(*) OVER (PARTITION BY {key}) AS n FROM v),"
        f" b AS (SELECT {key}, MIN(c) AS lo_cents, MAX(c) AS hi_cents,"
        f"  MAX(n) AS n_rows FROM r"
        f"  WHERE rn = GREATEST(CAST(FLOOR(({lo_pct * 100}*n + 9999)"
        f"   /10000.0) AS BIGINT), 1)"
        f"   OR rn = GREATEST(CAST(FLOOR(({hi_pct * 100}*n + 9999)"
        f"   /10000.0) AS BIGINT), 1) GROUP BY 1)"
        f" SELECT v.{key}, lo_cents, hi_cents, n_rows,"
        f"  CAST(SUM(GREATEST(LEAST(c, hi_cents), lo_cents)) AS BIGINT)"
        f"   AS winsorized_sum_cents"
        f" FROM v JOIN b USING ({key}) GROUP BY 1, 2, 3, 4"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 21: hash split + skew census  (round-6 late — split boundaries and
# seeds regenerated per spec; census key/k sweep)
# ---------------------------------------------------------------------------


@given(
    train_pct=st.integers(10, 90),
    val_pct=st.integers(5, 9),
    seed=st.integers(0, 99),
)
@FUZZ
def test_fuzz_hash_split(spark, duck, train_pct, val_pct, seed):
    from shuttle_spark.operators import pipeline as P

    fr = {"train": train_pct / 100, "val": val_pct / 100, "test": 0.0}
    docs = load_table(spark, SF, "documents")
    sdf = P.hash_split(docs, "doc_id", fr, seed=seed).select("doc_id", "split")
    b1 = int(round(train_pct / 100 * 1_000_000))
    b2 = int(round((train_pct + val_pct) / 100 * 1_000_000))
    sql = (
        f"SELECT doc_id, CASE WHEN b < {b1} THEN 'train'"
        f"  WHEN b < {b2} THEN 'val' ELSE 'test' END AS split"
        f" FROM (SELECT doc_id,"
        f"  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || '{seed}'),"
        f"   1, 8))::BIGINT % 1000000 AS b FROM documents)"
    )
    _check(sdf, duck, sql)


@given(
    key=st.sampled_from(["o_custkey", "o_orderstatus", "o_orderpriority"]),
    k=st.integers(1, 20),
)
@FUZZ
def test_fuzz_key_skew_census(spark, duck, key, k):
    from shuttle_spark.operators import relational as R

    o = load_table(spark, SF, "orders")
    sdf = R.key_skew_census(o, [key], top_k=k)
    sql = (
        f"SELECT {key}, cnt, share FROM ("
        f" SELECT {key}, COUNT(*) AS cnt,"
        f"  ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6)"
        f"   AS share"
        f" FROM orders GROUP BY 1)"
        f" ORDER BY cnt DESC, {key} LIMIT {k}"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 22: typicality + rolling features + fan-out census + actives
# (round-6 final — gram width, trailing windows, role pairs, and day
# windows regenerated per spec)
# ---------------------------------------------------------------------------


@given(n=st.integers(2, 5), doc_mod=st.integers(1, 3))
@FUZZ
def test_fuzz_doc_typicality(spark, duck, n, doc_mod):
    from shuttle_spark.operators import neardup as N
    from shuttle_spark.operators import pipeline as P

    N.clear_gram_cache()
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % doc_mod == 0
    )
    sdf = P.doc_typicality(docs, n=n)
    gram = " || ' ' || ".join(f"w[i.i::BIGINT+{j}]" for j in range(n)).replace(
        "+0]", "]"
    )
    sql = (
        f"WITH norm AS (SELECT doc_id,"
        f"  TRIM(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) t"
        f" FROM documents WHERE doc_id % {doc_mod} = 0),"
        f" toks AS (SELECT doc_id, STRING_SPLIT(TRIM(t), ' ') w FROM norm),"
        f" grams AS (SELECT DISTINCT doc_id, {gram} AS g FROM toks,"
        f"  LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LEN(w)-{n-1}, 0)+1))"
        f"   AS i) i),"
        f" dfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),"
        f" per AS (SELECT doc_id, COUNT(*) AS n_grams,"
        f"  CAST(SUM(df) AS BIGINT) AS sum_df"
        f"  FROM grams JOIN dfreq USING (g) GROUP BY 1)"
        f" SELECT doc_id, n_grams, sum_df,"
        f"  ROUND(CAST(sum_df AS DOUBLE) / n_grams, 6) AS typicality FROM per"
    )
    _check(sdf, duck, sql)


@given(
    hours=st.integers(1, 96),
    at_type=st.sampled_from(["purchase", "signup"]),
    count_type=st.sampled_from(["click", "view", "error"]),
)
@FUZZ
def test_fuzz_rolling_window_features(spark, duck, hours, at_type, count_type):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events")
    col = f"n_{count_type}_{hours}h"
    sdf = R.rolling_window_features(
        ev, ["user_id"], "ts", at_type, [count_type], hours
    ).select("event_id", "user_id", col)
    sql = (
        f"SELECT event_id, user_id, {col} FROM ("
        f" SELECT event_id, user_id, event_type,"
        f"  CAST(SUM(CASE WHEN event_type = '{count_type}' THEN 1 ELSE 0 END)"
        f"   OVER w AS BIGINT) AS {col}"
        f" FROM events WINDOW w AS (PARTITION BY user_id"
        f"  ORDER BY epoch_us(ts::TIMESTAMP)"
        f"  RANGE BETWEEN {hours * 3_600_000_000} PRECEDING AND CURRENT ROW))"
        f" WHERE event_type = '{at_type}'"
    )
    _check(sdf, duck, sql)


@given(
    left_t=st.sampled_from(["click", "view"]),
    right_t=st.sampled_from(["purchase", "error", "signup"]),
    k=st.integers(1, 15),
)
@FUZZ
def test_fuzz_join_fanout_census(spark, duck, left_t, right_t, k):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events")
    sdf = R.join_fanout_census(
        ev.filter(F.col("event_type") == left_t),
        ev.filter(F.col("event_type") == right_t),
        ["user_id"],
        top_k=k,
    )
    sql = (
        f"SELECT user_id, n_left, n_right, fanout FROM ("
        f" SELECT a.user_id, a.n AS n_left, b.n AS n_right, a.n*b.n AS fanout"
        f" FROM (SELECT user_id, COUNT(*) AS n FROM events"
        f"   WHERE event_type = '{left_t}' GROUP BY 1) a"
        f" JOIN (SELECT user_id, COUNT(*) AS n FROM events"
        f"   WHERE event_type = '{right_t}' GROUP BY 1) b USING (user_id))"
        f" ORDER BY fanout DESC, user_id LIMIT {k}"
    )
    _check(sdf, duck, sql)


@given(days=st.integers(1, 30), user_mod=st.integers(1, 4))
@FUZZ
def test_fuzz_rolling_actives(spark, duck, days, user_mod):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events").filter(
        F.col("user_id") % user_mod == 0
    )
    sdf = R.rolling_distinct_actives(ev, "ts", "user_id", days)
    sql = (
        f"WITH dk AS (SELECT DISTINCT CAST(ts::TIMESTAMP AS DATE) AS day,"
        f"  user_id AS k FROM events WHERE user_id % {user_mod} = 0),"
        f" spine AS (SELECT DISTINCT day AS report_day FROM dk),"
        f" visible AS (SELECT report_day, k FROM dk JOIN spine"
        f"  ON day <= report_day AND day > report_day - {days}),"
        f" wau AS (SELECT report_day, COUNT(DISTINCT k) AS wau"
        f"  FROM visible GROUP BY 1),"
        f" dau AS (SELECT day, COUNT(DISTINCT k) AS dau FROM dk GROUP BY 1)"
        f" SELECT day, dau, wau,"
        f"  ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness"
        f" FROM dau JOIN wau ON day = report_day"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 23: session co-presence lift + prefix-filtered jaccard
# (round-6 close — session gap lengths and subset filters regenerated per
# spec; the prefix join sweeps tau against the SAME brute-force twin the
# full-index join gates on)
# ---------------------------------------------------------------------------


@given(gap_min=st.integers(5, 240), user_mod=st.integers(1, 4))
@FUZZ
def test_fuzz_session_copresence(spark, duck, gap_min, user_mod):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events").filter(
        F.col("user_id") % user_mod == 0
    )
    sdf = R.session_copresence_lift(ev, gap_minutes=gap_min)
    gap_us = gap_min * 60_000_000
    sql = (
        f"WITH src AS (SELECT * FROM events WHERE user_id % {user_mod} = 0),"
        f" l AS (SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts,"
        f"  CASE WHEN LAG(ts::TIMESTAMP) OVER w IS NULL THEN 0"
        f"   WHEN epoch_us(ts::TIMESTAMP) - epoch_us(LAG(ts::TIMESTAMP)"
        f"    OVER w) > {gap_us} THEN 1 ELSE 0 END AS nw"
        f" FROM src WINDOW w AS (PARTITION BY user_id"
        f"  ORDER BY ts::TIMESTAMP, event_id)),"
        f" c AS (SELECT user_id, event_type,"
        f"  SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        f"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess"
        f"  FROM l),"
        f" st AS (SELECT DISTINCT user_id AS k, event_type AS t, sess FROM c),"
        f" ns AS (SELECT COUNT(*) AS n_sessions FROM"
        f"  (SELECT DISTINCT k, sess FROM st)),"
        f" pt AS (SELECT t, COUNT(*) AS n_t FROM st GROUP BY 1),"
        f" pr AS (SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS n_ab"
        f"  FROM st a JOIN st b ON a.k = b.k AND a.sess = b.sess AND a.t < b.t"
        f"  GROUP BY 1, 2)"
        f" SELECT type_a, type_b, n_ab,"
        f"  ROUND(CAST(n_ab * (SELECT n_sessions FROM ns) AS DOUBLE)"
        f"   / (na.n_t * nb.n_t), 6) AS lift"
        f" FROM pr JOIN pt na ON na.t = type_a JOIN pt nb ON nb.t = type_b"
    )
    _check(sdf, duck, sql)


@given(tau_pct=st.integers(35, 90), doc_mod=st.integers(1, 3))
@FUZZ_HEAVY
def test_fuzz_prefix_jaccard(spark, duck, tau_pct, doc_mod):
    from shuttle_spark.operators import neardup as N

    tau = tau_pct / 100.0
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % doc_mod == 0
    )
    sdf = N.near_dup_pairs_prefix(docs, tau, reuse=False)
    # the n=3 brute-force twin the full-index contract gates on,
    # parameterized by tau and the doc subset
    sql = (
        "WITH norm AS (SELECT doc_id,"
        " TRIM(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) t"
        f" FROM documents WHERE doc_id % {doc_mod} = 0),"
        " toks AS (SELECT doc_id, STRING_SPLIT(TRIM(t), ' ') w FROM norm),"
        " grams AS (SELECT DISTINCT doc_id,"
        "  w[i.i::BIGINT] || ' ' || w[i.i::BIGINT+1] || ' ' ||"
        "  w[i.i::BIGINT+2] AS g FROM toks,"
        "  LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LEN(w)-2, 0)+1)) AS i) i),"
        " sizes AS (SELECT doc_id, COUNT(*) n FROM grams GROUP BY doc_id),"
        " shared AS (SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) inter"
        "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2),"
        " jac AS (SELECT id_a, id_b,"
        "  ROUND(inter::DOUBLE / (sa.n + sb.n - inter), 6) AS jac"
        "  FROM shared JOIN sizes sa ON id_a = sa.doc_id"
        "  JOIN sizes sb ON id_b = sb.doc_id)"
        f" SELECT id_a, id_b, jac FROM jac WHERE jac >= {tau!r}"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 31 (round 7): the new analytics operators — OHLC bars, MAD outliers,
# OLS trend, exact-count stratified split — fuzzed over keys / thresholds /
# seeds against literal SQL twins.
# ---------------------------------------------------------------------------


@given(
    key=st.sampled_from(["event_type", "user_id"]),
    key_mod=st.integers(1, 5),
)
@FUZZ
def test_fuzz_ohlc_bars(spark, duck, key, key_mod):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events").filter(
        (F.col("value").isNotNull()) & (F.col("user_id") % key_mod == 0)
    )
    sdf = R.ohlc_bars(ev, [key], "ts", "value", "event_id")
    okey_sql = R.LEX_OKEY_SQL.format(ts="ts", tiebreak="event_id")
    sql = (
        f"WITH k AS (SELECT {key},"
        f"  date_trunc('hour', ts::TIMESTAMP) AS bucket, value,"
        f"  {okey_sql} AS okey"
        f" FROM events WHERE value IS NOT NULL AND user_id % {key_mod} = 0)"
        f" SELECT {key}, bucket, arg_min(value, okey) AS open,"
        f"  arg_max(value, okey) AS close, MAX(value) AS high,"
        f"  MIN(value) AS low, CAST(COUNT(*) AS BIGINT) AS volume,"
        f"  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"
        f"   AS total_cents"
        f" FROM k GROUP BY 1, 2"
    )
    _check(sdf, duck, sql)


@given(
    keys=st.sampled_from(
        [("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
    ),
    value=st.sampled_from(["l_extendedprice", "l_quantity"]),
    z_tenths=st.integers(10, 60),
)
@FUZZ
def test_fuzz_mad_outliers(spark, duck, keys, value, z_tenths):
    from shuttle_spark.operators import relational as R

    z = z_tenths / 10.0
    li = load_table(spark, SF, "lineitem")
    sdf = R.group_outliers_mad(li, list(keys), value, z=z)
    kcols = ", ".join(keys)
    sql = (
        f"WITH v AS (SELECT {kcols},"
        f"  CAST(ROUND({value}) AS BIGINT) AS ui FROM lineitem),"
        f" m AS (SELECT {kcols}, COUNT(*) AS n_rows,"
        f"  quantile_cont(ui, 0.5) AS med FROM v GROUP BY {kcols}),"
        f" d AS (SELECT v.*, m.n_rows, m.med, ABS(v.ui - m.med) AS dev"
        f"  FROM v JOIN m USING ({kcols})),"
        f" md AS (SELECT {kcols}, quantile_cont(dev, 0.5) AS mad"
        f"  FROM d GROUP BY {kcols})"
        f" SELECT d.{', d.'.join(keys)}, MIN(d.n_rows) AS n_rows,"
        f"  COUNT(*) FILTER (WHERE d.dev > {z!r} * 1.4826 * md.mad)"
        f"   AS n_outliers,"
        f"  ROUND(MIN(d.med), 6) AS median_value,"
        f"  ROUND(MIN(md.mad), 6) AS mad_value"
        f" FROM d JOIN md USING ({kcols}) GROUP BY {kcols}"
    )
    _check(sdf, duck, sql)


@given(
    key=st.sampled_from(["user_id", "event_type"]),
    key_mod=st.integers(1, 4),
)
@FUZZ
def test_fuzz_trend_slope(spark, duck, key, key_mod):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events").filter(
        (F.col("value").isNotNull()) & (F.col("user_id") % key_mod == 0)
    )
    sdf = R.trend_slope(ev, [key], "ts", "value")
    sql = (
        f"WITH q AS (SELECT {key},"
        f"  epoch_us(ts::TIMESTAMP) // 3600000000 AS x,"
        f"  CAST(ROUND(value * 100) AS BIGINT) AS y FROM events"
        f"  WHERE value IS NOT NULL AND user_id % {key_mod} = 0),"
        f" s AS (SELECT {key}, COUNT(*) AS n_rows,"
        f"  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,"
        f"  CAST(SUM(x * x) AS BIGINT) AS sxx,"
        f"  CAST(SUM(x * y) AS BIGINT) AS sxy FROM q GROUP BY 1),"
        f" r AS (SELECT {key}, n_rows,"
        f"  CASE WHEN n_rows > 1 AND n_rows * sxx - sx * sx <> 0 THEN"
        f"   CAST(n_rows * sxy - sx * sy AS DOUBLE)"
        f"    / CAST(n_rows * sxx - sx * sx AS DOUBLE) END AS slope,"
        f"  sx, sy FROM s)"
        f" SELECT {key}, CAST(n_rows AS BIGINT) AS n_rows,"
        f"  ROUND(slope, 6) AS slope_cents_per_hour,"
        f"  ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))"
        f"   / n_rows, 6) AS intercept_cents FROM r"
    )
    _check(sdf, duck, sql)


@given(
    strat=st.sampled_from(["lang", "source"]),
    train_pct=st.integers(10, 90),
    val_pct=st.integers(5, 9),
    seed=st.integers(0, 99),
)
@FUZZ
def test_fuzz_stratified_split(spark, duck, strat, train_pct, val_pct, seed):
    from shuttle_spark.operators import pipeline as P

    fr = {"train": train_pct / 100, "val": val_pct / 100, "test": 0.0}
    docs = load_table(spark, SF, "documents")
    sdf = (
        P.stratified_split(docs, "doc_id", [strat], fr, seed=seed)
        .groupBy(strat, "split")
        .agg(F.count("*").alias("n"))
    )
    b1, b2 = train_pct * 100, (train_pct + val_pct) * 100
    sql = (
        f"WITH ranked AS (SELECT {strat}, doc_id,"
        f"  ROW_NUMBER() OVER (PARTITION BY {strat} ORDER BY"
        f"   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{seed}'),"
        f"    1, 8))::BIGINT, doc_id) AS rn,"
        f"  COUNT(*) OVER (PARTITION BY {strat}) AS ns FROM documents)"
        f" SELECT {strat}, CASE WHEN rn <= (ns * {b1}) // 10000 THEN 'train'"
        f"  WHEN rn <= (ns * {b2}) // 10000 THEN 'val' ELSE 'test' END"
        f"   AS split, CAST(COUNT(*) AS BIGINT) AS n FROM ranked GROUP BY 1, 2"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 36: LOCF imputation — randomized extra-NULL injection + key choice
# ---------------------------------------------------------------------------

@given(
    key=st.sampled_from(["user_id", "event_type"]),
    null_mod=st.integers(2, 9),
)
@FUZZ
def test_fuzz_locf_impute(spark, duck, key, null_mod):
    from shuttle_spark.operators import relational as R

    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "event_id",
        F.when(F.col("event_id") % null_mod == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    ev = ev.withColumn("__orig", F.col("value"))
    imp = R.locf_impute(ev, [key], ["ts", "event_id"], ["value"])
    sdf = imp.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(
                F.col("__orig").isNull() & F.col("value").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_filled"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("sum_cents"),
    )
    sql = (
        f"WITH e AS (SELECT user_id, event_type, ts, event_id,"
        f"  CASE WHEN event_id % {null_mod} = 0 THEN NULL"
        f"   ELSE value END AS value FROM events),"
        f" i AS (SELECT event_type, value,"
        f"  last_value(value IGNORE NULLS) OVER (PARTITION BY {key}"
        f"   ORDER BY ts::TIMESTAMP, event_id"
        f"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v"
        f"  FROM e)"
        f" SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f"  CAST(SUM(CASE WHEN value IS NULL AND v IS NOT NULL THEN 1"
        f"   ELSE 0 END) AS BIGINT) AS n_filled,"
        f"  CAST(SUM(CASE WHEN v IS NOT NULL THEN"
        f"   CAST(ROUND(v * 100) AS BIGINT) ELSE 0 END) AS BIGINT)"
        f"   AS sum_cents"
        f" FROM i GROUP BY 1"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 37: arriving-changeset merge — randomized churn moduli (disjoint
# U/D by guard, I on offset keys), both engines pay the same merge
# ---------------------------------------------------------------------------

@given(
    u_mod=st.integers(3, 23),
    d_mod=st.integers(3, 23),
    i_mod=st.integers(3, 23),
)
@FUZZ
def test_fuzz_changeset_apply_arriving(spark, duck, u_mod, d_mod, i_mod):
    from shuttle_spark.operators import lineage as L
    from shuttle_spark.operators.integrity import md5_prefix32

    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    upd = o.filter(k % u_mod == 0).select(
        F.lit("U").alias("op"), "o_orderkey", "o_custkey",
        (F.col("o_totalprice") + 5.0).alias("o_totalprice"),
    )
    dele = o.filter((k % u_mod != 0) & (k % d_mod == 1)).select(
        F.lit("D").alias("op"), "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    ins = o.filter(k % i_mod == 2).select(
        F.lit("I").alias("op"),
        (k + 1_000_000_000_000).alias("o_orderkey"),
        "o_custkey", "o_totalprice",
    )
    merged = L.apply_changeset(
        o, upd.unionByName(dele).unionByName(ins), ["o_orderkey"]
    )
    term = md5_prefix32(
        F.concat(
            F.col("o_orderkey").cast("string"), F.lit(":"),
            F.col("o_custkey").cast("string"), F.lit(":"),
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        )
    )
    sdf = merged.agg(F.count("*").alias("n_rows"), F.sum(term).alias("chk"))
    sql = (
        f"WITH ch AS ("
        f" SELECT 'U' AS op, o_orderkey, o_custkey,"
        f"  o_totalprice + 5.0 AS o_totalprice FROM orders"
        f"  WHERE o_orderkey % {u_mod} = 0"
        f" UNION ALL SELECT 'D', o_orderkey, CAST(NULL AS BIGINT),"
        f"  CAST(NULL AS DOUBLE) FROM orders"
        f"  WHERE o_orderkey % {u_mod} <> 0 AND o_orderkey % {d_mod} = 1"
        f" UNION ALL SELECT 'I', o_orderkey + 1000000000000, o_custkey,"
        f"  o_totalprice FROM orders WHERE o_orderkey % {i_mod} = 2),"
        f" merged AS ("
        f"  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o"
        f"   WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.op IN ('D', 'U')"
        f"    AND ch.o_orderkey = o.o_orderkey)"
        f"  UNION ALL SELECT o_orderkey, o_custkey, o_totalprice FROM ch"
        f"   WHERE op IN ('I', 'U'))"
        f" SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f"  CAST(SUM(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'"
        f"   || CAST(o_custkey AS VARCHAR) || ':' ||"
        f"   CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)),"
        f"   1, 8))::BIGINT) AS BIGINT) AS chk FROM merged"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 38: exact time-decay engagement — randomized half-life and key
# ---------------------------------------------------------------------------

@given(
    key=st.sampled_from(["event_type", "user_id"]),
    half_life=st.integers(1, 48),
    negate_mod=st.integers(2, 50),
)
@FUZZ
def test_fuzz_decayed_engagement(spark, duck, key, half_life, negate_mod):
    from shuttle_spark.operators import relational as R

    # events.value is all-positive in the fixtures; inject deterministic
    # sign flips (refund/chargeback shape) on BOTH sides so the
    # arithmetic-shift floor is exercised on negative cents, where a
    # truncating DIV would diverge.
    ev = load_table(spark, SF, "events").withColumn(
        "value",
        F.when(F.col("event_id") % negate_mod == 0, -F.col("value"))
        .otherwise(F.col("value")),
    )
    ref_us = int(ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0])
    sdf = R.decayed_group_score(
        ev, [key], ref_us, half_life_hours=half_life
    )
    hl_us = 3_600_000_000 * half_life
    sql = (
        f"WITH ev AS (SELECT * REPLACE ("
        f"  CASE WHEN event_id % {negate_mod} = 0 THEN -value"
        f"   ELSE value END AS value) FROM events)"
        f" SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n_events,"
        f" CAST(SUM((CAST(ROUND(value * 100) AS BIGINT) * 1000000) >>"
        f"  CAST(LEAST(GREATEST("
        f"   ({ref_us} - epoch_us(ts::TIMESTAMP)) // {hl_us}, 0), 62)"
        f"   AS INT)) AS BIGINT) AS score_microcents"
        f" FROM ev WHERE value IS NOT NULL GROUP BY 1"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 39: reconciliation census — randomized corruption moduli + buckets
# ---------------------------------------------------------------------------

@given(
    flip_mod=st.integers(5, 400),
    drop_mod=st.integers(5, 400),
    n_buckets=st.sampled_from([4, 16, 64]),
)
@FUZZ
def test_fuzz_table_recon(spark, duck, flip_mod, drop_mod, n_buckets):
    from shuttle_spark.operators.integrity import table_recon

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = load_table(spark, SF, "orders")
    left = base.select("o_orderkey", "o_custkey", cents.alias("cents"))
    right = base.filter(F.col("o_orderkey") % drop_mod != 1).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % flip_mod == 0, cents + 1)
        .otherwise(cents)
        .alias("cents"),
    )
    sdf = table_recon(
        left, right, ["o_orderkey", "o_custkey", "cents"], n_buckets
    )
    sig = (
        "('0x' || substr(md5(COALESCE(CAST(o_orderkey AS VARCHAR), '␀')"
        " || ':' || COALESCE(CAST(o_custkey AS VARCHAR), '␀')"
        " || ':' || COALESCE(CAST(cents AS VARCHAR), '␀')), 1, 8))::BIGINT"
    )
    census = (
        "SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))"
        f"::BIGINT % {n_buckets} AS bucket, COUNT(*) AS n_rows,"
        f" CAST(SUM({sig}) AS BIGINT) AS h_sum FROM {{src}} GROUP BY 1"
    )
    sql = (
        "WITH l0 AS (SELECT o_orderkey, o_custkey,"
        " CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),"
        " r0 AS (SELECT o_orderkey, o_custkey,"
        f" CASE WHEN o_orderkey % {flip_mod} = 0 THEN"
        "  CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1"
        "  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents"
        f" FROM orders WHERE o_orderkey % {drop_mod} <> 1),"
        " lc AS (" + census.format(src="l0") + "),"
        " rc AS (" + census.format(src="r0") + ")"
        " SELECT COALESCE(lc.bucket, rc.bucket) AS bucket,"
        " CAST(COALESCE(lc.n_rows, 0) AS BIGINT) AS left_rows,"
        " CAST(COALESCE(rc.n_rows, 0) AS BIGINT) AS right_rows,"
        " CASE WHEN lc.n_rows IS NULL THEN 'only_right'"
        "  WHEN rc.n_rows IS NULL THEN 'only_left'"
        "  WHEN lc.n_rows <> rc.n_rows THEN 'count_diff'"
        "  WHEN lc.h_sum <> rc.h_sum THEN 'content_diff'"
        "  ELSE 'match' END AS status"
        " FROM lc FULL OUTER JOIN rc ON lc.bucket = rc.bucket"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 40: profile drift census — randomized corruption moduli + column set
# ---------------------------------------------------------------------------

@given(
    null_mod=st.integers(2, 300),
    shift_mod=st.integers(2, 300),
    drop_mod=st.integers(0, 400),  # 0/1 -> no row drops
    cols=st.sets(
        st.sampled_from(["doc_id", "lang", "source", "n_chars"]),
        min_size=2,
        max_size=4,
    ),
)
@FUZZ
def test_fuzz_profile_drift(spark, duck, null_mod, shift_mod, drop_mod, cols):
    from shuttle_spark.operators.integrity import profile_diff

    cols = sorted(cols)
    docs = load_table(spark, SF, "documents")
    right = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % null_mod == 0, F.lit(None))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
        F.when(F.col("doc_id") % shift_mod == 0, F.col("n_chars") + 1)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    drop = ""
    if drop_mod > 1:
        right = right.filter(F.col("doc_id") % drop_mod != 1)
        drop = f" WHERE doc_id % {drop_mod} <> 1"
    sdf = profile_diff(docs, right, cols, exact_distinct=True)

    def prof(src):
        return " UNION ALL ".join(
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" CAST(MIN({c}) AS VARCHAR) AS min_str,"
            f" CAST(MAX({c}) AS VARCHAR) AS max_str FROM {src}"
            for c in cols
        )

    sql = (
        "WITH r0 AS (SELECT doc_id,"
        f" CASE WHEN doc_id % {null_mod} = 0 THEN NULL ELSE lang END AS lang,"
        " source,"
        f" CASE WHEN doc_id % {shift_mod} = 0 THEN n_chars + 1"
        "  ELSE n_chars END AS n_chars"
        f" FROM documents{drop}),"
        " lp AS (" + prof("documents") + "),"
        " rp AS (" + prof("r0") + ")"
        " SELECT lp.col_name,"
        "  lp.n_rows AS l_n_rows, lp.n_null AS l_n_null,"
        "  lp.n_distinct AS l_n_distinct,"
        "  lp.min_str AS l_min_str, lp.max_str AS l_max_str,"
        "  rp.n_rows AS r_n_rows, rp.n_null AS r_n_null,"
        "  rp.n_distinct AS r_n_distinct,"
        "  rp.min_str AS r_min_str, rp.max_str AS r_max_str,"
        "  CASE WHEN rp.n_rows IS NULL THEN 'only_left'"
        "   WHEN lp.n_rows IS NULL THEN 'only_right'"
        "   WHEN lp.n_rows <> rp.n_rows THEN 'row_count_drift'"
        "   WHEN lp.n_null <> rp.n_null THEN 'null_drift'"
        "   WHEN lp.n_distinct <> rp.n_distinct THEN 'distinct_drift'"
        "   WHEN lp.min_str IS DISTINCT FROM rp.min_str"
        "    OR lp.max_str IS DISTINCT FROM rp.max_str THEN 'range_drift'"
        "   ELSE 'match' END AS status"
        " FROM lp FULL OUTER JOIN rp ON lp.col_name = rp.col_name"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 41: correlation census — random column/scale subsets + row filter
# ---------------------------------------------------------------------------

_CORR_POOL = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
              "l_orderkey", "l_partkey"]


@given(
    idx=st.sets(st.integers(0, 5), min_size=2, max_size=4),
    scales=st.lists(st.integers(0, 2), min_size=4, max_size=4),
    row_mod=st.integers(0, 7),  # 0/1 -> keep all rows
    null_mod=st.integers(0, 50),  # 0/1 -> no NULL injection
)
@FUZZ
def test_fuzz_corr_matrix(spark, duck, idx, scales, row_mod, null_mod):
    """corr_matrix vs a DuckDB twin generated by the SAME oracle builder,
    over random column subsets, per-column quantization scales, row
    filters, and NULL injection into the first chosen column (exercises
    the complete-case drop and the zero-variance NULL path — a key
    modulus small enough can make a column constant)."""
    from shuttle_spark.operators.integrity import (
        corr_matrix,
        corr_matrix_oracle_sql,
    )

    names = [_CORR_POOL[i] for i in sorted(idx)]
    cols = [(c, scales[k % len(scales)]) for k, c in enumerate(names)]
    li = load_table(spark, SF, "lineitem")
    where = []
    if row_mod > 1:
        li = li.filter(F.col("l_orderkey") % row_mod != 1)
        where.append(f"l_orderkey % {row_mod} <> 1")
    first = names[0]
    if null_mod > 1:
        li = li.withColumn(
            first,
            F.when(F.col("l_linenumber") % null_mod == 0, F.lit(None))
            .otherwise(F.col(first)),
        )
        src = (
            "(SELECT * REPLACE (CASE WHEN l_linenumber %"
            f" {null_mod} = 0 THEN NULL ELSE {first} END AS {first})"
            " FROM lineitem"
            + (f" WHERE {where[0]}" if where else "")
            + ")"
        )
    else:
        src = (
            f"(SELECT * FROM lineitem WHERE {where[0]})"
            if where
            else "lineitem"
        )
    sdf = corr_matrix(li, cols)
    _check(sdf, duck, corr_matrix_oracle_sql(src, cols))


# ---------------------------------------------------------------------------
# Mode 42: priority sampling — random k / seed / grouping / weight scale
# ---------------------------------------------------------------------------

@given(
    k=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    grp=st.sampled_from(
        ["o_orderpriority", "o_orderstatus", "o_custkey % 13"]
    ),
    scale=st.integers(0, 3),
    row_mod=st.integers(0, 6),  # 0/1 -> keep all rows
)
@FUZZ
def test_fuzz_priority_sample(spark, duck, k, seed, grp, scale, row_mod):
    """priority_sample_per_group vs its generated DuckDB twin over random
    k, seed, grouping expression, weight quantization scale, and row
    filters — id-exact sample + exact-integer estimator."""
    from shuttle_spark.operators.relational import (
        priority_sample_oracle_sql,
        priority_sample_per_group,
    )

    orders = load_table(spark, SF, "orders").withColumn(
        "grp", F.expr(grp)
    )
    src = f"(SELECT *, {grp} AS grp FROM orders"
    if row_mod > 1:
        orders = orders.filter(F.col("o_orderkey") % row_mod != 1)
        src += f" WHERE o_orderkey % {row_mod} <> 1"
    src += ")"
    sdf = priority_sample_per_group(
        orders, ["grp"], "o_orderkey", "o_totalprice", k=k, seed=seed,
        weight_scale=scale,
    )
    _check(
        sdf,
        duck,
        priority_sample_oracle_sql(
            src, ["grp"], "o_orderkey", "o_totalprice", k=k, seed=seed,
            weight_scale=scale,
        ),
    )


# ---------------------------------------------------------------------------
# Mode 43: golden-record survivorship — random NULL moduli + entity grain
# ---------------------------------------------------------------------------

@given(
    cents_mod=st.integers(0, 12),  # 0/1 -> column never NULL
    props_mod=st.integers(0, 12),
    type_mod=st.integers(0, 12),
    ent_mod=st.integers(0, 40),  # 0/1 -> per-user grain, else coarser
)
@FUZZ
def test_fuzz_golden_record(spark, duck, cents_mod, props_mod, type_mod,
                            ent_mod):
    """golden_record vs its generated DuckDB twin with randomized NULL
    injection per column (including the all-NULL-column and never-NULL
    extremes) and randomized entity grain — per-field latest-non-NULL
    survivorship must agree id-exactly."""
    from shuttle_spark.operators.dedup import (
        golden_record,
        golden_record_oracle_sql,
    )

    ev = load_table(spark, SF, "events")
    eid = F.col("event_id")
    ent = (
        F.col("user_id") % ent_mod if ent_mod > 1 else F.col("user_id")
    ).alias("ent")
    ent_sql = f"user_id % {ent_mod}" if ent_mod > 1 else "user_id"

    def guard(col, mod):
        if mod == 0:  # always NULL
            return F.lit(None).cast("string") if col == "props" else (
                F.lit(None).cast("long") if col == "cents"
                else F.lit(None).cast("string")
            )
        if mod == 1:
            return {
                "cents": F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                    "long"
                ),
                "props": F.col("props"),
                "event_type": F.col("event_type"),
            }[col]
        base = {
            "cents": F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            "props": F.col("props"),
            "event_type": F.col("event_type"),
        }[col]
        return F.when(eid % mod != 0, base)

    def guard_sql(col, mod):
        base = {
            "cents": "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)",
            "props": "props",
            "event_type": "event_type",
        }[col]
        typ = "BIGINT" if col == "cents" else "VARCHAR"
        if mod == 0:
            return f"CAST(NULL AS {typ})"
        if mod == 1:
            return base
        return f"CASE WHEN event_id % {mod} <> 0 THEN {base} END"

    src_df = ev.select(
        ent, "ts", "event_id",
        guard("event_type", type_mod).alias("event_type"),
        guard("cents", cents_mod).alias("cents"),
        guard("props", props_mod).alias("props"),
    )
    src_sql = (
        f"(SELECT {ent_sql} AS ent, ts, event_id,"
        f" {guard_sql('event_type', type_mod)} AS event_type,"
        f" {guard_sql('cents', cents_mod)} AS cents,"
        f" {guard_sql('props', props_mod)} AS props FROM events)"
    )
    sdf = golden_record(
        src_df, ["ent"], "ts", "event_id", ["event_type", "cents", "props"]
    )
    _check(
        sdf,
        duck,
        golden_record_oracle_sql(
            src_sql, ["ent"], "ts", "event_id",
            ["event_type", "cents", "props"],
        ),
    )


# ---------------------------------------------------------------------------
# Mode 44: CUSUM drift — random target/slack/threshold/grain + NULLs
# ---------------------------------------------------------------------------

@given(
    target=st.integers(0, 12_000),
    slack=st.integers(0, 2_000),
    threshold=st.integers(100, 60_000),
    key=st.sampled_from(["event_type", "user_id % 7"]),
    null_mod=st.integers(0, 20),  # 0/1 -> no NULL injection
)
@FUZZ
def test_fuzz_cusum(spark, duck, target, slack, threshold, key, null_mod):
    """cusum_points vs its generated DuckDB twin over random dials,
    stream grains, and NULL injection — the per-point statistic (not
    just the census) must agree exactly."""
    from shuttle_spark.operators.relational import (
        cusum_oracle_sql,
        cusum_points,
    )

    ev = load_table(spark, SF, "events").withColumn("grp", F.expr(key))
    src = f"(SELECT *, {key} AS grp FROM events"
    if null_mod > 1:
        ev = ev.withColumn(
            "value",
            F.when(F.col("event_id") % null_mod != 0, F.col("value")),
        )
        src = (
            "(SELECT * REPLACE (CASE WHEN event_id %"
            f" {null_mod} <> 0 THEN value END AS value),"
            f" {key} AS grp FROM events"
        )
    src += ")"
    sdf = cusum_points(
        ev, ["grp"], "ts", "event_id", "value", target, slack, threshold
    )
    _check(
        sdf,
        duck,
        cusum_oracle_sql(
            src, ["grp"], "ts", "event_id", "value", target, slack,
            threshold,
        ),
    )


# ---------------------------------------------------------------------------
# Mode 45: inverted index — random cap / df band + doc subset
# ---------------------------------------------------------------------------

_II_NORM = "TRIM(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))"


@given(
    cap=st.integers(1, 12),
    min_df=st.integers(1, 6),
    max_df=st.one_of(st.none(), st.integers(2, 400)),
    doc_mod=st.integers(0, 6),  # 0/1 -> all docs
)
@FUZZ
def test_fuzz_inverted_index(spark, duck, cap, min_df, max_df, doc_mod):
    """inverted_index vs its generated DuckDB twin over random posting
    caps, df bands (including max_df None = single-aggregate path), and
    document subsets."""
    from shuttle_spark.operators.pipeline import (
        inverted_index,
        inverted_index_oracle_sql,
    )

    docs = load_table(spark, SF, "documents")
    src = "documents"
    if doc_mod > 1:
        docs = docs.filter(F.col("doc_id") % doc_mod != 1)
        src = f"(SELECT * FROM documents WHERE doc_id % {doc_mod} <> 1)"
    sdf = inverted_index(
        docs, postings_cap=cap, min_df=min_df, max_df=max_df
    )
    _check(
        sdf,
        duck,
        inverted_index_oracle_sql(
            src, _II_NORM, postings_cap=cap, min_df=min_df, max_df=max_df
        ),
    )


# ---------------------------------------------------------------------------
# Mode 46: TWAP + equi-depth histogram — random grains / bins / scales
# ---------------------------------------------------------------------------

@given(
    key=st.sampled_from(["user_id", "event_type", "user_id % 9"]),
    scale=st.integers(0, 3),
    null_mod=st.integers(0, 15),
)
@FUZZ
def test_fuzz_twap(spark, duck, key, scale, null_mod):
    from shuttle_spark.operators.relational import twap, twap_oracle_sql

    ev = load_table(spark, SF, "events").withColumn("grp", F.expr(key))
    src = f"(SELECT *, {key} AS grp FROM events)"
    if null_mod > 1:
        ev = ev.withColumn(
            "value",
            F.when(F.col("event_id") % null_mod != 0, F.col("value")),
        )
        src = (
            "(SELECT * REPLACE (CASE WHEN event_id %"
            f" {null_mod} <> 0 THEN value END AS value),"
            f" {key} AS grp FROM events)"
        )
    sdf = twap(ev, ["grp"], "ts", "event_id", "value", scale=scale)
    _check(
        sdf,
        duck,
        twap_oracle_sql(src, ["grp"], "ts", "event_id", "value",
                        scale=scale),
    )


@given(
    n_bins=st.integers(2, 64),
    col=st.sampled_from(["l_extendedprice", "l_quantity", "l_discount"]),
    scale=st.integers(0, 3),
    buckets=st.sampled_from([2, 8, 32]),
)
@FUZZ
def test_fuzz_equi_depth(spark, duck, n_bins, col, scale, buckets):
    from shuttle_spark.operators.relational import (
        equi_depth_histogram,
        equi_depth_oracle_sql,
    )

    li = load_table(spark, SF, "lineitem").withColumn(
        "rid", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    sdf = equi_depth_histogram(
        li, col, "rid", n_bins=n_bins, scale=scale, buckets=buckets
    )
    _check(
        sdf,
        duck,
        equi_depth_oracle_sql(
            "(SELECT *, l_orderkey * 8 + l_linenumber AS rid"
            " FROM lineitem)",
            col, "rid", n_bins=n_bins, scale=scale,
        ),
    )


# ---------------------------------------------------------------------------
# Mode 47: CDC compaction + FK census — random op mixes / corruption
# ---------------------------------------------------------------------------

@given(
    i_mod=st.integers(2, 9),
    d_mod=st.integers(2, 9),
    key_mod=st.integers(2, 200),
)
@FUZZ
def test_fuzz_compact_changeset(spark, duck, i_mod, d_mod, key_mod):
    """compact_changeset vs its DuckDB twin over random op assignment
    (overlapping I/D moduli, U otherwise) and key grains — more keys
    per modulus means deeper multi-op chains."""
    from shuttle_spark.operators.lineage import (
        compact_changeset,
        compact_changeset_oracle_sql,
    )

    op_sql = (
        f"CASE WHEN event_id % {i_mod} = 0 THEN 'I'"
        f" WHEN event_id % {d_mod} = 1 THEN 'D' ELSE 'U' END"
    )
    ev = load_table(spark, SF, "events")
    eid = F.col("event_id")
    op = (
        F.when(eid % i_mod == 0, F.lit("I"))
        .when(eid % d_mod == 1, F.lit("D"))
        .otherwise(F.lit("U"))
    )
    src_df = ev.select(
        (F.col("user_id") % key_mod).alias("k"), "event_id",
        op.alias("op"),
        F.when(
            op != "D",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        ).alias("cents"),
    )
    src_sql = (
        f"(SELECT user_id % {key_mod} AS k, event_id, {op_sql} AS op,"
        f" CASE WHEN {op_sql} <> 'D' THEN"
        " CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents"
        " FROM events)"
    )
    sdf = compact_changeset(src_df, ["k"], "event_id", ["cents"])
    _check(
        sdf, duck,
        compact_changeset_oracle_sql(src_sql, ["k"], "event_id", ["cents"]),
    )


@given(
    drop_mod=st.integers(0, 60),   # 0/1 -> intact parent
    null_mod=st.integers(0, 8),    # 0/1 -> no NULL injection
)
@FUZZ
def test_fuzz_fk_census(spark, duck, drop_mod, null_mod):
    from shuttle_spark.operators.integrity import (
        fk_integrity_census,
        fk_integrity_oracle_sql,
    )

    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    o_sql = "orders"
    if drop_mod > 1:
        orders = orders.filter(F.col("o_orderkey") % drop_mod != 0)
        o_sql = f"(SELECT * FROM orders WHERE o_orderkey % {drop_mod} <> 0)"
    li_sql = "lineitem"
    if null_mod > 1:
        li = li.select(
            F.when(
                F.col("l_linenumber") % null_mod != 0, F.col("l_orderkey")
            ).alias("l_orderkey")
        )
        li_sql = (
            f"(SELECT CASE WHEN l_linenumber % {null_mod} <> 0"
            " THEN l_orderkey END AS l_orderkey FROM lineitem)"
        )
    sdf = fk_integrity_census(
        [("e", li, "l_orderkey", orders, "o_orderkey")]
    )
    _check(
        sdf, duck,
        fk_integrity_oracle_sql(
            [("e", li_sql, "l_orderkey", o_sql, "o_orderkey")]
        ),
    )


# ---------------------------------------------------------------------------
# Mode 48: bigram LM stats — random top-k + document subsets
# ---------------------------------------------------------------------------

@given(
    top_k=st.integers(5, 120),
    doc_mod=st.integers(0, 7),  # 0/1 -> all docs
)
@FUZZ
def test_fuzz_bigram_lm(spark, duck, top_k, doc_mod):
    from shuttle_spark.operators.pipeline import (
        bigram_lm_oracle_sql,
        bigram_lm_stats,
    )

    docs = load_table(spark, SF, "documents")
    src = "documents"
    if doc_mod > 1:
        docs = docs.filter(F.col("doc_id") % doc_mod != 1)
        src = f"(SELECT * FROM documents WHERE doc_id % {doc_mod} <> 1)"
    sdf = bigram_lm_stats(docs, top_k=top_k)
    _check(sdf, duck, bigram_lm_oracle_sql(src, _II_NORM, top_k=top_k))


# ---------------------------------------------------------------------------
# Mode 49: linear-interpolation imputation — randomized gap moduli and
# series keys; census (rows / interpolated / 6dp micro checksum) must
# hash-match the identical bracket-window SQL
# ---------------------------------------------------------------------------

@given(
    null_mod=st.integers(3, 9),
    per_type=st.booleans(),
)
@FUZZ
def test_fuzz_interp_impute(spark, duck, null_mod, per_type):
    from shuttle_spark.operators.relational import (
        interp_impute,
        interp_impute_oracle_sql,
    )

    keys = ["user_id", "event_type"] if per_type else ["user_id"]
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "event_id",
        F.when(F.col("event_id") % null_mod == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    out = interp_impute(ev, keys, "ts", "event_id", "value")
    group = "event_type" if per_type else "user_id"
    sdf = out.groupBy(group).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("is_interpolated").cast("long")).alias("n_interp"),
        F.sum(
            F.when(
                F.col("value_cents").isNotNull(),
                F.round(F.col("value_cents") * 1_000_000).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("chk_micro"),
    )
    src = (
        "SELECT user_id, event_type, ts, event_id,"
        f" CASE WHEN event_id % {null_mod} = 0 THEN NULL"
        " ELSE value END AS value FROM events"
    )
    inner = interp_impute_oracle_sql(
        f"({src})", keys, "ts", "event_id", "value"
    )
    sql = (
        f"WITH o AS ({inner})"
        f" SELECT {group}, CAST(COUNT(*) AS BIGINT) AS n_rows,"
        "  CAST(SUM(CASE WHEN is_interpolated THEN 1 ELSE 0 END)"
        "   AS BIGINT) AS n_interp,"
        "  CAST(SUM(CASE WHEN value_cents IS NOT NULL THEN"
        "   CAST(ROUND(value_cents * 1000000) AS BIGINT) ELSE 0 END)"
        "   AS BIGINT) AS chk_micro"
        f" FROM o GROUP BY 1"
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 50: k-anonymity / l-diversity census — randomized thresholds and
# quasi-identifier granularity; the 1-row exact-integer census pins the
# whole class-size + diversity distribution
# ---------------------------------------------------------------------------

@given(
    k=st.integers(2, 9),
    l_threshold=st.integers(2, 5),
    ubucket=st.integers(31, 199),
    sens_mod=st.integers(7, 60),
    with_sens=st.booleans(),
)
@FUZZ
def test_fuzz_k_anonymity(spark, duck, k, l_threshold, ubucket, sens_mod,
                          with_sens):
    from shuttle_spark.operators.pipeline import (
        k_anonymity_census,
        k_anonymity_oracle_sql,
    )

    ev = load_table(spark, SF, "events")
    staged = ev.select(
        F.col("event_type").alias("qi_type"),
        F.to_date("ts").alias("qi_day"),
        (F.col("user_id") % ubucket).alias("qi_ubucket"),
        F.when(
            F.col("value").isNotNull(),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            % sens_mod,
        ).alias("sens"),
    )
    sens = "sens" if with_sens else None
    sdf = k_anonymity_census(
        staged, ["qi_type", "qi_day", "qi_ubucket"],
        k=k, sensitive_col=sens, l_threshold=l_threshold,
    )
    src = (
        "SELECT event_type AS qi_type,"
        " CAST(ts::TIMESTAMP AS DATE) AS qi_day,"
        f" user_id % {ubucket} AS qi_ubucket,"
        " CASE WHEN value IS NOT NULL THEN"
        f"  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % {sens_mod} END"
        " AS sens FROM events"
    )
    sql = k_anonymity_oracle_sql(
        f"({src})", ["qi_type", "qi_day", "qi_ubucket"],
        k=k, sensitive_col=sens, l_threshold=l_threshold,
    )
    _check(sdf, duck, sql)


# ---------------------------------------------------------------------------
# Mode 51: BPE merge training — randomized merge counts and corpus
# subsets; the distributed loop must equal the pure-Python replay (same
# bpe_pair_merge kernel, same total-order tie-break) EXACTLY
# ---------------------------------------------------------------------------

@given(
    n_merges=st.integers(2, 10),
    doc_mod=st.integers(1, 5),
)
@settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES_SLOW", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzz_bpe_train(spark, duck, n_merges, doc_mod):
    from shuttle_spark.functions import text as TXF
    from shuttle_spark.operators.pipeline import bpe_pair_merge, bpe_train

    docs = load_table(spark, SF, "documents")
    if doc_mod > 1:
        docs = docs.filter(F.col("doc_id") % doc_mod != 1)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=n_merges).orderBy("rank").collect()
    ]
    vocab = [
        [list(r["w"]), int(r["n"])]
        for r in docs.select(
            F.explode(TXF.tokens(F.col("text"))).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    exp = []
    for rank in range(n_merges):
        counts = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n
                )
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        exp.append((rank, left, right, left + right, c))
        for entry in vocab:
            if left in entry[0] and right in entry[0]:
                entry[0] = bpe_pair_merge(entry[0], left, right)
    assert got == exp


# ---------------------------------------------------------------------------
# Mode 52: BPE driver fast path (r11) — the incremental heap/index
# trainer must equal the full-recount replay on RANDOM synthetic vocabs
# (words drawn from a 3-letter alphabet maximize pair collisions, merge
# cascades, and reappearing-pair cases the gate corpus rarely hits).
# Pure Python: no Spark session, so hypothesis can afford many examples.
# ---------------------------------------------------------------------------

@given(
    words=st.lists(
        st.tuples(st.text(alphabet="abc", min_size=1, max_size=8),
                  st.integers(1, 9)),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    ),
    n_merges=st.integers(1, 12),
    min_pair_count=st.integers(1, 3),
)
@settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "200")),
    deadline=None,
)
def test_fuzz_bpe_vocab_trainer(words, n_merges, min_pair_count):
    from shuttle_spark.operators.pipeline import (
        _bpe_train_vocab,
        bpe_pair_merge,
    )

    vocab_fast = [[list(w), n] for w, n in words]
    vocab_slow = [[list(w), n] for w, n in words]
    got = _bpe_train_vocab(vocab_fast, n_merges, min_pair_count)
    exp = []
    for rank in range(n_merges):
        counts: dict = {}
        for syms, n in vocab_slow:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n
                )
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        exp.append((rank, left, right, left + right, c))
        for entry in vocab_slow:
            if left in entry[0] and right in entry[0]:
                entry[0] = bpe_pair_merge(entry[0], left, right)
    assert got == exp
