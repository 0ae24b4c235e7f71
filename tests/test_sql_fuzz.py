"""Randomized relational-SQL fuzzing: the SAME ANSI query text executed by
Spark SQL and DuckDB over the same parquet tables (reference analogue: the
randomized plan-check suites, sql/core SQLQueryTestSuite's golden approach
— here the oracle is computed live instead of from golden files).

Dialect-portability discipline baked into the generator:
- aggregates are exact-integer only (SUM/MIN/MAX over CAST AS BIGINT,
  COUNT, COUNT DISTINCT) — no float accumulation order ambiguity;
- timestamps appear only in predicates and inside year(), never as output
  columns (engines render/convert them differently);
- no division (integer `/` is float in DuckDB, double in Spark).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR

N_QUERIES = 40
SEED = 20260814

# (sql-fragment producing a group key, its alias) — all int/string typed
_KEYS = [
    ("l_returnflag", "k_flag"),
    ("l_linestatus", "k_status"),
    ("o_orderstatus", "k_ostatus"),
    ("o_orderpriority", "k_prio"),
    ("year(l_shipdate)", "k_shipyear"),
    ("year(o_orderdate)", "k_oyear"),
    ("l_orderkey % 5", "k_bucket"),
    ("CASE WHEN l_quantity >= 25 THEN 'big' ELSE 'small' END", "k_size"),
]

_AGGS = [
    "COUNT(*)",
    "COUNT(DISTINCT l_suppkey)",
    "SUM(CAST(l_quantity AS BIGINT))",
    "SUM(CAST(round(l_extendedprice * 100) AS BIGINT))",
    "MIN(CAST(l_orderkey AS BIGINT))",
    "MAX(CAST(l_partkey AS BIGINT))",
    "MAX(l_returnflag)",
    "SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)",
]

_PREDS = [
    "l_quantity >= {q}",
    "l_quantity < {q}",
    "l_returnflag IN ('A', 'R')",
    "l_linestatus = 'O'",
    "l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'",
    "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'",
    "o_orderpriority LIKE '1%'",
    "o_orderstatus <> 'P'",
    "l_orderkey % 7 = {m}",
    "l_extendedprice > 1000 AND l_discount <= 0.08",
    "NOT (l_tax = 0.0)",
    "o_totalprice BETWEEN 1000 AND 150000",
]


def _gen_query(rng: random.Random) -> str:
    keys = rng.sample(_KEYS, rng.randint(0, 2))
    aggs = rng.sample(_AGGS, rng.randint(1, 3))
    preds = [
        p.format(q=rng.randint(5, 45), m=rng.randint(0, 6))
        for p in rng.sample(_PREDS, rng.randint(0, 2))
    ]
    sel = [f"{expr} AS {alias}" for expr, alias in keys] + [
        f"{agg} AS a{i}" for i, agg in enumerate(aggs)
    ]
    sql = "SELECT " + ", ".join(sel)
    sql += "\nFROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    if preds:
        sql += "\nWHERE " + " AND ".join(preds)
    if keys:
        sql += "\nGROUP BY " + ", ".join(alias for _, alias in keys)
        if rng.random() < 0.3:
            sql += "\nHAVING COUNT(*) >= " + str(rng.randint(1, 3))
    return sql


def _norm(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            assert not isinstance(v, float), f"float leaked into fuzz output: {row}"
            vals.append(int(v) if isinstance(v, bool) else v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def fuzz_views(spark):
    for t in ("lineitem", "orders"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark


@pytest.mark.heavy
def test_random_sql_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED)
    for i in range(N_QUERIES):
        sql = _gen_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"query #{i} diverged:\n{sql}\nspark={got[:3]}\nduck={want[:3]}"


# ---------------------------------------------------------------------------
# Window-function fuzzing: random window specs with a guaranteed total order
# (every ORDER BY ends with the unique (l_orderkey, l_linenumber) pair) so
# rank/lag/frame outputs are engine-deterministic.
# ---------------------------------------------------------------------------

_W_PARTS = ["l_returnflag", "l_linestatus", "l_orderkey % 4"]
_W_ORDERS = [
    "CAST(l_quantity AS BIGINT) DESC",
    "CAST(l_partkey AS BIGINT)",
    "l_shipdate",
]
_W_FRAMES = [
    "",
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
]


def _gen_window_query(rng: random.Random) -> str:
    part = rng.choice(_W_PARTS)
    order = rng.choice(_W_ORDERS) + ", l_orderkey, l_linenumber"
    over_rank = f"(PARTITION BY {part} ORDER BY {order})"
    over_agg = f"(PARTITION BY {part} ORDER BY {order}{rng.choice(_W_FRAMES)})"
    fns = rng.sample(
        [
            f"row_number() OVER {over_rank}",
            f"rank() OVER {over_rank}",
            f"dense_rank() OVER {over_rank}",
            f"lag(CAST(l_suppkey AS BIGINT), 1, -1) OVER {over_rank}",
            f"lead(CAST(l_suppkey AS BIGINT), {rng.randint(1, 3)}, 0) OVER {over_rank}",
            f"SUM(CAST(l_quantity AS BIGINT)) OVER {over_agg}",
            f"COUNT(*) OVER {over_agg}",
            f"MIN(CAST(l_partkey AS BIGINT)) OVER {over_agg}",
        ],
        rng.randint(1, 3),
    )
    sel = ["l_orderkey", "l_linenumber"] + [f"{f} AS w{i}" for i, f in enumerate(fns)]
    return (
        "SELECT "
        + ", ".join(sel)
        + f"\nFROM lineitem\nWHERE l_orderkey % {rng.randint(7, 19)} = 0"
    )


def test_random_window_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 1)
    for i in range(25):
        sql = _gen_window_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"window query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# Outer-join + null-semantics fuzzing: aggregate subqueries joined with
# random outer types; COALESCE over the nullable sides; NOT IN vs NOT EXISTS
# with an injected NULL (the classic three-valued-logic trap) — both engines
# must agree on every shape.
# ---------------------------------------------------------------------------


def _gen_outer_join_query(rng: random.Random) -> str:
    jt = rng.choice(["LEFT", "RIGHT", "FULL"])
    mod_a, mod_b = rng.randint(2, 5), rng.randint(2, 5)
    q = f"""
    WITH a AS (
      SELECT l_orderkey AS k, SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem WHERE l_orderkey % {mod_a} = 0 GROUP BY l_orderkey
    ),
    b AS (
      SELECT o_orderkey AS k, COUNT(*) AS n
      FROM orders WHERE o_orderkey % {mod_b} = 1 GROUP BY o_orderkey
    )
    SELECT COALESCE(a.k, b.k) AS k, COALESCE(qty, -1) AS qty, COALESCE(n, -1) AS n
    FROM a {jt} OUTER JOIN b ON a.k = b.k"""
    if rng.random() < 0.5:
        q += f"\n    WHERE COALESCE(qty, -1) % {rng.randint(2, 4)} = 0"
    return q


def test_random_outer_join_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 2)
    for i in range(20):
        sql = _gen_outer_join_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"outer-join query #{i} diverged:\n{sql}"


def test_not_in_with_null_agrees(fuzz_views, duck_con):
    # NOT IN over a set containing NULL is empty under three-valued logic;
    # NOT EXISTS over the same set is not — both engines must agree on both.
    spark = fuzz_views
    for sql in [
        """SELECT COUNT(*) AS c FROM orders
           WHERE o_orderkey NOT IN (SELECT NULLIF(l_orderkey, l_orderkey) FROM lineitem)""",
        """SELECT COUNT(*) AS c FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                             WHERE NULLIF(l.l_orderkey, l.l_orderkey) = o.o_orderkey)""",
        """SELECT COUNT(*) AS c FROM orders
           WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 30)""",
    ]:
        got = [tuple(r) for r in spark.sql(sql).collect()]
        want = duck_con.execute(sql).fetchall()
        assert got == want, f"diverged on:\n{sql}\nspark={got} duck={want}"


# ---------------------------------------------------------------------------
# Grouping-sets fuzzing: ROLLUP / CUBE / explicit GROUPING SETS with
# GROUPING() markers — same text in both engines; the markers disambiguate
# aggregated NULLs from data NULLs, so results are fully comparable.
# ---------------------------------------------------------------------------


def _gen_grouping_query(rng: random.Random) -> str:
    keys = rng.sample(["l_returnflag", "l_linestatus", "l_orderkey % 3"], 2)
    ka, kb = keys
    spec = rng.choice(
        [
            f"ROLLUP (k1, k2)",
            f"CUBE (k1, k2)",
            f"GROUPING SETS ((k1, k2), (k1), ())",
            f"GROUPING SETS ((k1), (k2))",
        ]
    )
    return f"""
    SELECT k1, k2, GROUPING(k1) AS g1, GROUPING(k2) AS g2,
           count(*) AS n, sum(CAST(l_quantity AS BIGINT)) AS qty
    FROM (SELECT {ka} AS k1, {kb} AS k2, l_quantity FROM lineitem
          WHERE l_orderkey % {rng.randint(2, 6)} = 0)
    GROUP BY {spec}"""


def test_random_grouping_sets_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 3)
    for i in range(15):
        sql = _gen_grouping_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"grouping query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# Set-operation fuzzing: INTERSECT / EXCEPT / UNION with and without ALL
# (bag vs set semantics) over deliberately-overlapping projections.
# ---------------------------------------------------------------------------


def _gen_setop_query(rng: random.Random) -> str:
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
    )
    ma, mb = rng.randint(2, 4), rng.randint(2, 4)
    return f"""
    SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) % 10 AS q
    FROM lineitem WHERE l_orderkey % {ma} = 0
    {op}
    SELECT l_returnflag, CAST(l_quantity AS BIGINT) % 10
    FROM lineitem WHERE l_orderkey % {mb} = 1"""


def test_random_setops_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 4)
    for i in range(18):
        sql = _gen_setop_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"setop query #{i} ({sql.splitlines()[3].strip()}) diverged"


# ---------------------------------------------------------------------------
# Correlated-subquery fuzzing: scalar subqueries in SELECT/WHERE and
# [NOT] EXISTS, randomly composed — the decorrelation rewrite (subquery →
# aggregate join) is where engines classically diverge on empty groups.
# ---------------------------------------------------------------------------


def _gen_subquery_query(rng: random.Random) -> str:
    mod = rng.randint(11, 29)
    shape = rng.choice(["scalar_select", "scalar_where", "exists", "not_exists"])
    if shape == "scalar_select":
        agg = rng.choice(
            ["COUNT(*)", "COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0)",
             "COALESCE(MIN(CAST(l_suppkey AS BIGINT)), -1)"]
        )
        return f"""
        SELECT o_orderkey,
               (SELECT {agg} FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_quantity >= {rng.randint(10, 40)}) AS s
        FROM orders WHERE o_orderkey % {mod} = 0"""
    if shape == "scalar_where":
        return f"""
        SELECT o_orderkey FROM orders
        WHERE o_orderkey % {mod} = 0
          AND (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey)
              >= {rng.randint(1, 5)}"""
    neg = "NOT " if shape == "not_exists" else ""
    return f"""
    SELECT o_orderkey FROM orders o
    WHERE o_orderkey % {mod} = 0
      AND {neg}EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity > {rng.randint(20, 45)})"""


def test_random_correlated_subqueries_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 5)
    for i in range(16):
        sql = _gen_subquery_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"subquery #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# String-scalar fuzzing: randomly composed portable string expressions
# (upper/lower/substr/trim/replace/concat/length) over real column data —
# per-row outputs compared exactly.
# ---------------------------------------------------------------------------

_STR_FNS = [
    "upper({x})",
    "lower({x})",
    "substr({x}, 2, 5)",
    "trim({x})",
    "replace({x}, 'a', '_')",
    "{x} || '-' || l_returnflag",
    "CAST(length({x}) AS BIGINT)",
    "reverse({x})",
    "ltrim(rtrim({x}))",
    "repeat(l_linestatus, 3)",
]


def _gen_string_query(rng: random.Random) -> str:
    x = rng.choice(["l_returnflag", "l_linestatus", "o_orderpriority", "o_orderstatus"])
    exprs = [f.format(x=x) for f in rng.sample(_STR_FNS, rng.randint(2, 4))]
    inner = rng.choice(exprs)
    exprs.append(f"upper({inner})" if "length" not in inner else inner)
    sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(exprs))
    return f"""
    SELECT l_orderkey, l_linenumber, {sel}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey % {rng.randint(17, 43)} = 0"""


def test_random_string_exprs_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 6)
    for i in range(15):
        sql = _gen_string_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"string query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# Datetime fuzzing over the portable subset: year/month/day/hour extracts
# as BIGINT, date_trunc cast to DATE (never raw timestamps in the output —
# engines render/convert those differently).
# ---------------------------------------------------------------------------

_DT_EXPRS = [
    "CAST(year({t}) AS BIGINT)",
    "CAST(month({t}) AS BIGINT)",
    "CAST(day({t}) AS BIGINT)",
    "CAST(hour({t}) AS BIGINT)",
    "CAST(date_trunc('month', {t}) AS DATE)",
    "CAST(date_trunc('year', {t}) AS DATE)",
    "CAST(date_trunc('day', {t}) AS DATE)",
]


def _gen_datetime_query(rng: random.Random) -> str:
    t = rng.choice(["l_shipdate", "o_orderdate"])
    exprs = [f.format(t=t) for f in rng.sample(_DT_EXPRS, rng.randint(2, 4))]
    sel = ", ".join(f"{e} AS d{i}" for i, e in enumerate(exprs))
    group = rng.random() < 0.5
    if group:
        keys = ", ".join(f"d{i}" for i in range(len(exprs)))
        return f"""
        SELECT {sel}, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_orderkey % {rng.randint(5, 13)} = 0
        GROUP BY {keys}"""
    return f"""
    SELECT l_orderkey, l_linenumber, {sel}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey % {rng.randint(23, 47)} = 0"""


def test_random_datetime_exprs_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 7)
    for i in range(15):
        sql = _gen_datetime_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"datetime query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# Join-graph fuzzing: random connected subgraphs of the star schema
# (lineitem-orders-customer-nation-region / supplier / part) joined INNER
# along their FK edges in random order — the shapes Catalyst's join
# reordering and DuckDB's optimizer must agree on.
# ---------------------------------------------------------------------------

# table -> (parent table, join condition); chains are built by walking
# edges upward from lineitem
_GRAPH_EDGES = {
    "orders": "l_orderkey = o_orderkey",
    "customer": "o_custkey = c_custkey",
    "nation": "c_nationkey = n_nationkey",
    "region": "n_regionkey = r_regionkey",
    "supplier": "l_suppkey = s_suppkey",
    "part": "l_partkey = p_partkey",
}
_GRAPH_KEYS = {
    "orders": ("o_orderstatus", "k_ost"),
    "customer": ("c_mktsegment", "k_seg"),
    "nation": ("n_name", "k_nat"),
    "region": ("r_name", "k_reg"),
    "supplier": ("s_suppkey % 3", "k_sup"),
    "part": ("p_brand", "k_brand"),
}
_GRAPH_PREDS = {
    "orders": "o_orderstatus <> 'X'",
    "customer": "c_acctbal >= {v}",
    "nation": "n_nationkey % 2 = 0",
    "region": "r_regionkey <= {v}",
    "supplier": "s_acctbal > {v}",
    "part": "p_size BETWEEN 1 AND {v}",
}


def _gen_join_graph_query(rng: random.Random) -> str:
    # pick a connected table set: always lineitem; orders-chain depth 0-4;
    # optionally supplier and/or part legs
    chain = ["orders", "customer", "nation", "region"][: rng.randint(0, 4)]
    legs = [t for t in ("supplier", "part") if rng.random() < 0.4]
    tables = chain + legs
    joins = "".join(
        f"\n    JOIN {t} ON {_GRAPH_EDGES[t]}" for t in tables
    )
    keys = [_GRAPH_KEYS[t] for t in rng.sample(tables, min(len(tables), 2))] if tables else []
    aggs = rng.sample(_AGGS, rng.randint(1, 2))
    preds = [
        _GRAPH_PREDS[t].format(v=rng.randint(2, 30))
        for t in tables
        if rng.random() < 0.4
    ]
    sel = [f"{e} AS {a}" for e, a in keys] + [f"{g} AS a{i}" for i, g in enumerate(aggs)]
    sql = "SELECT " + ", ".join(sel) + "\nFROM lineitem" + joins
    if preds:
        sql += "\nWHERE " + " AND ".join(preds)
    if keys:
        sql += "\nGROUP BY " + ", ".join(a for _, a in keys)
    return sql


@pytest.mark.heavy
def test_random_join_graphs_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    from sparkfulltextquery_spark.sources import load_table

    for t in ("customer", "nation", "region", "supplier", "part"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
        duck_con.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rng = random.Random(SEED + 8)
    for i in range(20):
        sql = _gen_join_graph_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"join-graph query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# Integer-arithmetic / CASE fuzzing: randomly nested exact-integer
# expressions (+ - * % abs greatest least, CASE ladders) computed per-row —
# the constant-folding and three-valued-logic surface, no floats anywhere.
# ---------------------------------------------------------------------------

_INT_COLS = [
    "CAST(l_orderkey AS BIGINT)",
    "CAST(l_partkey AS BIGINT)",
    "CAST(l_suppkey AS BIGINT)",
    "CAST(l_linenumber AS BIGINT)",
    "CAST(round(l_quantity) AS BIGINT)",
]


def _gen_int_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.35:
        return rng.choice(_INT_COLS) if rng.random() < 0.7 else str(rng.randint(-9, 9))
    shape = rng.choice(["bin", "mod", "abs", "gl", "case"])
    a = _gen_int_expr(rng, depth + 1)
    b = _gen_int_expr(rng, depth + 1)
    if shape == "bin":
        op = rng.choice(["+", "-", "*"])
        if op == "*":
            # bound each factor below 2^17 so nested products stay far
            # inside int64 at ANY scale factor — DuckDB raises Out of Range
            # on overflow while non-ANSI Spark silently wraps, so an
            # unbounded product is a false "divergence" waiting on a seed
            # or SF change (truncating % keeps the dividend's sign in both
            # engines, so negative operands stay portable)
            return f"(({a}) % 100003) * (({b}) % 100003)"
        return f"({a} {op} {b})"
    if shape == "mod":
        # strictly-positive divisor: engines agree on % sign for pos divisors
        return f"({a} % {rng.randint(2, 13)})"
    if shape == "abs":
        return f"abs({a})"
    if shape == "gl":
        return f"{rng.choice(['greatest', 'least'])}({a}, {b})"
    return (
        f"(CASE WHEN {a} > {rng.randint(-5, 20)} THEN {b} "
        f"WHEN {a} < {rng.randint(-20, -6)} THEN {rng.randint(0, 5)} "
        f"ELSE {_gen_int_expr(rng, depth + 1)} END)"
    )


def _gen_arith_query(rng: random.Random) -> str:
    exprs = [_gen_int_expr(rng) for _ in range(rng.randint(2, 4))]
    sel = ", ".join(f"CAST({e} AS BIGINT) AS e{i}" for i, e in enumerate(exprs))
    return f"""
    SELECT l_orderkey, l_linenumber, {sel}
    FROM lineitem
    WHERE l_orderkey % {rng.randint(13, 37)} = 0"""


def test_random_int_arithmetic_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 9)
    for i in range(20):
        sql = _gen_arith_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"arith query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# FILTER-clause fuzzing: aggregates with per-aggregate FILTER (WHERE ...)
# predicates (the SQL:2003 pivot primitive) — random aggregate/filter
# combinations, exact-integer only.
# ---------------------------------------------------------------------------

_FILTER_AGGS = [
    "COUNT(*)",
    "COUNT(DISTINCT l_suppkey)",
    "SUM(CAST(l_quantity AS BIGINT))",
    "MIN(CAST(l_partkey AS BIGINT))",
    "MAX(CAST(l_orderkey AS BIGINT))",
]
_FILTER_PREDS = [
    "l_quantity >= {q}",
    "l_returnflag = 'R'",
    "l_linestatus = 'O'",
    "l_orderkey % {m} = 0",
    "l_discount > 0.05",
]


_FILTER_KEYS = [k for k in _KEYS if not k[0].startswith(("o_", "year(o_"))]


def _gen_filter_agg_query(rng: random.Random) -> str:
    keys = rng.sample(_FILTER_KEYS, rng.randint(0, 2))
    parts = []
    for i in range(rng.randint(2, 4)):
        agg = rng.choice(_FILTER_AGGS)
        if rng.random() < 0.8:
            pred = rng.choice(_FILTER_PREDS).format(
                q=rng.randint(10, 40), m=rng.randint(2, 7)
            )
            # COALESCE: a filter matching no rows yields NULL for SUM/MIN/MAX
            parts.append(f"COALESCE({agg} FILTER (WHERE {pred}), -1) AS a{i}")
        else:
            parts.append(f"{agg} AS a{i}")
    sel = [f"{e} AS {a}" for e, a in keys] + parts
    sql = "SELECT " + ", ".join(sel) + "\nFROM lineitem"
    if keys:
        sql += "\nGROUP BY " + ", ".join(a for _, a in keys)
    return sql


def test_random_filter_clause_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 10)
    for i in range(18):
        sql = _gen_filter_agg_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"filter-agg query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# ORDER BY / LIMIT / OFFSET fuzzing: random sort directions + NULLS
# placement over a guaranteed total order (the unique key pair always
# terminates the ORDER BY), random LIMIT/OFFSET windows — the top-k /
# pagination surface both engines must slice identically.
# ---------------------------------------------------------------------------

_OL_SORTS = [
    "CAST(l_quantity AS BIGINT) DESC",
    "CAST(l_quantity AS BIGINT) ASC",
    "l_returnflag DESC",
    "CAST(l_partkey AS BIGINT) % 97",
    "year(l_shipdate) DESC",
]


def _gen_order_limit_query(rng: random.Random) -> str:
    sorts = rng.sample(_OL_SORTS, rng.randint(1, 2))
    order = ", ".join(sorts) + ", l_orderkey, l_linenumber"
    limit = rng.randint(1, 50)
    offset = rng.choice([0, rng.randint(1, 30)])
    sql = f"""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS q, l_returnflag
    FROM lineitem
    WHERE l_orderkey % {rng.randint(3, 11)} = 0
    ORDER BY {order}
    LIMIT {limit}"""
    if offset:
        sql += f" OFFSET {offset}"
    return sql


def test_random_order_limit_offset_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 11)
    for i in range(18):
        sql = _gen_order_limit_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"order-limit query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# Window-over-join-aggregate fuzzing: a window function ranking the rows of
# an aggregated join (the TPC-DS q47/q51 composition) — random keys,
# aggregates, and window specs stacked in one query.
# ---------------------------------------------------------------------------


def _gen_window_over_agg_query(rng: random.Random) -> str:
    key = rng.choice(
        ["o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus"]
    )
    agg = rng.choice(
        ["SUM(CAST(l_quantity AS BIGINT))", "COUNT(*)", "MAX(CAST(l_partkey AS BIGINT))"]
    )
    wfn = rng.choice(
        [
            "row_number() OVER (PARTITION BY k1 ORDER BY v DESC, k2)",
            "rank() OVER (PARTITION BY k1 ORDER BY v DESC, k2)",
            "SUM(v) OVER (PARTITION BY k1 ORDER BY v, k2 "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
            "lag(v, 1, -1) OVER (PARTITION BY k1 ORDER BY v, k2)",
        ]
    )
    return f"""
    WITH a AS (
      SELECT {key} AS k1, l_orderkey % {rng.randint(3, 9)} AS k2, {agg} AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity >= {rng.randint(5, 30)}
      GROUP BY k1, k2
    )
    SELECT k1, k2, v, {wfn} AS w FROM a"""


def test_random_window_over_agg_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 12)
    for i in range(15):
        sql = _gen_window_over_agg_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"window-over-agg query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# LIKE-pattern fuzzing: random %/_ patterns (LIKE, NOT LIKE, ILIKE) built
# from real value fragments — wildcard-matching parity per row.
# ---------------------------------------------------------------------------

_LIKE_COLS = ["o_orderpriority", "o_orderstatus", "l_returnflag", "l_linestatus"]
_LIKE_FRAGS = ["1%", "%URGENT", "%-%", "_", "%E%", "2-H_GH", "%O%", "N", "%T"]


def _gen_like_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(1, 3)):
        col = rng.choice(_LIKE_COLS)
        pat = rng.choice(_LIKE_FRAGS)
        op = rng.choice(["LIKE", "NOT LIKE", "ILIKE", "NOT ILIKE"])
        if op.endswith("ILIKE"):
            pat = pat.lower()
        preds.append(f"({col} {op} '{pat}')")
    sel = ", ".join(
        f"count_if{p} AS c{i}" for i, p in enumerate(preds)
    )
    return f"""
    SELECT l_returnflag AS k, COUNT(*) AS n, {sel}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY k"""


def test_random_like_patterns_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 13)
    for i in range(15):
        sql = _gen_like_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"like query #{i} diverged:\n{sql}"


# ---------------------------------------------------------------------------
# GROUPING_ID fuzzing (r7, round 16): multi-argument GROUPING_ID over
# 3-key CUBE/ROLLUP/GROUPING SETS — same text in both engines (probed:
# identical first-arg-is-MSB bit order), optionally filtered by a HAVING
# on the id. Complements the single-column GROUPING() round (SEED+3) and
# the Hive grouping_id literal pins (test_function_breadth CASES_R7).
# ---------------------------------------------------------------------------


def _gen_grouping_id_query(rng: random.Random) -> str:
    keys = rng.sample(
        ["l_returnflag", "l_linestatus", "l_orderkey % 3", "CAST(l_quantity >= 25 AS INT)"],
        3,
    )
    spec = rng.choice(
        [
            "ROLLUP (k1, k2, k3)",
            "CUBE (k1, k2, k3)",
            "GROUPING SETS ((k1, k2, k3), (k1), (k2, k3), ())",
            "GROUPING SETS ((k1), (k2), (k3))",
        ]
    )
    having = ""
    if rng.random() < 0.5:
        having = f"\n    HAVING GROUPING_ID(k1, k2, k3) {rng.choice(['<', '>=', '='])} {rng.randint(0, 7)}"
    return f"""
    SELECT k1, k2, k3, GROUPING_ID(k1, k2, k3) AS gid,
           count(*) AS n, sum(CAST(l_quantity AS BIGINT)) AS qty
    FROM (SELECT {keys[0]} AS k1, {keys[1]} AS k2, {keys[2]} AS k3, l_quantity
          FROM lineitem WHERE l_orderkey % {rng.randint(2, 6)} = 0)
    GROUP BY {spec}{having}"""


def test_random_grouping_id_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED + 14)
    for i in range(15):
        sql = _gen_grouping_id_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"grouping_id query #{i} diverged:\n{sql}"
