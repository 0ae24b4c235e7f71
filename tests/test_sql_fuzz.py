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


def test_random_sql_two_engine_parity(fuzz_views, duck_con):
    spark = fuzz_views
    rng = random.Random(SEED)
    for i in range(N_QUERIES):
        sql = _gen_query(rng)
        got = _norm([tuple(r) for r in spark.sql(sql).collect()])
        want = _norm(duck_con.execute(sql).fetchall())
        assert got == want, f"query #{i} diverged:\n{sql}\nspark={got[:3]}\nduck={want[:3]}"
