"""Additional TPC-H-shaped end-to-end queries (adapted to the synthetic
corpus's columns). These widen the relational spine beyond Q1/Q3/Q5 —
each exercises a distinct plan shape the reference's TPC-DS benchmark
corpus covers (sql/core/src/test/resources/tpcds/, 103 queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-range filter + EXISTS semi join + agg."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+sum — every predicate pushes to parquet;
    the codegen-throughput benchmark shape (MiscBenchmark range/filter/sum)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter → 3 joins → agg → top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big      ON big.l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a semi-join back
    into the fact table (classic two-pass plan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + max-selection join-back (scalar
    subquery over the aggregate — Catalyst plans a reused subquery)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_rev"
            )
        )
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx), rev.total_rev == mx.m)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(unit_cost) AS best_cost FROM cost GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
           round(c.unit_cost, 4) AS unit_cost
    FROM cost c JOIN best b
      ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    WHERE c.l_partkey < 50
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin via aggregate + join-back on the
    minimum (the decorrelated form of Q2's correlated min subquery)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    # rename the join-back side — cost and best share lineage, so unqualified
    # l_partkey would be an ambiguous self-join reference
    best = best.select(F.col("l_partkey").alias("bp"), "best_cost")
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("bp")) & (F.col("unit_cost") == F.col("best_cost")),
        )
        .filter(F.col("l_partkey") < 50)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            F.round("unit_cost", 4).alias("unit_cost"),
        )
    )


@query(
    "analytics_monthly_growth",
    oracle="""
    WITH monthly AS (
      SELECT n_name, date_trunc('month', o_orderdate) AS mon,
             round(sum(o_totalprice), 2) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, date_trunc('month', o_orderdate)
    )
    SELECT n_name, mon, rev,
           round(rev - lag(rev) OVER (PARTITION BY n_name ORDER BY mon), 2) AS mom_delta
    FROM monthly
    """,
)
def analytics_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite shape: join → time-bucketed aggregate → window over the
    aggregate (month-over-month revenue delta per nation). Two shuffles:
    the monthly rollup and the per-nation window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window as W

    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = W.partitionBy("n_name").orderBy("mon")
    return monthly.select(
        "n_name",
        "mon",
        "rev",
        F.round(F.col("rev") - F.lag("rev").over(w), 2).alias("mom_delta"),
    )


@query(
    "analytics_above_nation_average",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_nationkey, round(sum(o_totalprice), 2) AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_nationkey
    ),
    nation_avg AS (
      SELECT c_nationkey, avg(total) AS nat_avg,
             round(sum(total), 2) AS nat_total, count(*) AS nat_n
      FROM spend GROUP BY c_nationkey
    )
    SELECT s.c_custkey, s.total, n.nat_total, n.nat_n
    FROM spend s JOIN nation_avg n ON s.c_nationkey = n.c_nationkey
    WHERE s.total > 1.5 * n.nat_avg
    """,
)
def analytics_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite shape: aggregate → re-aggregate → join-back comparison
    (customers spending >1.5× their nation's average). The decorrelated form
    of a correlated-aggregate subquery — two shuffles, no per-row subquery."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    nat = spend.groupBy("c_nationkey").agg(
        F.avg("total").alias("nat_avg"),
        # expose sum+count, not the avg: round(avg, k) can land exactly on a
        # rounding tie (avg of 2-decimal values over small counts), which the
        # two engines break differently run-to-run; sum of 2dp values is
        # tie-free at 2dp. The filter itself is safe (threshold margin big).
        F.round(F.sum("total"), 2).alias("nat_total"),
        F.count(F.lit(1)).alias("nat_n"),
    )
    nat = nat.select(F.col("c_nationkey").alias("nk"), "nat_avg", "nat_total", "nat_n")
    return (
        spend.join(F.broadcast(nat), spend.c_nationkey == nat.nk)
        .filter(F.col("total") > 1.5 * F.col("nat_avg"))
        .select("c_custkey", "total", "nat_total", "nat_n")
    )
