"""TPC-DS query-shape slice over the synthetic star schema.

The reference benches the full 103-query TPC-DS corpus
(sql/core/src/test/resources/tpcds/q*.sql, TPCDSQueryBenchmark.scala:36-45).
The synthetic schema has no date_dim/item/store/demographics tables, so each
port maps:

    store_sales → lineitem (+ orders for order-level attributes)
    item        → part   (brand=p_brand, category=p_type, product=p_name,
                          manufact_id=p_size)
    store       → supplier (store name = s_name, state = nation via s_nationkey)
    date_dim    → date functions over l_shipdate / o_orderdate (the synthetic
                  fact DENORMALIZES date attributes; the star-join signature is
                  preserved through the part/supplier/customer/nation dims)
    demographics/promotion → c_mktsegment / o_orderpriority categorical filters
    time_dim    → hour(events.ts)
    returns     → lineitem rows with l_returnflag = 'R'

What each port preserves is the original query's PLAN SIGNATURE — the join
graph, rollup/window/subquery patterns, and aggregation shapes that make it a
distinct optimizer test (JoinSelection SparkStrategies.scala:111, rollup
expansion, window exec, subquery decorrelation catalyst/optimizer/subquery.scala).

Determinism discipline for LIMIT queries: every ORDER BY carries the full
group key as tiebreakers (with explicit NULLS ordering where rollup introduces
NULL keys) so the driver's order-insensitive hash sees the same SET from both
engines. Float sums are rounded to 2dp BEFORE feeding a rank() so tie/not-tie
decisions agree across engines. AVERAGES and ratio thresholds are computed
over exact integers (×100 for 2-decimal prices, ×10000 for 4-decimal
products): an int64 sum plus one division are exactly-rounded IEEE ops, so
both engines produce bit-identical doubles — rounding an avg at 2dp instead
lands on half-cent boundaries where Spark's and DuckDB's round() disagree.
Integer-valued sums are CAST(... AS BIGINT) in shared templates so DuckDB
does not widen them to HUGEINT (which floats through pandas).

Scale notes (100 TB): part/supplier/nation/region are dimension tables —
broadcast-hinted. lineitem/orders joins shuffle on their keys and aggregate
partial+final; window stages partition on the grouped dimension keys (never a
global single-partition window). No driver collects, no cartesian products
except single-row scalar joins (broadcast by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q3: star join (fact × date × item), month slice, brand revenue by year
# --------------------------------------------------------------------------
@query(
    "tpcds_q3_brand_by_year",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS d_year,
           p_brand AS brand,
           round(sum(l_extendedprice), 2) AS sum_agg
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size = 25 AND month(l_shipdate) = 11
    GROUP BY 1, 2
    ORDER BY d_year, sum_agg DESC, brand
    LIMIT 100
    """,
)
def tpcds_q3_brand_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 shape (tpcds/q3.sql): date×fact×item star join with a
    manufacturer slice (p_size stands in for i_manufact_id) and a month
    predicate, brand revenue grouped by year, top-100."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    return (
        l.filter(F.month("l_shipdate") == 11)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("d_year"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_agg"))
        .orderBy(F.col("d_year"), F.col("sum_agg").desc(), F.col("brand"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# q7: star join with two categorical dimension filters, 4 avgs per item
# --------------------------------------------------------------------------
@query(
    "tpcds_q7_avg_by_item",
    oracle="""
    SELECT p_name AS i_item_id,
           avg(CAST(round(l_quantity) AS BIGINT))                    AS agg1,
           avg(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS agg2,
           avg(CAST(round(l_discount * 100) AS BIGINT)) / 100.0      AS agg3,
           avg(CAST(round(l_tax * 100) AS BIGINT)) / 100.0           AS agg4
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN part     ON l_partkey  = p_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND year(l_shipdate) = 1998
    GROUP BY p_name
    ORDER BY i_item_id
    LIMIT 100
    """,
)
def tpcds_q7_avg_by_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7 shape (tpcds/q7.sql): fact × demographics × promotion ×
    date × item — two categorical dim filters (mktsegment ≈ cd_*, order
    priority ≈ promotion channel) and four per-item averages. Averages use
    the exact-integer-cents discipline (see tpcds_q47_monthly_deviation):
    the source values are 0/2-decimal quantities, so the int64 sum and one
    division give the bit-identical double in both engines — no rounding
    step, no half-cent boundary."""
    l = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1998)
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_name").alias("i_item_id"))
        .agg(
            F.avg(F.round(F.col("l_quantity")).cast("long")).alias("agg1"),
            (F.avg(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0).alias("agg2"),
            (F.avg(F.round(F.col("l_discount") * 100).cast("long")) / 100.0).alias("agg3"),
            (F.avg(F.round(F.col("l_tax") * 100).cast("long")) / 100.0).alias("agg4"),
        )
        .orderBy("i_item_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19: 6-way star join with a cross-dimension inequality predicate
# --------------------------------------------------------------------------
@query(
    "tpcds_q19_brand_revenue",
    oracle="""
    SELECT p_brand AS brand,
           CAST(p_size AS BIGINT) AS i_manufact_id,
           round(sum(l_extendedprice), 2) AS ext_price
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey  = p_partkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE year(l_shipdate) = 1998 AND month(l_shipdate) = 11
      AND ns.n_name <> nc.n_name
    GROUP BY 1, 2
    ORDER BY ext_price DESC, brand, i_manufact_id
    LIMIT 100
    """,
)
def tpcds_q19_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 shape (tpcds/q19.sql): 6-way star join where the
    interesting predicate compares attributes of TWO different dimensions
    (customer-nation <> supplier-nation ≈ ca_zip <> s_zip) — the planner
    must keep both dim joins before it can filter."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1998) & (F.month("l_shipdate") == 11)
    )
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("ns_name")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("nc_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("ns_name") != F.col("nc_name"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_size").cast("long").alias("i_manufact_id"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "brand", "i_manufact_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q22: ROLLUP over the product hierarchy, avg quantity-on-hand
# --------------------------------------------------------------------------
@query(
    "tpcds_q22_rollup_qoh",
    oracle="""
    SELECT p_name AS i_product_name, p_brand AS i_brand, p_type AS i_category,
           avg(CAST(round(l_quantity) AS BIGINT)) AS qoh
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) BETWEEN 1996 AND 1997
    GROUP BY ROLLUP (p_name, p_brand, p_type)
    ORDER BY qoh,
             i_product_name NULLS LAST,
             i_brand NULLS LAST,
             i_category NULLS LAST
    LIMIT 100
    """,
)
def tpcds_q22_rollup_qoh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q22 shape (tpcds/q22.sql): inventory × date × item with a
    ROLLUP over the product hierarchy and average quantity-on-hand per
    level. NULLS LAST pinned explicitly on the tiebreakers: rollup levels
    whose finer keys are NULL would otherwise order differently between
    engines (Spark ASC default NULLS FIRST, DuckDB NULLS LAST). qoh is
    avg over exact integers (l_quantity is integer-valued), NOT an avg
    rounded at 2dp — rounding an avg at 2dp as the primary ORDER BY key
    is exactly the cross-engine flake q47's docstring documents."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").between(1996, 1997)
    )
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            F.col("p_name").alias("i_product_name"),
            F.col("p_brand").alias("i_brand"),
            F.col("p_type").alias("i_category"),
            "l_quantity",
        )
        .rollup("i_product_name", "i_brand", "i_category")
        .agg(F.avg(F.round("l_quantity").cast("bigint")).alias("qoh"))
        .orderBy(
            F.col("qoh"),
            F.col("i_product_name").asc_nulls_last(),
            F.col("i_brand").asc_nulls_last(),
            F.col("i_category").asc_nulls_last(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q34: derived ticket counts with a HAVING-range, re-joined to customer
# --------------------------------------------------------------------------
@query(
    "tpcds_q34_ticket_counts",
    oracle="""
    SELECT c_name, dn.cnt
    FROM (
      SELECT l_orderkey AS ticket, o_custkey AS cust, count(*) AS cnt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      GROUP BY 1, 2
    ) dn JOIN customer ON dn.cust = c_custkey
    WHERE dn.cnt BETWEEN 4 AND 7
    ORDER BY c_name, dn.cnt, dn.ticket
    LIMIT 100
    """,
)
def tpcds_q34_ticket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34 shape (tpcds/q34.sql): per-ticket line counts in a
    derived table, a BETWEEN filter on the count (the 15-20 basket-size
    band), then a join back to customer for display columns."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
    )
    c = _t(spark, sf_dir, "customer")
    dn = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("ticket"), F.col("o_custkey").alias("cust")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(4, 7))
    )
    return (
        dn.join(c, dn.cust == c.c_custkey)
        .select("c_name", "cnt", "ticket")
        .orderBy("c_name", "cnt", "ticket")
        .select("c_name", "cnt")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q42: category revenue for one (year, month) slice
# --------------------------------------------------------------------------
@query(
    "tpcds_q42_category_revenue",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS d_year,
           p_type AS i_category,
           round(sum(l_extendedprice), 2) AS total_sales
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 2000 AND month(l_shipdate) = 11
    GROUP BY 1, 2
    ORDER BY total_sales DESC, d_year, i_category
    LIMIT 100
    """,
)
def tpcds_q42_category_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42 shape (tpcds/q42.sql): the canonical one-slice star join
    — (year, month) date predicate, item category grouping, revenue order."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 2000) & (F.month("l_shipdate") == 11)
    )
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("d_year"),
            F.col("p_type").alias("i_category"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "d_year", "i_category")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q47: monthly sales vs yearly average, with prev/next month via window
# --------------------------------------------------------------------------
@query(
    "tpcds_q47_monthly_deviation",
    oracle="""
    WITH v1 AS (
      SELECT p_brand AS i_brand, s_name AS s_store_name,
             CAST(year(l_shipdate) AS BIGINT)  AS d_year,
             CAST(month(l_shipdate) AS BIGINT) AS d_moy,
             round(sum(l_extendedprice), 2) AS sum_sales,
             avg(CAST(round(sum(l_extendedprice) * 100) AS BIGINT))
               OVER (PARTITION BY p_brand, s_name, year(l_shipdate)) / 100.0
               AS avg_monthly_sales,
             lag(round(sum(l_extendedprice), 2))
               OVER (PARTITION BY p_brand, s_name
                     ORDER BY year(l_shipdate), month(l_shipdate)) AS psum,
             lead(round(sum(l_extendedprice), 2))
               OVER (PARTITION BY p_brand, s_name
                     ORDER BY year(l_shipdate), month(l_shipdate)) AS nsum
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY p_brand, s_name, year(l_shipdate), month(l_shipdate)
    )
    SELECT i_brand, s_store_name, d_year, d_moy, sum_sales,
           avg_monthly_sales, psum, nsum
    FROM v1
    WHERE d_year = 1998 AND avg_monthly_sales > 0
      AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY sum_sales - avg_monthly_sales, i_brand, s_store_name,
             d_year, d_moy
    LIMIT 100
    """,
)
def tpcds_q47_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape (tpcds/q47.sql): monthly (brand, store) sales with
    the year's average over a window, months deviating >10% from it, and
    the previous/next month's sales alongside. The reference phrases
    prev/next as self-joins on a rank() — lag/lead over the same ordering
    is the Spark-first equivalent (identical result, no extra shuffles:
    all three windows share one partitioning). Cross-engine float
    discipline: the window AVERAGE is computed over exact integer cents —
    an int64 sum plus one division are exactly-rounded IEEE ops, so both
    engines produce the bit-identical double; rounding the avg at 2dp
    instead lands on half-cent boundaries where the engines' round()
    disagree (observed 50025.035 → .03 vs .04)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("p_brand").alias("i_brand"),
            F.col("s_name").alias("s_store_name"),
            F.year("l_shipdate").cast("long").alias("d_year"),
            F.month("l_shipdate").cast("long").alias("d_moy"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_sales"))
    )
    w_year = Window.partitionBy("i_brand", "s_store_name", "d_year")
    w_seq = Window.partitionBy("i_brand", "s_store_name").orderBy("d_year", "d_moy")
    v1 = base.select(
        "i_brand",
        "s_store_name",
        "d_year",
        "d_moy",
        "sum_sales",
        (
            F.avg(F.round(F.col("sum_sales") * 100).cast("long")).over(w_year)
            / 100.0
        ).alias("avg_monthly_sales"),
        F.lag("sum_sales").over(w_seq).alias("psum"),
        F.lead("sum_sales").over(w_seq).alias("nsum"),
    )
    return (
        v1.filter(
            (F.col("d_year") == 1998)
            & (F.col("avg_monthly_sales") > 0)
            & (
                F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
                / F.col("avg_monthly_sales")
                > 0.1
            )
        )
        .select(
            "i_brand",
            "s_store_name",
            "d_year",
            "d_moy",
            "sum_sales",
            "avg_monthly_sales",
            "psum",
            "nsum",
        )
        .orderBy(
            F.col("sum_sales") - F.col("avg_monthly_sales"),
            "i_brand",
            "s_store_name",
            "d_year",
            "d_moy",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q51: cumulative sales per channel, full outer join, running-max compare
# --------------------------------------------------------------------------
@query(
    "tpcds_q51_cumulative_channels",
    oracle="""
    WITH web_v1 AS (
      SELECT l_partkey AS item_sk, l_shipdate AS d_date,
             sum(round(sum(l_extendedprice), 2))
               OVER (PARTITION BY l_partkey ORDER BY l_shipdate
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cume_sales
      FROM lineitem WHERE l_linestatus = 'O' AND year(l_shipdate) = 1998
      GROUP BY l_partkey, l_shipdate),
    store_v1 AS (
      SELECT l_partkey AS item_sk, l_shipdate AS d_date,
             sum(round(sum(l_extendedprice), 2))
               OVER (PARTITION BY l_partkey ORDER BY l_shipdate
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cume_sales
      FROM lineitem WHERE l_linestatus = 'F' AND year(l_shipdate) = 1998
      GROUP BY l_partkey, l_shipdate)
    SELECT * FROM (
      SELECT COALESCE(w.item_sk, s.item_sk) AS item_sk,
             COALESCE(w.d_date, s.d_date)   AS d_date,
             max(w.cume_sales) OVER (PARTITION BY COALESCE(w.item_sk, s.item_sk)
                 ORDER BY COALESCE(w.d_date, s.d_date)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_cumulative,
             max(s.cume_sales) OVER (PARTITION BY COALESCE(w.item_sk, s.item_sk)
                 ORDER BY COALESCE(w.d_date, s.d_date)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_cumulative
      FROM web_v1 w FULL OUTER JOIN store_v1 s
        ON w.item_sk = s.item_sk AND w.d_date = s.d_date) x
    WHERE web_cumulative > store_cumulative
    ORDER BY item_sk, d_date
    LIMIT 100
    """,
)
def tpcds_q51_cumulative_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape (tpcds/q51.sql): per-item cumulative daily sales in
    two channels (l_linestatus 'O'/'F' ≈ web/store), FULL OUTER joined on
    (item, day), running max over each channel's cumulative series, rows
    where the web side leads. ROWS frames are deterministic here because
    the grouped input has exactly one row per (item, day)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1998)

    def channel(status: str) -> DataFrame:
        daily = (
            l.filter(F.col("l_linestatus") == status)
            .groupBy(
                F.col("l_partkey").alias("item_sk"),
                F.col("l_shipdate").alias("d_date"),
            )
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("daily"))
        )
        w = (
            Window.partitionBy("item_sk")
            .orderBy("d_date")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return daily.select(
            "item_sk", "d_date", F.sum("daily").over(w).alias("cume_sales")
        )

    web = channel("O").select(
        F.col("item_sk").alias("w_item"),
        F.col("d_date").alias("w_date"),
        F.col("cume_sales").alias("w_cume"),
    )
    store = channel("F").select(
        F.col("item_sk").alias("s_item"),
        F.col("d_date").alias("s_date"),
        F.col("cume_sales").alias("s_cume"),
    )
    joined = web.join(
        store,
        (web.w_item == store.s_item) & (web.w_date == store.s_date),
        "full_outer",
    ).select(
        F.coalesce("w_item", "s_item").alias("item_sk"),
        F.coalesce("w_date", "s_date").alias("d_date"),
        F.col("w_cume"),
        F.col("s_cume"),
    )
    w_run = (
        Window.partitionBy("item_sk")
        .orderBy("d_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.select(
            "item_sk",
            "d_date",
            F.max("w_cume").over(w_run).alias("web_cumulative"),
            F.max("s_cume").over(w_run).alias("store_cumulative"),
        )
        .filter(F.col("web_cumulative") > F.col("store_cumulative"))
        .orderBy("item_sk", "d_date")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q67: ROLLUP over (category, brand, product, year) + rank within category
# --------------------------------------------------------------------------
@query(
    "tpcds_q67_rollup_rank",
    oracle="""
    SELECT * FROM (
      SELECT i_category, i_brand, i_product_name, d_year, sumsales,
             rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC) AS rk
      FROM (
        SELECT p_type AS i_category, p_brand AS i_brand,
               p_name AS i_product_name,
               CAST(year(l_shipdate) AS BIGINT) AS d_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sumsales
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) BETWEEN 1997 AND 1998
        GROUP BY ROLLUP (p_type, p_brand, p_name, year(l_shipdate))
      ) dw1) dw2
    WHERE rk <= 10
    ORDER BY i_category NULLS LAST, i_brand NULLS LAST,
             i_product_name NULLS LAST, d_year NULLS LAST, sumsales, rk
    LIMIT 100
    """,
)
def tpcds_q67_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape (tpcds/q67.sql): a product-hierarchy ROLLUP feeding
    a rank() partitioned by the coarsest level, keeping each category's
    top rows. The rollup's NULL category rows form their own rank
    partition, exactly as in the original. sumsales is rounded before the
    rank so tie decisions agree across engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").between(1997, 1998)
    )
    p = _t(spark, sf_dir, "part")
    dw1 = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            F.col("p_type").alias("i_category"),
            F.col("p_brand").alias("i_brand"),
            F.col("p_name").alias("i_product_name"),
            F.year("l_shipdate").cast("long").alias("d_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
        .rollup("i_category", "i_brand", "i_product_name", "d_year")
        .agg(F.round(F.sum("vol"), 2).alias("sumsales"))
    )
    w = Window.partitionBy("i_category").orderBy(F.col("sumsales").desc())
    return (
        dw1.select("*", F.rank().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .orderBy(
            F.col("i_category").asc_nulls_last(),
            F.col("i_brand").asc_nulls_last(),
            F.col("i_product_name").asc_nulls_last(),
            F.col("d_year").asc_nulls_last(),
            "sumsales",
            "rk",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q89: monthly sales deviating >10% from the group's average month
# --------------------------------------------------------------------------
@query(
    "tpcds_q89_monthly_outliers",
    oracle="""
    SELECT * FROM (
      SELECT p_type AS i_category, p_brand AS i_brand, s_name AS s_store_name,
             CAST(month(l_shipdate) AS BIGINT) AS d_moy,
             round(sum(l_extendedprice), 2) AS sum_sales,
             avg(CAST(round(sum(l_extendedprice) * 100) AS BIGINT))
               OVER (PARTITION BY p_type, p_brand, s_name) / 100.0
               AS avg_monthly_sales
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE year(l_shipdate) = 1999
        AND p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
      GROUP BY p_type, p_brand, s_name, month(l_shipdate)
    ) tmp1
    WHERE avg_monthly_sales <> 0
      AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY sum_sales - avg_monthly_sales, i_category, i_brand,
             s_store_name, d_moy
    LIMIT 100
    """,
)
def tpcds_q89_monthly_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89 shape (tpcds/q89.sql): per-(category, brand, store) month
    sales compared against that group's average month via a window; keep
    months deviating more than 10%. The window average uses the
    exact-integer-cents discipline (see tpcds_q47_monthly_deviation)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1999)
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")
    )
    s = _t(spark, sf_dir, "supplier")
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("p_type").alias("i_category"),
            F.col("p_brand").alias("i_brand"),
            F.col("s_name").alias("s_store_name"),
            F.month("l_shipdate").cast("long").alias("d_moy"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_sales"))
    )
    w = Window.partitionBy("i_category", "i_brand", "s_store_name")
    tmp1 = base.select(
        "i_category",
        "i_brand",
        "s_store_name",
        "d_moy",
        "sum_sales",
        (
            F.avg(F.round(F.col("sum_sales") * 100).cast("long")).over(w) / 100.0
        ).alias("avg_monthly_sales"),
    )
    return (
        tmp1.filter(
            (F.col("avg_monthly_sales") != 0)
            & (
                F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
                / F.col("avg_monthly_sales")
                > 0.1
            )
        )
        .orderBy(
            F.col("sum_sales") - F.col("avg_monthly_sales"),
            "i_category",
            "i_brand",
            "s_store_name",
            "d_moy",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q90: ratio of two scalar counts (am vs pm activity)
# --------------------------------------------------------------------------
@query(
    "tpcds_q90_am_pm_ratio",
    oracle="""
    SELECT round(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 4) AS am_pm_ratio
    FROM (SELECT count(*) AS amc FROM events
          WHERE hour(ts) BETWEEN 8 AND 9 AND event_type = 'click') a,
         (SELECT count(*) AS pmc FROM events
          WHERE hour(ts) BETWEEN 19 AND 20 AND event_type = 'click') p
    """,
)
def tpcds_q90_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 shape (tpcds/q90.sql): two independently-filtered scalar
    counts (morning vs evening hour windows over time_dim ≈ hour(ts))
    cross-joined into one ratio row. Both sides are single-row frames, so
    the cross join is a broadcast scalar join, not a cartesian risk."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    amc = e.filter(F.hour("ts").between(8, 9)).agg(
        F.count(F.lit(1)).alias("amc")
    )
    pmc = e.filter(F.hour("ts").between(19, 20)).agg(
        F.count(F.lit(1)).alias("pmc")
    )
    return amc.crossJoin(F.broadcast(pmc)).select(
        F.round(
            F.col("amc").cast("double") / F.col("pmc").cast("double"), 4
        ).alias("am_pm_ratio")
    )


# --------------------------------------------------------------------------
# q98: item revenue with ratio-to-class via a window over the aggregate
# --------------------------------------------------------------------------
@query(
    "tpcds_q98_revenue_ratio",
    oracle="""
    SELECT p_name AS i_item_desc, p_type AS i_category, p_brand AS i_class,
           p_retailprice AS i_current_price,
           round(sum(l_extendedprice), 2) AS itemrevenue,
           round(round(sum(l_extendedprice), 2) * 100 /
                 sum(round(sum(l_extendedprice), 2)) OVER (PARTITION BY p_brand),
                 4) AS revenueratio
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type IN ('ECONOMY', 'MEDIUM', 'SMALL')
      AND l_shipdate >= TIMESTAMP '1998-02-22'
      AND l_shipdate <  TIMESTAMP '1998-03-25'
    GROUP BY p_name, p_type, p_brand, p_retailprice
    """,
)
def tpcds_q98_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98 shape (tpcds/q98.sql): per-item revenue over a 30-day
    date window with each item's share of its class computed as a window
    sum OVER the grouped aggregate (sum of sums) — the aggregate-then-
    window composition the original exists to test."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-02-22").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-03-25").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "MEDIUM", "SMALL")
    )
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_name").alias("i_item_desc"),
            F.col("p_type").alias("i_category"),
            F.col("p_brand").alias("i_class"),
            F.col("p_retailprice").alias("i_current_price"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("itemrevenue"))
    )
    w = Window.partitionBy("i_class")
    return agg.select(
        "i_item_desc",
        "i_category",
        "i_class",
        "i_current_price",
        "itemrevenue",
        F.round(
            F.col("itemrevenue") * 100 / F.sum("itemrevenue").over(w), 4
        ).alias("revenueratio"),
    )


# --------------------------------------------------------------------------
# q1: CTE + correlated aggregate subquery (above 1.2× the store average)
# --------------------------------------------------------------------------
@query(
    "tpcds_q1_above_avg_returns",
    oracle="""
    WITH customer_total_return AS (
      SELECT o_custkey AS ctr_customer_sk, l_suppkey AS ctr_store_sk,
             round(sum(l_extendedprice), 2) AS ctr_total_return
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 2000
      GROUP BY 1, 2)
    SELECT c_name
    FROM customer_total_return ctr1
    JOIN customer ON ctr1.ctr_customer_sk = c_custkey
    WHERE ctr1.ctr_total_return > (
      SELECT avg(ctr_total_return) * 1.2
      FROM customer_total_return ctr2
      WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
    ORDER BY c_name
    LIMIT 100
    """,
)
def tpcds_q1_above_avg_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 shape (tpcds/q1.sql): a returns CTE (l_returnflag='R'
    lineitems ≈ store_returns) referenced twice — once as the driving
    relation, once inside a correlated aggregate subquery comparing each
    customer's returns at a store against 1.2× that store's average.
    Expressed as the decorrelated form Catalyst itself produces
    (catalyst/optimizer/subquery.scala: RewriteCorrelatedScalarSubquery →
    aggregate + join on the correlation key); the oracle keeps the
    correlated phrasing to pin semantic equivalence."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.year("l_shipdate") == 2000)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    ctr = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("ctr_customer_sk"),
            F.col("l_suppkey").alias("ctr_store_sk"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("ctr_total_return"))
    )
    per_store = ctr.groupBy("ctr_store_sk").agg(
        (F.avg("ctr_total_return") * 1.2).alias("store_avg_12")
    )
    return (
        ctr.join(F.broadcast(per_store), "ctr_store_sk")
        .filter(F.col("ctr_total_return") > F.col("store_avg_12"))
        .join(c, F.col("ctr_customer_sk") == c.c_custkey)
        .select("c_name")
        .orderBy("c_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q88: many disjoint scalar counts cross-joined into one wide row
# --------------------------------------------------------------------------
@query(
    "tpcds_q88_hour_buckets",
    oracle="""
    SELECT * FROM
      (SELECT count(*) AS h8 FROM events
       WHERE hour(ts) = 8  AND event_type IN ('click', 'view')) s1,
      (SELECT count(*) AS h9 FROM events
       WHERE hour(ts) = 9  AND event_type IN ('click', 'view')) s2,
      (SELECT count(*) AS h10 FROM events
       WHERE hour(ts) = 10 AND event_type IN ('click', 'view')) s3,
      (SELECT count(*) AS h11 FROM events
       WHERE hour(ts) = 11 AND event_type IN ('click', 'view')) s4
    """,
)
def tpcds_q88_hour_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape (tpcds/q88.sql): N independently-filtered scalar
    counts (store traffic per half-hour ≈ events per hour) combined by
    cross-joining single-row aggregates into one wide row. Each factor is
    one row, so every join is a broadcast scalar join."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    out = None
    for h in (8, 9, 10, 11):
        piece = e.filter(F.hour("ts") == h).agg(
            F.count(F.lit(1)).alias(f"h{h}")
        )
        out = piece if out is None else out.crossJoin(F.broadcast(piece))
    return out


# --------------------------------------------------------------------------
# q16: count-distinct with EXISTS / NOT EXISTS decorrelated to semi/anti
# --------------------------------------------------------------------------
@query(
    "tpcds_q16_multi_supplier_orders",
    oracle="""
    SELECT count(DISTINCT l1.l_orderkey) AS order_count,
           round(sum(l1.l_extendedprice), 2) AS total_shipping_cost
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1998-02-01'
      AND o_orderdate < TIMESTAMP '1998-04-02'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l1.l_orderkey = l2.l_orderkey
                    AND l1.l_suppkey <> l2.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l1.l_orderkey = l3.l_orderkey
                        AND l3.l_returnflag = 'R')
    """,
)
def tpcds_q16_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16 shape (tpcds/q16.sql): shipping stats over a 60-day
    order-date window for orders served by MULTIPLE suppliers (correlated
    EXISTS with an inequality on a second column) and never returned
    (NOT EXISTS against the returns relation) — planned as a left-semi and
    a left-anti join, plus a distinct aggregate on the order key."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-02-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-02").cast("timestamp"))
    )
    l1 = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    l2 = l.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    returned = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ret_orderkey"))
        .distinct()
    )
    multi = l1.join(
        l2,
        (l1.l_orderkey == l2.r_orderkey) & (l1.l_suppkey != l2.r_suppkey),
        "left_semi",
    )
    clean = multi.join(
        returned, multi.l_orderkey == returned.ret_orderkey, "left_anti"
    )
    return clean.agg(
        F.countDistinct("l_orderkey").alias("order_count"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_shipping_cost"),
    )


# ==========================================================================
# Batch 2 (r5): CTE-heavy shapes — week-over-week pivots, year-over-year
# self-joins, grouping()-partitioned ranks, channel INTERSECTs, best/worst
# rank joins. SQL-first (spark.sql over temp views): these queries ARE the
# reference's SQL-surface tests, and the CTE reuse (one CTE referenced 4-6
# times) is the optimizer behavior under test.
# ==========================================================================

_TPCDS_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in _TPCDS_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


_DAYS = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]


def _q2_pivot_cols(dow_expr: str) -> str:
    # the 7-way day-name CASE pivot (q2/q59 signature); dow 0=Sunday
    return ",\n".join(
        f"round(sum(CASE WHEN {dow_expr} = {i} THEN l_extendedprice END), 2)"
        f" AS {d}_sales"
        for i, d in enumerate(_DAYS)
    )


_Q2_RATIOS = ",\n".join(
    f"round(a.{d}_sales / b.{d}_sales, 4) AS {d}_ratio" for d in _DAYS
)

# Spark dayofweek(): 1=Sunday..7; DuckDB dayofweek(): 0=Sunday..6
_Q2_SPARK = f"""
    WITH wk AS (
      SELECT year(l_shipdate) AS y, weekofyear(l_shipdate) AS w,
             {_q2_pivot_cols('dayofweek(l_shipdate) - 1')}
      FROM lineitem
      GROUP BY year(l_shipdate), weekofyear(l_shipdate)
    )
    SELECT a.w AS week_seq, {_Q2_RATIOS}
    FROM wk a JOIN wk b ON a.w = b.w AND a.y = 1997 AND b.y = 1998
    ORDER BY week_seq
"""

_Q2_DUCK = f"""
    WITH wk AS (
      SELECT year(l_shipdate) AS y, weekofyear(l_shipdate) AS w,
             {_q2_pivot_cols('dayofweek(l_shipdate)')}
      FROM lineitem
      GROUP BY year(l_shipdate), weekofyear(l_shipdate)
    )
    SELECT CAST(a.w AS INT) AS week_seq, {_Q2_RATIOS}
    FROM wk a JOIN wk b ON a.w = b.w AND a.y = 1997 AND b.y = 1998
    ORDER BY week_seq
"""


@query("tpcds_q2_weekday_ratio", oracle=_Q2_DUCK)
def tpcds_q2_weekday_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2/q59 shape (tpcds/q2.sql, q59.sql): the 7-way day-of-week
    CASE pivot per week, self-joined year vs year+1 on the week sequence,
    outputting the weekday sales ratios. Day-sums are rounded at 2dp
    (exact, see module float discipline) so the ratios are identical
    IEEE divisions in both engines."""
    _views(spark, sf_dir)
    return spark.sql(_Q2_SPARK)


_Q11_TMPL = """
    WITH year_total AS (
      SELECT o_custkey AS customer_id, c_name,
             year(l_shipdate) AS dyear, l_linestatus AS sale_type,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS year_total
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      GROUP BY o_custkey, c_name, year(l_shipdate), l_linestatus
    )
    SELECT t_s_secyear.c_name AS customer_name
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.sale_type = 'F' AND t_w_firstyear.sale_type = 'O'
      AND t_s_secyear.sale_type = 'F'  AND t_w_secyear.sale_type = 'O'
      AND t_s_firstyear.dyear = 1997 AND t_s_secyear.dyear = 1998
      AND t_w_firstyear.dyear = 1997 AND t_w_secyear.dyear = 1998
      AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
      AND CASE WHEN t_w_firstyear.year_total > 0
               THEN t_w_secyear.year_total / t_w_firstyear.year_total
               ELSE NULL END
        > CASE WHEN t_s_firstyear.year_total > 0
               THEN t_s_secyear.year_total / t_s_firstyear.year_total
               ELSE NULL END
    ORDER BY customer_name
    LIMIT 100
"""


@query("tpcds_q11_yoy_growth", oracle=_Q11_TMPL)
def tpcds_q11_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11/q74 shape (tpcds/q11.sql): one per-customer-per-year CTE
    referenced FOUR times (store/web × first/second year — channels =
    l_linestatus), keeping customers whose web growth outpaced store
    growth. The optimizer test is CTE reuse + the 4-way self-join on the
    customer key."""
    _views(spark, sf_dir)
    return spark.sql(_Q11_TMPL)


_Q31_TMPL = """
    WITH ss AS (
      SELECT n_name AS county, quarter(l_shipdate) AS qoy,
             round(sum(l_extendedprice), 2) AS store_sales
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE year(l_shipdate) = 1998 AND l_linestatus = 'F'
      GROUP BY n_name, quarter(l_shipdate)),
    ws AS (
      SELECT n_name AS county, quarter(l_shipdate) AS qoy,
             round(sum(l_extendedprice), 2) AS web_sales
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE year(l_shipdate) = 1998 AND l_linestatus = 'O'
      GROUP BY n_name, quarter(l_shipdate))
    SELECT ss1.county,
           round(ws2.web_sales / ws1.web_sales, 4)     AS web_q1_q2_increase,
           round(ss2.store_sales / ss1.store_sales, 4) AS store_q1_q2_increase,
           round(ws3.web_sales / ws2.web_sales, 4)     AS web_q2_q3_increase,
           round(ss3.store_sales / ss2.store_sales, 4) AS store_q2_q3_increase
    FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
    WHERE ss1.qoy = 1 AND ss2.qoy = 2 AND ss3.qoy = 3
      AND ss1.county = ss2.county AND ss2.county = ss3.county
      AND ws1.qoy = 1 AND ws2.qoy = 2 AND ws3.qoy = 3
      AND ss1.county = ws1.county AND ws1.county = ws2.county
      AND ws1.county = ws3.county
      AND CASE WHEN ws1.web_sales > 0
               THEN ws2.web_sales / ws1.web_sales ELSE NULL END
        > CASE WHEN ss1.store_sales > 0
               THEN ss2.store_sales / ss1.store_sales ELSE NULL END
      AND CASE WHEN ws2.web_sales > 0
               THEN ws3.web_sales / ws2.web_sales ELSE NULL END
        > CASE WHEN ss2.store_sales > 0
               THEN ss3.store_sales / ss2.store_sales ELSE NULL END
    ORDER BY ss1.county
"""


@query("tpcds_q31_quarter_growth", oracle=_Q31_TMPL)
def tpcds_q31_quarter_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape (tpcds/q31.sql): two per-(county, quarter) CTEs
    each referenced THREE times (quarters 1-3), a 6-way self-join on the
    county (nation), keeping counties where web growth beat store growth
    in both quarter transitions."""
    _views(spark, sf_dir)
    return spark.sql(_Q31_TMPL)


_Q36_TMPL = """
    SELECT
      round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6)
        AS gross_margin,
      p_type  AS i_category,
      p_brand AS i_class,
      CAST(grouping(p_type) + grouping(p_brand) AS BIGINT) AS lochierarchy,
      rank() OVER (
        PARTITION BY grouping(p_type) + grouping(p_brand),
                     CASE WHEN grouping(p_brand) = 0 THEN p_type END
        ORDER BY sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
                 / sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
      ) AS rank_within_parent
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1998
    GROUP BY ROLLUP (p_type, p_brand)
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN i_category END NULLS LAST,
             rank_within_parent,
             i_category NULLS LAST, i_class NULLS LAST
    LIMIT 100
"""


@query("tpcds_q36_grouping_rank", oracle=_Q36_TMPL)
def tpcds_q36_grouping_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape (tpcds/q36.sql): gross margin over a ROLLUP with
    grouping() DIRECTLY in the rank's PARTITION BY — each hierarchy level
    ranks within its parent. The rank's ORDER BY uses exact integer-scaled
    sums (×10000: extendedprice×discount is a 4-decimal value) so the
    margin ordering is the same int-ratio in both engines; the displayed
    margin rounds the float form at 6dp."""
    _views(spark, sf_dir)
    return spark.sql(_Q36_TMPL)


_Q38_TMPL = """
    SELECT count(*) AS hot_cust_count FROM (
      SELECT DISTINCT c_name, year(l_shipdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'A'
      INTERSECT
      SELECT DISTINCT c_name, year(l_shipdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'N'
      INTERSECT
      SELECT DISTINCT c_name, year(l_shipdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
    ) hot_cust
"""


@query("tpcds_q38_triple_intersect", oracle=_Q38_TMPL)
def tpcds_q38_triple_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38/q87 shape (tpcds/q38.sql): INTERSECT of three channels'
    distinct customer-activity sets (channels = return-flag classes,
    activity = customer-year), counted — the set-operation chain the
    planner turns into successive left-semi joins over aggregated
    distinct sets."""
    _views(spark, sf_dir)
    return spark.sql(_Q38_TMPL)


_Q44_TMPL = """
    WITH profits AS (
      SELECT l_partkey AS item_sk,
             avg(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS rank_col
      FROM lineitem WHERE l_suppkey = 4
      GROUP BY l_partkey
      HAVING avg(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT))
           > 0.9 * (SELECT avg(CAST(round(l_extendedprice * (1 - l_discount)
                                          * 10000) AS BIGINT))
                    FROM lineitem WHERE l_suppkey = 4)
    ),
    asceding  AS (SELECT item_sk, rank() OVER (ORDER BY rank_col ASC,
                                               item_sk ASC)  AS rnk
                  FROM profits),
    descending AS (SELECT item_sk, rank() OVER (ORDER BY rank_col DESC,
                                                item_sk DESC) AS rnk
                   FROM profits)
    SELECT CAST(a.rnk AS BIGINT) AS rnk,
           i1.p_name AS best_performing,
           i2.p_name AS worst_performing
    FROM asceding a JOIN descending d ON a.rnk = d.rnk
    JOIN part i1 ON i1.p_partkey = a.item_sk
    JOIN part i2 ON i2.p_partkey = d.item_sk
    WHERE a.rnk < 11
    ORDER BY a.rnk
"""


@query("tpcds_q44_best_worst", oracle=_Q44_TMPL)
def tpcds_q44_best_worst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44 shape (tpcds/q44.sql): per-item average profit for one
    store, HAVING above 0.9× the store's overall average (scalar
    subquery), ranked ascending AND descending, the two top-10 rank lists
    joined on rank position with the item dimension joined twice for
    best/worst names. Averages use exact ×10000 integer scaling (profit
    is a 4-decimal value) so rank order is engine-identical; item_sk
    tiebreakers make equal-profit ranks deterministic."""
    _views(spark, sf_dir)
    return spark.sql(_Q44_TMPL)


