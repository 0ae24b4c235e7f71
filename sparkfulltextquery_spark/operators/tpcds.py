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
           round(avg(l_quantity), 2) AS qoh
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
    engines (Spark ASC default NULLS FIRST, DuckDB NULLS LAST)."""
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
        .agg(F.round(F.avg("l_quantity"), 2).alias("qoh"))
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


# ==========================================================================
# Batch 3 (r5): subquery-decorrelation signatures — disjunctive EXISTS,
# IN-OR-subquery (existence join), null-rejecting filter over a LEFT JOIN
# (EliminateOuterJoin), and a twice-referenced CTE inside nested INs.
# ==========================================================================

_Q10_TMPL = """
    SELECT c_mktsegment, count(*) AS cnt
    FROM customer c JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_19', 'NATION_11', 'NATION_10', 'NATION_20', 'NATION_17')
      AND EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE o_custkey = c.c_custkey AND l_returnflag = 'N'
                    AND year(l_shipdate) = 1998)
      AND (EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE o_custkey = c.c_custkey AND l_returnflag = 'A'
                     AND year(l_shipdate) = 1998)
           OR EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c.c_custkey AND l_returnflag = 'R'
                        AND year(l_shipdate) = 1998))
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("tpcds_q10_disjunctive_exists", oracle=_Q10_TMPL)
def tpcds_q10_disjunctive_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10/q35 shape (tpcds/q10.sql): a conjunctive EXISTS (store
    activity) AND a DISJUNCTION of two EXISTS (web OR catalog activity —
    channels = return-flag classes). The OR-of-EXISTS cannot become plain
    semi joins; Spark plans ExistenceJoin marker columns
    (catalyst/optimizer/subquery.scala RewritePredicateSubquery)."""
    _views(spark, sf_dir)
    return spark.sql(_Q10_TMPL)


_Q45_TMPL = """
    SELECT c_mktsegment, count(*) AS cnt
    FROM customer
    WHERE c_nationkey IN (1, 3, 5)
       OR c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 400000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("tpcds_q45_in_or_subquery", oracle=_Q45_TMPL)
def tpcds_q45_in_or_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q45 shape (tpcds/q45.sql): a local IN-list predicate ORed
    with an IN-subquery — the disjunction forces an existence join (the
    subquery becomes a boolean marker column, not a semi join), the
    §2.3 existence-join row exercised from the SQL surface."""
    _views(spark, sf_dir)
    return spark.sql(_Q45_TMPL)


_Q93_TMPL = """
    SELECT cust AS ss_customer_sk, round(sum(act_sales), 2) AS sumsales
    FROM (
      SELECT o_custkey AS cust,
             CASE WHEN r.ret_qty IS NOT NULL
                  THEN (s.l_quantity - r.ret_qty) * s.l_extendedprice
                  ELSE s.l_quantity * s.l_extendedprice END AS act_sales,
             r.reason
      FROM lineitem s
      JOIN orders ON s.l_orderkey = o_orderkey
      LEFT OUTER JOIN (
        SELECT l_orderkey, l_partkey, sum(l_quantity) AS ret_qty,
               min(l_linenumber) % 5 AS reason
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_orderkey, l_partkey
      ) r ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
      WHERE s.l_returnflag <> 'R'
    ) t
    WHERE reason = 2
    GROUP BY cust
    ORDER BY sumsales, cust
    LIMIT 100
"""


@query("tpcds_q93_returns_arith", oracle=_Q93_TMPL)
def tpcds_q93_returns_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 shape (tpcds/q93.sql): sales LEFT JOIN the returns
    relation with net-sales CASE arithmetic over the nullable return
    quantity — then an outer WHERE on a right-side column (the reason
    filter), which is null-rejecting and lets the optimizer collapse the
    LEFT join to inner (EliminateOuterJoin) exactly as in the original,
    where the reason predicate makes the CASE's ELSE branch dead."""
    _views(spark, sf_dir)
    return spark.sql(_Q93_TMPL)


_Q95_TMPL = """
    WITH ws_wh AS (
      SELECT DISTINCT l1.l_orderkey
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
    )
    SELECT count(DISTINCT s.l_orderkey)            AS order_count,
           round(sum(s.l_extendedprice), 2)        AS total_shipping_cost,
           round(sum(s.l_extendedprice * s.l_tax), 4) AS total_net_profit
    FROM lineitem s JOIN orders ON s.l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1998-02-01'
      AND o_orderdate <  TIMESTAMP '1998-04-02'
      AND s.l_orderkey IN (SELECT l_orderkey FROM ws_wh)
      AND s.l_orderkey IN (SELECT l_orderkey FROM lineitem
                           WHERE l_returnflag = 'R'
                             AND l_orderkey IN (SELECT l_orderkey FROM ws_wh))
    """


@query("tpcds_q95_two_level_in", oracle=_Q95_TMPL)
def tpcds_q95_two_level_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape (tpcds/q95.sql): a self-join CTE (orders served
    from 2+ warehouses ≈ suppliers) referenced from TWO IN-subqueries —
    the second nested inside a returns filter — plus a 60-day ship window
    and a distinct order count. Net profit sums a 4-decimal per-row
    product, so it rounds at 4dp (a 2dp round of a 4dp sum lands on exact
    half-cent boundaries)."""
    _views(spark, sf_dir)
    return spark.sql(_Q95_TMPL)


# ==========================================================================
# Batch 4 (r5): reporting shapes — date-lag CASE buckets, three-channel
# equal-share with nested scalar subqueries, anti-join-via-null-filter
# channel ratios, before/after pivot with a ratio band.
# ==========================================================================

_Q62_TMPL_SPARK = """
    SELECT substr(s_name, 1, 15) AS warehouse, o_orderpriority AS sm_type,
           CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) <= 30
                    THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 30
                     AND datediff(l_shipdate, o_orderdate) <= 60
                    THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 60
                     AND datediff(l_shipdate, o_orderdate) <= 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS d90_plus
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey
    WHERE year(l_shipdate) = 1998
    GROUP BY substr(s_name, 1, 15), o_orderpriority
    ORDER BY warehouse, sm_type
    LIMIT 100
"""

_Q62_TMPL_DUCK = _Q62_TMPL_SPARK.replace(
    "datediff(l_shipdate, o_orderdate)", "date_diff('day', o_orderdate, l_shipdate)"
)


@query("tpcds_q62_ship_lag_buckets", oracle=_Q62_TMPL_DUCK)
def tpcds_q62_ship_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q62/q99 shape (tpcds/q62.sql): order-to-ship day lags bucketed
    by CASE bands and counted per (warehouse ≈ supplier, ship mode ≈ order
    priority) — the classic shipping-SLA report."""
    _views(spark, sf_dir)
    return spark.sql(_Q62_TMPL_SPARK)


def _q58_channel_cte(flag: str, alias: str) -> str:
    return f"""
    {alias} AS (
      SELECT p_brand AS item_id, round(sum(l_extendedprice), 2) AS {alias}_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = '{flag}' AND year(l_shipdate) = 1998
        AND month(l_shipdate) IN
            (SELECT month(TIMESTAMP '1998-03-11'))
      GROUP BY p_brand)"""


_Q58_TMPL = f"""
    WITH {_q58_channel_cte('A', 'ss_items')},
    {_q58_channel_cte('N', 'cs_items')},
    {_q58_channel_cte('R', 'ws_items')}
    SELECT ss_items.item_id,
           ss_items_rev, cs_items_rev, ws_items_rev,
           round((ss_items_rev + cs_items_rev + ws_items_rev) / 3, 4) AS average
    FROM ss_items
    JOIN cs_items ON ss_items.item_id = cs_items.item_id
    JOIN ws_items ON ss_items.item_id = ws_items.item_id
    WHERE ss_items_rev BETWEEN 0.5 * cs_items_rev AND 1.5 * cs_items_rev
      AND ss_items_rev BETWEEN 0.5 * ws_items_rev AND 1.5 * ws_items_rev
    ORDER BY ss_items.item_id
    LIMIT 100
"""


@query("tpcds_q58_equal_share_channels", oracle=_Q58_TMPL)
def tpcds_q58_equal_share_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 shape (tpcds/q58.sql): three per-channel revenue CTEs
    (channels = return-flag classes) each filtered to one period via a
    scalar date subquery, three-way joined on the item, keeping items
    whose channel revenues are within a band of each other."""
    _views(spark, sf_dir)
    return spark.sql(_Q58_TMPL)


_Q78_TMPL = """
    WITH rets AS (
      SELECT l_orderkey AS r_ok, l_partkey AS r_pk
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_orderkey, l_partkey),
    ss AS (
      SELECT year(l_shipdate) AS sold_year, l_partkey AS item_sk,
             o_custkey AS customer_sk,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS ss_qty,
             round(sum(l_extendedprice), 2) AS ss_sp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN rets ON l_orderkey = r_ok AND l_partkey = r_pk
      WHERE r_ok IS NULL AND l_linestatus = 'F'
      GROUP BY year(l_shipdate), l_partkey, o_custkey),
    ws AS (
      SELECT year(l_shipdate) AS sold_year, l_partkey AS item_sk,
             o_custkey AS customer_sk,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS ws_qty,
             round(sum(l_extendedprice), 2) AS ws_sp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN rets ON l_orderkey = r_ok AND l_partkey = r_pk
      WHERE r_ok IS NULL AND l_linestatus = 'O'
      GROUP BY year(l_shipdate), l_partkey, o_custkey)
    SELECT ss.sold_year, ss.item_sk, ss.customer_sk,
           round(ss_qty / (ws_qty + 0.0), 4) AS store_web_qty_ratio,
           ss_qty, ss_sp, ws_qty, ws_sp
    FROM ss JOIN ws ON ss.sold_year = ws.sold_year
                   AND ss.item_sk = ws.item_sk
                   AND ss.customer_sk = ws.customer_sk
    WHERE ss.sold_year = 1998
    ORDER BY store_web_qty_ratio DESC, ss.item_sk, ss.customer_sk
    LIMIT 100
"""


@query("tpcds_q78_nonreturned_ratio", oracle=_Q78_TMPL)
def tpcds_q78_nonreturned_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape (tpcds/q78.sql): per-channel (year, item, customer)
    sums over NON-returned sales — the anti-join phrased as LEFT JOIN
    returns + IS NULL filter, exactly as the original — then the two
    channels joined and ordered by their quantity ratio. Quantities are
    exact int64, so the ratio is the identical IEEE division in both
    engines."""
    _views(spark, sf_dir)
    return spark.sql(_Q78_TMPL)


_Q21_TMPL = """
    SELECT * FROM (
      SELECT s_name AS warehouse_name, p_name AS item_id,
             CAST(sum(CASE WHEN l_shipdate <  TIMESTAMP '1998-06-01'
                      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS inv_before,
             CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
                      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS inv_after
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
      WHERE p_retailprice BETWEEN 500 AND 1200
        AND l_shipdate >= TIMESTAMP '1998-05-02'
        AND l_shipdate <  TIMESTAMP '1998-07-01'
      GROUP BY s_name, p_name) x
    WHERE CASE WHEN inv_before > 0 THEN inv_after / (inv_before + 0.0)
               ELSE NULL END BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
    ORDER BY warehouse_name, item_id
    LIMIT 100
"""


@query("tpcds_q21_before_after", oracle=_Q21_TMPL)
def tpcds_q21_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 shape (tpcds/q21.sql): inventory quantity summed into
    before/after CASE pivots around an anchor date (±30-day window), a
    price-band item filter, and a ratio-band HAVING on the pivot — int64
    quantities make the ratio engine-identical."""
    _views(spark, sf_dir)
    return spark.sql(_Q21_TMPL)


# ==========================================================================
# Batch 5 (r5): CTE-chain threshold (q23), week-matched inequality self-join
# with date offset (q72), follow-on revenue histogram (q54).
# ==========================================================================

_Q23_TMPL = """
    WITH lw AS (
      SELECT l.*, o_custkey FROM lineitem l JOIN orders ON l_orderkey = o_orderkey),
    frequent_items AS (
      SELECT p_brand, month(l_shipdate) AS m
      FROM lw JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1998
      GROUP BY p_brand, month(l_shipdate)
      HAVING count(*) > 3),
    max_sales AS (
      SELECT max(csales) AS cmax FROM (
        SELECT o_custkey, sum(CAST(round(l_quantity) AS BIGINT)
                              * CAST(round(l_extendedprice * 100) AS BIGINT))
               AS csales
        FROM lw GROUP BY o_custkey) x),
    best_customer AS (
      SELECT o_custkey
      FROM (SELECT o_custkey, sum(CAST(round(l_quantity) AS BIGINT)
                                  * CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS ssales
            FROM lw GROUP BY o_custkey) y, max_sales
      WHERE ssales > 0.5 * cmax)
    SELECT round(sum(sales) / 100.0, 2) AS total_sales
    FROM (
      SELECT CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lw JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1998 AND month(l_shipdate) = 2
        AND l_linestatus = 'F'
        AND p_brand IN (SELECT p_brand FROM frequent_items WHERE m = 2)
        AND o_custkey IN (SELECT o_custkey FROM best_customer)
      UNION ALL
      SELECT CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lw JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1998 AND month(l_shipdate) = 2
        AND l_linestatus = 'O'
        AND p_brand IN (SELECT p_brand FROM frequent_items WHERE m = 2)
        AND o_custkey IN (SELECT o_custkey FROM best_customer)
    ) u
"""


@query("tpcds_q23_frequent_best", oracle=_Q23_TMPL)
def tpcds_q23_frequent_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 shape (tpcds/q23a.sql): a CTE chain where one CTE's
    HAVING threshold is a scalar read from ANOTHER CTE (best customers
    spend > 50% of the max customer's spend), frequent items by count
    threshold, both feeding IN-subqueries over a two-channel UNION ALL,
    collapsed to one scalar. Quantity×price products use exact integer
    cents so the 0.5×max threshold compares identical int64s."""
    _views(spark, sf_dir)
    return spark.sql(_Q23_TMPL)


_Q72_TMPL = """
    SELECT p.p_name AS i_item_desc,
           weekofyear(s.l_shipdate) AS wk,
           CAST(count(CASE WHEN r.r_ok IS NULL THEN 1 END) AS BIGINT)
             AS no_return_cnt,
           CAST(count(CASE WHEN r.r_ok IS NOT NULL THEN 1 END) AS BIGINT)
             AS returned_cnt,
           CAST(count(*) AS BIGINT) AS total_cnt
    FROM lineitem s
    JOIN orders   ON s.l_orderkey = o_orderkey
    JOIN part p   ON s.l_partkey = p.p_partkey
    JOIN lineitem inv
      ON s.l_partkey = inv.l_partkey
     AND weekofyear(s.l_shipdate) = weekofyear(inv.l_shipdate)
     AND year(inv.l_shipdate) = 1998
     AND inv.l_quantity < s.l_quantity
    LEFT OUTER JOIN (
      SELECT l_orderkey AS r_ok, l_partkey AS r_pk FROM lineitem
      WHERE l_returnflag = 'R' GROUP BY l_orderkey, l_partkey
    ) r ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
    WHERE year(s.l_shipdate) = 1998
      AND s.l_shipdate > o_orderdate + INTERVAL 5 DAY
      AND o_orderpriority = '1-URGENT'
    GROUP BY p.p_name, weekofyear(s.l_shipdate)
    ORDER BY total_cnt DESC, i_item_desc, wk
    LIMIT 100
"""

_Q72_DUCK = _Q72_TMPL.replace(
    "weekofyear(s.l_shipdate) AS wk", "CAST(weekofyear(s.l_shipdate) AS INT) AS wk"
)


@query("tpcds_q72_offset_inventory", oracle=_Q72_DUCK)
def tpcds_q72_offset_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 shape (tpcds/q72.sql): sales joined to the inventory
    fact on item + SAME WEEK with a quantity inequality (stock below
    demand), a ship-after-sold+5-days interval predicate, and a LEFT JOIN
    to returns counted by NULL/NOT NULL CASE — the multi-fact join with a
    non-equi component the original exists to stress."""
    _views(spark, sf_dir)
    return spark.sql(_Q72_TMPL)


_Q54_TMPL = """
    WITH lw AS (
      SELECT l.*, o_custkey FROM lineitem l JOIN orders ON l_orderkey = o_orderkey),
    my_customers AS (
      SELECT DISTINCT o_custkey
      FROM lw JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND year(l_shipdate) = 1998 AND month(l_shipdate) = 12),
    my_revenue AS (
      SELECT lw.o_custkey, round(sum(l_extendedprice), 2) AS revenue
      FROM lw JOIN my_customers mc ON lw.o_custkey = mc.o_custkey
      WHERE l_shipdate >= (SELECT TIMESTAMP '1999-01-01')
        AND l_shipdate <  (SELECT TIMESTAMP '1999-04-01')
      GROUP BY lw.o_custkey)
    SELECT CAST(floor(revenue / 5000) AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS num_customers,
           CAST(floor(revenue / 5000) AS BIGINT) * 5000 AS segment_base
    FROM my_revenue
    GROUP BY floor(revenue / 5000)
    ORDER BY segment
"""


@query("tpcds_q54_revenue_segments", oracle=_Q54_TMPL)
def tpcds_q54_revenue_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape (tpcds/q54.sql): customers who bought the target
    category in an anchor month (channel union folded into lw), their
    revenue over the following quarter bounded by scalar date subqueries,
    bucketed into fixed-width segments and counted — the
    cohort-then-histogram composition."""
    _views(spark, sf_dir)
    return spark.sql(_Q54_TMPL)


# ==========================================================================
# Batch 6 (r5): the heavyweight composite shapes — cross-channel attribute
# INTERSECT feeding a rollup union (q14a), return-ratio dual-rank union
# (q49), year-over-year net-sales delta over unioned channels (q75).
# ==========================================================================

_Q14_TMPL = """
    WITH cross_items AS (
      SELECT p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'A' AND year(l_shipdate) BETWEEN 1997 AND 1998
      INTERSECT
      SELECT p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'N' AND year(l_shipdate) BETWEEN 1997 AND 1998
      INTERSECT
      SELECT p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'R' AND year(l_shipdate) BETWEEN 1997 AND 1998),
    avg_sales AS (
      SELECT avg(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS average_sales
      FROM lineitem WHERE year(l_shipdate) BETWEEN 1997 AND 1998)
    SELECT channel, p_brand,
           CAST(sum(sales) AS BIGINT) AS sales_cents,
           CAST(count(*) AS BIGINT) AS number_sales
    FROM (
      SELECT 'store' AS channel, p.p_brand,
             CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lineitem JOIN part p ON l_partkey = p.p_partkey
      JOIN cross_items ci ON p.p_brand = ci.p_brand AND p.p_type = ci.p_type
      WHERE l_linestatus = 'F' AND year(l_shipdate) = 1998
      UNION ALL
      SELECT 'web' AS channel, p.p_brand,
             CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lineitem JOIN part p ON l_partkey = p.p_partkey
      JOIN cross_items ci ON p.p_brand = ci.p_brand AND p.p_type = ci.p_type
      WHERE l_linestatus = 'O' AND year(l_shipdate) = 1998
    ) u
    GROUP BY ROLLUP (channel, p_brand)
    HAVING sum(sales) > (SELECT average_sales FROM avg_sales)
    ORDER BY channel NULLS LAST, p_brand NULLS LAST
    LIMIT 100
"""


@query("tpcds_q14_cross_channel_items", oracle=_Q14_TMPL)
def tpcds_q14_cross_channel_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14a shape (tpcds/q14a.sql): the item-attribute INTERSECT of
    three channels (items sold in ALL channels), a scalar average-sales
    CTE used as a HAVING threshold, and a channel UNION ALL rolled up by
    (channel, brand). Sales stay in exact integer cents end-to-end, so
    the HAVING threshold compares int64 sums against the exactly-derived
    average in both engines."""
    _views(spark, sf_dir)
    return spark.sql(_Q14_TMPL)


def _q49_channel(status: str, label: str) -> str:
    return f"""
      SELECT '{label}' AS channel, item, return_ratio,
             rank() OVER (ORDER BY return_ratio, item)   AS return_rank,
             rank() OVER (ORDER BY currency_ratio, item) AS currency_rank
      FROM (
        SELECT s.l_partkey AS item,
               sum(COALESCE(r.ret_qty, 0)) / (sum(CAST(round(s.l_quantity) AS BIGINT)) + 0.0)
                 AS return_ratio,
               sum(COALESCE(r.ret_cents, 0)) / (sum(CAST(round(s.l_extendedprice * 100) AS BIGINT)) + 0.0)
                 AS currency_ratio
        FROM lineitem s
        LEFT OUTER JOIN (
          SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS ret_qty,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret_cents
          FROM lineitem WHERE l_returnflag = 'R'
          GROUP BY l_orderkey, l_partkey
        ) r ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
        WHERE s.l_linestatus = '{status}' AND s.l_returnflag <> 'R'
          AND year(s.l_shipdate) = 1998
        GROUP BY s.l_partkey) ratios"""


_Q49_TMPL = f"""
    SELECT channel, CAST(item AS BIGINT) AS item,
           round(return_ratio, 6) AS return_ratio,
           CAST(return_rank AS BIGINT) AS return_rank
    FROM (
      {_q49_channel('F', 'store')}
      UNION ALL
      {_q49_channel('O', 'web')}
    ) all_ch
    WHERE return_rank <= 10 OR currency_rank <= 10
    ORDER BY channel, return_rank, item
"""


@query("tpcds_q49_return_ratio_ranks", oracle=_Q49_TMPL)
def tpcds_q49_return_ratio_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape (tpcds/q49.sql): per-channel worst-returns report —
    return-quantity and return-amount ratios from a LEFT JOIN against the
    returns relation, TWO rank windows per channel, rows ranked top-10 in
    EITHER ranking, channels unioned with a label column. Ratios divide
    exact int64 sums, so ranks agree across engines; item tiebreakers pin
    equal-ratio rank order."""
    _views(spark, sf_dir)
    return spark.sql(_Q49_TMPL)


_Q75_TMPL = """
    WITH all_sales AS (
      SELECT year(l_shipdate) AS d_year, p_brand,
             CAST(sum(sales_cnt) AS BIGINT) AS sales_cnt,
             round(sum(sales_amt), 2) AS sales_amt
      FROM (
        SELECT l_shipdate, p_brand,
               CAST(round(s.l_quantity) AS BIGINT) - COALESCE(r.ret_qty, 0)
                 AS sales_cnt,
               s.l_extendedprice - COALESCE(r.ret_amt, 0.0) AS sales_amt
        FROM lineitem s
        JOIN part ON s.l_partkey = p_partkey
        LEFT JOIN (
          SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS ret_qty,
                 round(sum(l_extendedprice), 2) AS ret_amt
          FROM lineitem WHERE l_returnflag = 'R'
          GROUP BY l_orderkey, l_partkey
        ) r ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
        WHERE s.l_returnflag <> 'R' AND p_type IN ('ECONOMY', 'PROMO')
      ) x
      GROUP BY year(l_shipdate), p_brand)
    SELECT CAST(prev_yr.d_year AS BIGINT) AS prev_year,
           CAST(curr_yr.d_year AS BIGINT) AS year,
           prev_yr.p_brand,
           prev_yr.sales_cnt AS prev_yr_cnt,
           curr_yr.sales_cnt AS curr_yr_cnt,
           curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
           round(curr_yr.sales_amt - prev_yr.sales_amt, 2) AS sales_amt_diff
    FROM all_sales curr_yr JOIN all_sales prev_yr
      ON curr_yr.p_brand = prev_yr.p_brand
     AND curr_yr.d_year = 1998 AND prev_yr.d_year = 1997
    WHERE curr_yr.sales_cnt / (prev_yr.sales_cnt + 0.0) < 0.9
    ORDER BY sales_cnt_diff, prev_yr.p_brand
    LIMIT 100
"""


@query("tpcds_q75_yoy_delta", oracle=_Q75_TMPL)
def tpcds_q75_yoy_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape (tpcds/q75.sql): per-(year, brand) NET sales
    (quantity and amount minus returns via LEFT JOIN coalesce
    subtraction), the yearly relation self-joined prev-vs-curr year,
    keeping brands that shrank >10% — ordered by the count delta.
    Counts are exact int64 so the 0.9 ratio threshold is the identical
    IEEE division in both engines."""
    _views(spark, sf_dir)
    return spark.sql(_Q75_TMPL)


# ==========================================================================
# Batch 7 (r5): statistical self-join (q39) and correlated per-category
# average threshold (q6).
# ==========================================================================

_Q39_TMPL = """
    WITH inv AS (
      SELECT b, m, round(mean, 4) AS mean,
             round(sd / mean, 4) AS cov
      FROM (
        SELECT p_brand AS b, month(l_shipdate) AS m,
               stddev_samp(CAST(round(l_quantity) AS BIGINT)) AS sd,
               avg(CAST(round(l_quantity) AS BIGINT)) AS mean,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = 1998
        GROUP BY p_brand, month(l_shipdate)) foo
      WHERE n >= 2 AND mean <> 0 AND sd / mean > 0.5)
    SELECT i1.b AS brand,
           CAST(i1.m AS BIGINT) AS moy1, i1.mean AS mean1, i1.cov AS cov1,
           CAST(i2.m AS BIGINT) AS moy2, i2.mean AS mean2, i2.cov AS cov2
    FROM inv i1 JOIN inv i2 ON i1.b = i2.b AND i1.m = 1 AND i2.m = 2
    ORDER BY brand
"""


@query("tpcds_q39_inventory_cov", oracle=_Q39_TMPL)
def tpcds_q39_inventory_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 shape (tpcds/q39a.sql): per-(item-group, month)
    quantity mean and coefficient of variation (stddev/mean) with a
    high-variance filter, the CTE self-joined on CONSECUTIVE months —
    finding groups volatile in both January and February. The mean is
    an exact int64 average; cov compares engine-identical values away
    from the 0.5 threshold (continuous statistic, boundary measure
    zero)."""
    _views(spark, sf_dir)
    return spark.sql(_Q39_TMPL)


_Q6_TMPL = """
    SELECT n_name AS state, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN part i   ON l_partkey = i.p_partkey
    WHERE year(l_shipdate) = 1998
      AND i.p_retailprice > 1.005 * (SELECT avg(j.p_retailprice)
                                     FROM part j WHERE j.p_type = i.p_type)
    GROUP BY n_name
    HAVING count(*) >= 2
    ORDER BY cnt, state
    LIMIT 100
"""


@query("tpcds_q6_above_category_avg", oracle=_Q6_TMPL)
def tpcds_q6_above_category_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q6 shape (tpcds/q6.sql): count customers per state buying
    items priced above a CORRELATED per-category average (scalar subquery
    correlated on the item's own category, decorrelated by Catalyst into
    an aggregate + join on p_type). Threshold constant adapted to the
    synthetic price band (900-920: 1.2x the mean is above the max price;
    1.005x selects the top ~25% as the original intends)."""
    _views(spark, sf_dir)
    return spark.sql(_Q6_TMPL)


# ==========================================================================
# Batch 8 (r5): EXCEPT chain (q87), fact-side correlated threshold (q32),
# heterogeneous-column channel union (q76).
# ==========================================================================

_Q87_TMPL = """
    SELECT CAST(count(*) AS BIGINT) AS except_count FROM (
      SELECT DISTINCT c_name, year(l_shipdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'A'
      EXCEPT
      SELECT DISTINCT c_name, year(l_shipdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'N'
      EXCEPT
      SELECT DISTINCT c_name, year(l_shipdate) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
    ) cool_cust
"""


@query("tpcds_q87_except_chain", oracle=_Q87_TMPL)
def tpcds_q87_except_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q87 shape (tpcds/q87.sql): the EXCEPT dual of q38's
    INTERSECT — customer-activity present in the first channel but
    neither of the other two, counted (planned as successive left-anti
    joins over aggregated distinct sets)."""
    _views(spark, sf_dir)
    return spark.sql(_Q87_TMPL)


_Q32_TMPL = """
    SELECT round(sum(l.l_extendedprice * l.l_discount), 4)
           AS excess_discount_amount
    FROM lineitem l JOIN part ON l.l_partkey = p_partkey
    WHERE p_size BETWEEN 10 AND 40
      AND year(l.l_shipdate) = 1998
      AND l.l_extendedprice * l.l_discount > (
        SELECT 1.3 * avg(l2.l_extendedprice * l2.l_discount)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey AND year(l2.l_shipdate) = 1998)
"""


@query("tpcds_q32_excess_discount", oracle=_Q32_TMPL)
def tpcds_q32_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q32 shape (tpcds/q32.sql): sum the discount amounts that
    exceed 1.3x the item's OWN average discount in the window — the
    correlated aggregate is over the FACT table itself (unlike q6's
    dim-side correlation), decorrelated into a per-item aggregate
    self-joined back on the item key."""
    _views(spark, sf_dir)
    return spark.sql(_Q32_TMPL)


_Q76_TMPL = """
    SELECT channel, col_name,
           CAST(year(ship) AS BIGINT) AS d_year,
           CAST(count(*) AS BIGINT) AS sales_cnt,
           round(sum(price), 2) AS sales_amt
    FROM (
      SELECT 'store' AS channel, 'l_suppkey' AS col_name,
             l_shipdate AS ship, l_extendedprice AS price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'P'
      UNION ALL
      SELECT 'web' AS channel, 'o_custkey' AS col_name,
             l_shipdate AS ship, l_extendedprice AS price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'catalog' AS channel, 'l_partkey' AS col_name,
             l_shipdate AS ship, l_extendedprice AS price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ) u
    GROUP BY channel, col_name, year(ship)
    ORDER BY channel, col_name, d_year
"""


@query("tpcds_q76_hetero_channel_union", oracle=_Q76_TMPL)
def tpcds_q76_hetero_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 shape (tpcds/q76.sql): a channel UNION ALL where each
    branch contributes a DIFFERENT anomaly column (labeled col_name) —
    unified under one schema and counted per (channel, col_name, year).
    Adaptation: the synthetic fact has no NULL foreign keys (the
    original's anomaly predicate), so order-status classes stand in as
    each branch's marker predicate."""
    _views(spark, sf_dir)
    return spark.sql(_Q76_TMPL)


# ==========================================================================
# Batch 9 (r5): returns-aware before/after pivot (q40), multi-range-band
# semi join (q37), 6-instance CTE self-join (q4), dual-measure 12-month
# wide pivot union (q66).
# ==========================================================================

_Q40_TMPL = """
    SELECT n_name AS w_state, p_name AS i_item_id,
           round(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
                          THEN s.l_extendedprice - COALESCE(r.ret_amt, 0)
                          ELSE 0 END), 2) AS sales_before,
           round(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
                          THEN s.l_extendedprice - COALESCE(r.ret_amt, 0)
                          ELSE 0 END), 2) AS sales_after
    FROM lineitem s
    LEFT OUTER JOIN (
      SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
             round(sum(l_extendedprice), 2) AS ret_amt
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_orderkey, l_partkey
    ) r ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
    JOIN supplier ON s.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON s.l_partkey = p_partkey
    WHERE p_retailprice BETWEEN 902 AND 912
      AND s.l_returnflag <> 'R'
      AND s.l_shipdate BETWEEN TIMESTAMP '1998-05-02' AND TIMESTAMP '1998-07-01'
    GROUP BY n_name, p_name
    ORDER BY w_state, i_item_id
    LIMIT 100
"""


@query("tpcds_q40_returns_before_after", oracle=_Q40_TMPL)
def tpcds_q40_returns_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q40 shape (tpcds/q40.sql): net-of-returns sales pivoted into
    before/after an anchor date (q21's pivot composed with q93's returns
    LEFT JOIN), per (warehouse-state ≈ supplier nation, item), in a ±30-day
    window with an item price band."""
    _views(spark, sf_dir)
    return spark.sql(_Q40_TMPL)


_Q37_TMPL = """
    SELECT p_name AS i_item_id, p_retailprice AS i_current_price
    FROM part
    JOIN lineitem inv ON inv.l_partkey = p_partkey
    WHERE p_retailprice BETWEEN 902 AND 915
      AND p_size IN (10, 20, 30, 40)
      AND inv.l_quantity BETWEEN 10 AND 40
      AND inv.l_shipdate BETWEEN TIMESTAMP '1998-02-01'
                             AND TIMESTAMP '1998-04-02'
      AND p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_linestatus = 'O')
    GROUP BY p_name, p_retailprice
    ORDER BY i_item_id
    LIMIT 100
"""


@query("tpcds_q37_range_bands_semi", oracle=_Q37_TMPL)
def tpcds_q37_range_bands_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q37/q82 shape (tpcds/q37.sql): items in a price band AND a
    manufacturer IN-list, whose inventory (≈ lineitem quantity) sat in a
    range during a 60-day window, AND that sold in the other channel
    (IN-subquery → semi join) — three stacked range predicates + a semi,
    grouped to distinct items."""
    _views(spark, sf_dir)
    return spark.sql(_Q37_TMPL)


_Q4_TMPL = """
    WITH year_total AS (
      SELECT o_custkey AS customer_id, c_name,
             year(l_shipdate) AS dyear, l_returnflag AS sale_type,
             round(sum(l_extendedprice), 2) AS year_total
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      GROUP BY o_custkey, c_name, year(l_shipdate), l_returnflag
    )
    SELECT t_s_secyear.c_name AS customer_name
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_c_firstyear, year_total t_c_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_c_secyear.customer_id
      AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.sale_type = 'A' AND t_s_secyear.sale_type = 'A'
      AND t_c_firstyear.sale_type = 'N' AND t_c_secyear.sale_type = 'N'
      AND t_w_firstyear.sale_type = 'R' AND t_w_secyear.sale_type = 'R'
      AND t_s_firstyear.dyear = 1997 AND t_s_secyear.dyear = 1998
      AND t_c_firstyear.dyear = 1997 AND t_c_secyear.dyear = 1998
      AND t_w_firstyear.dyear = 1997 AND t_w_secyear.dyear = 1998
      AND t_s_firstyear.year_total > 0
      AND t_c_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND t_c_secyear.year_total / t_c_firstyear.year_total
        > t_s_secyear.year_total / t_s_firstyear.year_total
      AND t_w_secyear.year_total / t_w_firstyear.year_total
        > t_s_secyear.year_total / t_s_firstyear.year_total
    ORDER BY customer_name
    LIMIT 100
"""


@query("tpcds_q4_triple_channel_growth", oracle=_Q4_TMPL)
def tpcds_q4_triple_channel_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4 shape (tpcds/q4.sql): the q11 pattern taken to THREE
    channels — one year-total CTE referenced SIX times, customers whose
    catalog AND web growth both outpaced store growth (channels =
    return-flag classes)."""
    _views(spark, sf_dir)
    return spark.sql(_Q4_TMPL)


_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec"]


def _q66_pivot(measure: str, suffix: str, scale: int) -> str:
    # pivot in exact integer units (x100 for 2-decimal prices, x10000 for
    # 4-decimal products) so the outer re-sum adds int64s — float sums
    # disagreed at a 2dp round boundary in 1/100 sf0.01 rows
    return ",\n".join(
        f"sum(CASE WHEN month(l_shipdate) = {i + 1} "
        f"THEN CAST(round(({measure}) * {scale}) AS BIGINT) "
        f"ELSE 0 END) AS {m}_{suffix}"
        for i, m in enumerate(_MONTHS)
    )


def _q66_resum(suffix: str, scale: int) -> str:
    # exact int64 total / scale is one exactly-rounded IEEE division;
    # rounding at the value's own decimal width keeps lattice points fixed
    nd = 2 if scale == 100 else 4
    return ",\n".join(
        f"round(sum({m}_{suffix}) / {scale}.0, {nd}) AS {m}_{suffix}"
        for m in _MONTHS
    )


_Q66_TMPL = f"""
    SELECT s_name AS w_warehouse_name, ship_carriers, d_year,
           {_q66_resum('sales', 100)},
           {_q66_resum('net', 10000)}
    FROM (
      SELECT s_name, 'F_CHANNEL' AS ship_carriers,
             CAST(year(l_shipdate) AS BIGINT) AS d_year,
             {_q66_pivot('l_extendedprice', 'sales', 100)},
             {_q66_pivot('l_extendedprice * (1 - l_discount)', 'net', 10000)}
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linestatus = 'F' AND year(l_shipdate) = 1998
      GROUP BY s_name, year(l_shipdate)
      UNION ALL
      SELECT s_name, 'O_CHANNEL' AS ship_carriers,
             CAST(year(l_shipdate) AS BIGINT) AS d_year,
             {_q66_pivot('l_extendedprice', 'sales', 100)},
             {_q66_pivot('l_extendedprice * (1 - l_discount)', 'net', 10000)}
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linestatus = 'O' AND year(l_shipdate) = 1998
      GROUP BY s_name, year(l_shipdate)
    ) x
    GROUP BY s_name, ship_carriers, d_year
    ORDER BY w_warehouse_name, ship_carriers
    LIMIT 100
"""


@query("tpcds_q66_monthly_wide_pivot", oracle=_Q66_TMPL)
def tpcds_q66_monthly_wide_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape (tpcds/q66.sql): the widest projection in the
    corpus — 12 months × 2 measure families CASE-pivoted per channel,
    channels unioned and RE-aggregated (sum of sums) per warehouse — the
    two-level wide-pivot aggregation that stresses codegen's wide-row
    paths."""
    _views(spark, sf_dir)
    return spark.sql(_Q66_TMPL)


# ==========================================================================
# Batch 10 (r5): full-outer presence flags (q97), OR-of-AND band filters
# (q13), fact-to-fact return-lag buckets (q50), dim-only correlated
# attribute count (q41), per-store below-average items (q65).
# ==========================================================================

_Q97_TMPL = """
    WITH ssci AS (
      SELECT o_custkey AS customer_sk, l_partkey AS item_sk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linestatus = 'F' AND year(l_shipdate) = 1998
      GROUP BY o_custkey, l_partkey),
    csci AS (
      SELECT o_custkey AS customer_sk, l_partkey AS item_sk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linestatus = 'O' AND year(l_shipdate) = 1998
      GROUP BY o_custkey, l_partkey)
    SELECT CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(sum(CASE WHEN ssci.customer_sk IS NULL
                          AND csci.customer_sk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
           CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
    FROM ssci FULL OUTER JOIN csci
      ON ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk
"""


@query("tpcds_q97_channel_presence", oracle=_Q97_TMPL)
def tpcds_q97_channel_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 shape (tpcds/q97.sql): distinct (customer, item)
    activity per channel FULL OUTER joined, with NULL-side CASE flags
    counting store-only / catalog-only / both — channel-overlap
    cardinality from one full-outer pass."""
    _views(spark, sf_dir)
    return spark.sql(_Q97_TMPL)


_Q13_TMPL = """
    SELECT avg(CAST(round(l_quantity) AS BIGINT))                    AS avg_qty,
           avg(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS avg_price,
           avg(CAST(round(l_discount * 100) AS BIGINT)) / 100.0      AS avg_disc,
           round(sum(l_extendedprice), 2)                            AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(l_shipdate) = 1998
      AND ((o_orderpriority = '1-URGENT'
            AND l_extendedprice BETWEEN 90000 AND 92000
            AND l_quantity BETWEEN 1 AND 20)
        OR (o_orderpriority = '2-HIGH'
            AND l_extendedprice BETWEEN 92000 AND 94000
            AND l_quantity BETWEEN 10 AND 30)
        OR (o_orderpriority = '3-MEDIUM'
            AND l_extendedprice BETWEEN 94000 AND 96000
            AND l_quantity BETWEEN 20 AND 50))
"""


@query("tpcds_q13_or_of_ands", oracle=_Q13_TMPL)
def tpcds_q13_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q13/q48 shape (tpcds/q13.sql): a disjunction of three
    CONJUNCTION groups, each pairing a categorical dimension value with
    different numeric bands — the OR-of-ANDs predicate the planner must
    keep joined (no single band is pushable alone) — under global
    averages. Exact-integer averages per the module discipline."""
    _views(spark, sf_dir)
    return spark.sql(_Q13_TMPL)


_Q50_TMPL_SPARK = """
    SELECT s_name AS store,
           CAST(sum(CASE WHEN datediff(r.l_shipdate, s.l_shipdate) <= 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff(r.l_shipdate, s.l_shipdate) > 30
                          AND datediff(r.l_shipdate, s.l_shipdate) <= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS d31_90,
           CAST(sum(CASE WHEN datediff(r.l_shipdate, s.l_shipdate) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS d90_plus
    FROM lineitem s
    JOIN lineitem r
      ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
     AND s.l_returnflag <> 'R' AND r.l_returnflag = 'R'
    JOIN supplier ON s.l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY store
    LIMIT 100
"""

_Q50_TMPL_DUCK = _Q50_TMPL_SPARK.replace(
    "datediff(r.l_shipdate, s.l_shipdate)",
    "date_diff('day', s.l_shipdate, r.l_shipdate)",
)


@query("tpcds_q50_return_lag_buckets", oracle=_Q50_TMPL_DUCK)
def tpcds_q50_return_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q50 shape (tpcds/q50.sql): sale row joined to ITS return row
    (same order + item across the two fact classes) with the day lag
    between the two events bucketed per store — the fact-to-fact
    event-lag report (q62 buckets order→ship within one fact; this one
    spans facts)."""
    _views(spark, sf_dir)
    return spark.sql(_Q50_TMPL_SPARK)


_Q41_TMPL = """
    SELECT DISTINCT p_name AS i_product_name
    FROM part i1
    WHERE p_size BETWEEN 10 AND 40
      AND (SELECT count(*) FROM part
           WHERE p_brand = i1.p_brand
             AND ((p_type = 'ECONOMY' AND p_size IN (10, 20))
               OR (p_type = 'PROMO'   AND p_size IN (30, 40)))) > 0
    ORDER BY i_product_name
    LIMIT 100
"""


@query("tpcds_q41_attribute_combos", oracle=_Q41_TMPL)
def tpcds_q41_attribute_combos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 shape (tpcds/q41.sql): a DIM-ONLY query — items whose
    brand (≈ manufacturer) also produces items matching any of a set of
    attribute-combination conjunctions, expressed as a correlated COUNT
    subquery over the same dimension table (decorrelated to a per-brand
    aggregate self-joined back)."""
    _views(spark, sf_dir)
    return spark.sql(_Q41_TMPL)


_Q65_TMPL = """
    WITH sc AS (
      SELECT l_suppkey AS store_sk, l_partkey AS item_sk,
             round(sum(l_extendedprice), 2) AS revenue
      FROM lineitem GROUP BY l_suppkey, l_partkey),
    sb AS (
      SELECT store_sk,
             avg(CAST(round(revenue * 100) AS BIGINT)) / 100.0 AS ave
      FROM sc GROUP BY store_sk)
    SELECT s_name AS s_store_name, p_name AS i_item_desc, sc.revenue
    FROM sc
    JOIN sb ON sc.store_sk = sb.store_sk
    JOIN supplier ON sc.store_sk = s_suppkey
    JOIN part     ON sc.item_sk = p_partkey
    WHERE sc.revenue <= 0.5 * sb.ave
    ORDER BY s_store_name, i_item_desc, sc.revenue
    LIMIT 100
"""


@query("tpcds_q65_below_store_average", oracle=_Q65_TMPL)
def tpcds_q65_below_store_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape (tpcds/q65.sql): per-(store, item) revenue joined
    against the store's average item revenue, keeping each store's
    weakest items (revenue below half the store average) — the
    per-group-average threshold join, with both dims joined back for
    display. Exact-cents average for the engine-identical threshold."""
    _views(spark, sf_dir)
    return spark.sql(_Q65_TMPL)


# ==========================================================================
# Batch 11 (r5): channel P&L rollup (q5/q77) — the 50th shape.
# ==========================================================================

def _q5_channel(status: str, label: str) -> str:
    return f"""
      SELECT '{label}' AS channel, n_name AS loc,
             CAST(sum(CASE WHEN l_returnflag <> 'R'
                           THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS sales_cents,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS returns_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE l_linestatus = '{status}' AND year(l_shipdate) = 1998
      GROUP BY n_name"""


_Q5_TMPL = f"""
    SELECT channel, loc,
           round(sum(sales_cents) / 100.0, 2)   AS sales,
           round(sum(returns_cents) / 100.0, 2) AS returns,
           round((sum(sales_cents) - sum(returns_cents)) / 100.0, 2) AS profit
    FROM (
      {_q5_channel('F', 'store')}
      UNION ALL
      {_q5_channel('O', 'web')}
    ) x
    GROUP BY ROLLUP (channel, loc)
    ORDER BY channel NULLS LAST, loc NULLS LAST
    LIMIT 100
"""


@query("tpcds_q5_channel_pnl", oracle=_Q5_TMPL)
def tpcds_q5_channel_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q5/q77/q80 shape (tpcds/q5.sql): per-channel profit-and-loss
    — sales and returns aggregated per location within each channel,
    channels unioned under a ROLLUP(channel, location) with
    profit = sales − returns at every level. Exact integer cents
    throughout; the grand-total row sums both measures across channels."""
    _views(spark, sf_dir)
    return spark.sql(_Q5_TMPL)
