"""Window-function coverage (SURVEY.md §2.5).

Reference: WindowExec (sql/core/.../execution/WindowExec.scala:83) with five
frame processors (entire/growing/shrinking/moving/offset, WindowExec.scala:34-82);
functions in catalyst expressions/windowExpressions.scala (RowNumber:478,
Rank:651, DenseRank:671, PercentRank:698, CumeDist:494, NTile:527, Lead:391,
Lag:420, AggregateWindowFunction:432).

Scale notes: a window partitioned by a key is one shuffle on that key and an
in-partition sort; partitions spill via UnsafeExternalSorter, so wide
partitions are safe. Never use a global (unpartitioned) window on big data —
every query here partitions by a bounded-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "window_ranking",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number()   OVER w AS rn,
             rank()         OVER w AS rnk,
             dense_rank()   OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank per customer — the per-group top-k idiom."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_totalprice, 1)  OVER w AS prev_price,
           lead(o_totalprice, 1, -1.0) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset frame (reference Lead/Lag windowExpressions.scala:391/420),
    including a non-null default for lead."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growing frame (running total) + moving frame (3-row moving average) —
    reference frame processors at WindowExec.scala:34-82."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           round(sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                                       RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING), 2)
             AS qty_band_sum
    FROM lineitem
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering (reference RangeFrame
    windowExpressions.scala:130): all rows within ±5 quantity units."""
    l = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_quantity").rangeBetween(-5, 5)
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.sum("l_quantity").over(w), 2).alias("qty_band_sum"),
    )


@query(
    "window_ntile_cume",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a global ordering. NOTE: global
    (unpartitioned) window = single-partition sort; acceptable here because
    `orders` at sf0.01 is tiny, but at 100 TB these become
    `percent_rank over salted buckets` or approx-quantile cuts."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_unbounded_agg",
    oracle="""
    SELECT c_custkey, c_acctbal,
           round(max(c_acctbal) OVER (PARTITION BY c_nationkey), 2) AS nation_max,
           round(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey), 4)
             AS delta_from_nation_avg
    FROM customer
    """,
)
def window_unbounded_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entire-partition frame (no ORDER BY): per-group stats joined back to
    every row without a self-join."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.round(F.max("c_acctbal").over(w), 2).alias("nation_max"),
        F.round(F.col("c_acctbal") - F.avg("c_acctbal").over(w), 4).alias(
            "delta_from_nation_avg"
        ),
    )


@query(
    "window_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price_sofar,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over a growing frame (reference
    First/Last aggregate window functions + NthValue)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price_sofar"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "window_forward_fill",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
      FROM events
    )
    SELECT event_id, user_id,
           max(purchase_value) OVER w AS last_purchase_value_naive,
           last_value(purchase_value IGNORE NULLS) OVER w AS ffill_value
    FROM s
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last non-null over a growing frame, ignoreNulls) — the
    gap-filling idiom for sparse measurements; reference Last(ignoreNulls)
    (aggregate/Last.scala:33) as a window function."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.max(pv).over(w).alias("last_purchase_value_naive"),
        F.last(pv, ignorenulls=True).over(w).alias("ffill_value"),
    )
