"""TPC-DS query-shape slice, part 2: subquery-decorrelation, reporting,
and composite batches (3-11). Split from operators/tpcds.py (VERDICT r05
hygiene item: no registry module >1.5k LoC); the schema mapping, plan-
signature rationale, and determinism discipline are documented in
operators/tpcds.py's module docstring and apply unchanged here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.operators.tpcds import _views
from sparkfulltextquery_spark.registry import query

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


# r12 Spark-side fusion of _Q14_TMPL (template stays the DuckDB oracle;
# driver compare proves equivalence). Two fusions:
# (1) cross_items: the three INTERSECT branches each scanned lineitem⋈part
#     with a different l_returnflag constant; a (brand, type) survives the
#     INTERSECT chain iff it occurs under ALL THREE flags, which is ONE
#     scan over l_returnflag IN ('A','N','R') grouped by (brand, type)
#     HAVING count(DISTINCT l_returnflag) = 3 (INTERSECT's set semantics =
#     the GROUP BY's key dedup; NULL brand/type group together exactly as
#     INTERSECT's null-safe equality compares them).
# (2) the two channel blocks differ only in the l_linestatus constant —
#     one scan over IN ('F','O') with a CASE channel label feeds the same
#     ROLLUP (the union's row multiset is reproduced row-for-row).
# Plan: 6 lineitem scans → 3, part joined 4× → 2×
# (plans/r12/tpcds_q14_*_{before,after}.txt).
_Q14_FUSED = """
    WITH cross_items AS (
      SELECT p_brand, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag IN ('A', 'N', 'R')
        AND year(l_shipdate) BETWEEN 1997 AND 1998
      GROUP BY p_brand, p_type
      HAVING count(DISTINCT l_returnflag) = 3),
    avg_sales AS (
      SELECT avg(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS average_sales
      FROM lineitem WHERE year(l_shipdate) BETWEEN 1997 AND 1998)
    SELECT channel, p_brand,
           CAST(sum(sales) AS BIGINT) AS sales_cents,
           CAST(count(*) AS BIGINT) AS number_sales
    FROM (
      SELECT CASE l_linestatus WHEN 'F' THEN 'store' ELSE 'web' END AS channel,
             p.p_brand,
             CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lineitem JOIN part p ON l_partkey = p.p_partkey
      JOIN cross_items ci ON p.p_brand = ci.p_brand AND p.p_type = ci.p_type
      WHERE l_linestatus IN ('F', 'O') AND year(l_shipdate) = 1998
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
    average in both engines. Spark executes the scan-fused rewrite
    (_Q14_FUSED above); DuckDB keeps the literal template."""
    _views(spark, sf_dir)
    return spark.sql(_Q14_FUSED)


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


# The channel-fused ratios relation for the r12 q49 rewrite (the _Q49_TMPL
# stays the DuckDB oracle; the driver's result compare proves equivalence).
# The template's two per-channel blocks differ only in the l_linestatus
# constant; fused they are ONE returns aggregation and ONE sales scan over
# l_linestatus IN ('F','O') grouped by (linestatus → channel, item).
_Q49_RATIOS = """
    SELECT CASE s.l_linestatus WHEN 'F' THEN 'store' ELSE 'web' END AS channel,
           s.l_partkey AS item,
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
    WHERE s.l_linestatus IN ('F', 'O') AND s.l_returnflag <> 'R'
      AND year(s.l_shipdate) = 1998
    GROUP BY s.l_linestatus, s.l_partkey
"""


@query("tpcds_q49_return_ratio_ranks", oracle=_Q49_TMPL)
def tpcds_q49_return_ratio_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape (tpcds/q49.sql): per-channel worst-returns report —
    return-quantity and return-amount ratios from a LEFT JOIN against the
    returns relation, TWO rank windows per channel, rows ranked top-10 in
    EITHER ranking, channels unioned with a label column. Ratios divide
    exact int64 sums, so ranks agree across engines; item tiebreakers pin
    equal-ratio rank order.

    r12 Spark-side rewrite (DuckDB keeps the literal template; the result
    compare proves equivalence). The template's rank() OVER (ORDER BY …)
    windows are GLOBAL per channel — four single-partition window sorts of
    the whole per-item ratios relation (the 100 TB scale cliff: one task
    sorts every item). Because `item` is a group key, rank has no ties
    (rank ≡ row_number), so:

    1. ratios — the channel-fused aggregation (_Q49_RATIOS: one returns
       agg + one sales scan instead of two of each; the three consumers
       below share its exchange via AQE ReuseExchange).
    2. survivors — each "rank ≤ 10" becomes a PARTITION BY channel rank
       filtered to 10, which Spark 3.5+ executes as WindowGroupLimit:
       partition-local top-10 HEAPS before the exchange, never a global
       sort (plan pinned in tests/test_plans.py).
    3. return_rank for the ≤ 2·10·channels survivors = 1 + count of
       strictly-smaller (return_ratio, item) rows in the channel — one
       broadcast count pass, no window.

    Measured (same session, median of 3): sf10 13.9 → 8.9s and the
    decade ratio flattens 4.5× → 1.9×/decade; the cost is ~+0.6s of
    fixed per-job overhead at sf0.1 (1.19 → 1.75s) — the scale trade the
    100 TB goal wants. Rows verified identical at sf0.1/sf1/sf10 and by
    the full oracle matrix."""
    _views(spark, sf_dir)
    from pyspark.sql import Window

    ratios = spark.sql(_Q49_RATIOS)
    wr = Window.partitionBy("channel").orderBy("return_ratio", "item")
    wc = Window.partitionBy("channel").orderBy("currency_ratio", "item")
    s_a = ratios.withColumn("_rn", F.rank().over(wr)).filter("_rn <= 10").drop("_rn")
    s_b = ratios.withColumn("_rn", F.rank().over(wc)).filter("_rn <= 10").drop("_rn")
    surv = s_a.unionAll(s_b).dropDuplicates(["channel", "item"]).select(
        F.col("channel").alias("s_ch"),
        F.col("item").alias("s_item"),
        F.col("return_ratio").alias("s_rr"),
    )
    cnt = (
        ratios.join(F.broadcast(surv), F.col("channel") == F.col("s_ch"))
        # null-safe "strictly before in (return_ratio ASC NULLS FIRST,
        # item ASC)" — the exact window order the template ranks by
        # (ADVICE r12: a plain `<` would DROP a NULL-ratio row, diverging
        # from rank()'s NULLS FIRST if a ratio group ever had a 0/NULL
        # denominator; unreachable with quantities ≥ 1, guarded anyway)
        .filter(
            (F.col("return_ratio").isNull() & F.col("s_rr").isNotNull())
            | (F.col("return_ratio") < F.col("s_rr"))
            | (
                F.col("return_ratio").eqNullSafe(F.col("s_rr"))
                & (F.col("item") < F.col("s_item"))
            )
        )
        .groupBy("s_ch", "s_item", "s_rr")
        .agg(F.count(F.lit(1)).alias("_before"))
    )
    return (
        surv.join(cnt, ["s_ch", "s_item", "s_rr"], "left")
        .select(
            F.col("s_ch").alias("channel"),
            F.col("s_item").cast("bigint").alias("item"),
            F.round("s_rr", 6).alias("return_ratio"),
            (F.coalesce(F.col("_before"), F.lit(0)) + 1)
            .cast("bigint")
            .alias("return_rank"),
        )
        .orderBy("channel", "return_rank", "item")
    )


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
