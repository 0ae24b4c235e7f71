"""TPC-DS query-shape slice, part 3 (r6): the distinct-signature tail.

VERDICT r05 identified ~8 genuinely-new optimizer signatures among the 53
reference queries not yet ported (sql/core/src/test/resources/tpcds/,
103 files; TPCDSQueryBenchmark.scala:36-45):

    q64  — two-pass giant multi-join CTE (the widest join graph in the
           corpus: 8-way star with a HAVING-filtered returns CTE) whose
           result is SELF-JOINED across adjacent years with a count
           inequality.
    q70  — rank()-threshold subquery feeding an IN filter, outside a
           ROLLUP whose rank() partitions on grouping() expressions.
    q17  — three-fact chain (sale → return by same customer+item →
           re-purchase) with stddev/coefficient-of-variation stats.
    q29  — the same three-fact chain with quantity sums over a
           different date topology (month slice + multi-year re-buy).
    q9   — a CASE ladder of 15 scalar subqueries (count threshold picks
           which avg each bucket reports) producing a single row.
    q23b — the full two-CTE form (q23a's scalar twin is
           tpcds_q23_frequent_best in tpcds_sub.py): frequent items +
           best customers (HAVING over a scalar CTE max) feeding a
           two-channel UNION ALL grouped per customer.
    q69  — channel-ABSENCE demographics: EXISTS store AND NOT EXISTS
           web AND NOT EXISTS catalog (the anti-join dual of q10's
           disjunctive EXISTS).
    q35  — conjunctive EXISTS with a disjunctive (EXISTS OR EXISTS)
           pair and min/max/avg stat triplets per demographic group.

Schema mapping, determinism discipline (exact integer cents, pinned NULLS
ordering, full-key tiebreakers under LIMIT) and 100 TB notes are in
operators/tpcds.py's module docstring and apply unchanged. Channel
encoding follows tpcds_q10_disjunctive_exists: store/web/catalog →
l_returnflag 'N'/'A'/'R'.

Cross-engine guard specific to this file: stddev_samp over a 1-row group
is NaN in Spark but NULL in DuckDB — every stddev/cov output is wrapped
in CASE WHEN count(*) > 1 so both engines emit NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkfulltextquery_spark.operators.tpcds import _views
from sparkfulltextquery_spark.registry import query

# --------------------------------------------------------------------------
# q64: two-pass giant-join CTE, self-joined across years
# --------------------------------------------------------------------------

_Q64_TMPL = """
    WITH cs_ui AS (
      SELECT l_partkey AS u_item_sk
      FROM lineitem
      GROUP BY l_partkey
      HAVING CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           > 2 * CAST(sum(CASE WHEN l_returnflag = 'R'
                          THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT)),
    cross_sales AS (
      SELECT p_name AS product_name,
             p_partkey AS item_sk,
             s_name AS store_name,
             ns.n_name AS store_nation,
             nc.n_name AS cust_nation,
             c_mktsegment AS cust_segment,
             year(l_shipdate) AS syear,
             count(*) AS cnt,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s2,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS s3
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN part      ON l_partkey = p_partkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN cs_ui     ON l_partkey = u_item_sk
      WHERE p_size BETWEEN 10 AND 35
      GROUP BY 1, 2, 3, 4, 5, 6, 7)
    SELECT cs1.product_name AS product_name,
           cs1.store_name   AS store_name,
           cs1.store_nation AS store_nation,
           CAST(cs1.syear AS BIGINT) AS syear,
           CAST(cs2.syear AS BIGINT) AS fsyear,
           cs1.cnt AS cnt1, cs2.cnt AS cnt2,
           cs1.s1 AS s11, cs1.s2 AS s12, cs1.s3 AS s13,
           cs2.s1 AS s21, cs2.s2 AS s22, cs2.s3 AS s23
    FROM cross_sales cs1
    JOIN cross_sales cs2
      ON  cs1.item_sk = cs2.item_sk
      AND cs1.store_name = cs2.store_name
      AND cs1.cust_segment = cs2.cust_segment
    WHERE cs1.syear = 1997 AND cs2.syear = 1998
      AND cs2.cnt <= cs1.cnt
"""


@query("tpcds_q64_cross_year_sales", oracle=_Q64_TMPL)
def tpcds_q64_cross_year_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 shape (tpcds/q64.sql): the corpus's widest join graph.
    Pass 1 (cross_sales CTE): an 8-way star — fact × orders × part ×
    supplier × customer × two nation roles × a HAVING-filtered returns
    CTE (cs_ui: items whose sales exceed 2× their refunds) — aggregated
    per (item, store, segment, year). Pass 2: the CTE self-joined on
    item+store+segment across adjacent years with a cnt inequality (the
    year-over-year repeat-purchase report). No LIMIT in the reference, so
    no tiebreaker discipline is needed (the driver's compare is
    order-insensitive). All money sums are exact integer cents."""
    _views(spark, sf_dir)
    return spark.sql(_Q64_TMPL)


# --------------------------------------------------------------------------
# q70: rank-threshold subquery inside a grouping-set rollup rank
# --------------------------------------------------------------------------

_Q70_TMPL = """
    WITH ranked_nations AS (
      SELECT n_name
      FROM (
        SELECT ns.n_name,
               rank() OVER (
                 ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                              * 10000) AS BIGINT)) DESC) AS ranking
        FROM lineitem
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE year(l_shipdate) = 1998
        GROUP BY ns.n_name) tmp1
      WHERE ranking <= 5)
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
           AS BIGINT)) AS BIGINT) AS total_sum,
           n_name AS s_state,
           s_name AS s_county,
           CAST(grouping(n_name) + grouping(s_name) AS BIGINT) AS lochierarchy,
           rank() OVER (
             PARTITION BY grouping(n_name) + grouping(s_name),
                          CASE WHEN grouping(s_name) = 0 THEN n_name END
             ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                          * 10000) AS BIGINT)) DESC) AS rank_within_parent
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE year(l_shipdate) = 1998
      AND n_name IN (SELECT n_name FROM ranked_nations)
    GROUP BY ROLLUP (n_name, s_name)
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN s_state END NULLS LAST,
             rank_within_parent,
             s_state NULLS LAST, s_county NULLS LAST
    LIMIT 100
"""


@query("tpcds_q70_ranked_state_rollup", oracle=_Q70_TMPL)
def tpcds_q70_ranked_state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q70 shape (tpcds/q70.sql): the profit rollup over the
    store-geography hierarchy (nation ≈ s_state, supplier ≈ s_county),
    where the nations admitted to the rollup are themselves chosen by a
    rank() window inside an IN-subquery (top-5 by profit), and the outer
    rank() partitions on grouping() expressions — the signature VERDICT
    r05 called out as not yet covered (q36 has the rollup-rank, but not
    the windowed IN-subquery feeding it). Profit is exact integer
    1e-4-units; the rank ORDER BY compares int64 sums, so tie decisions
    are engine-identical."""
    _views(spark, sf_dir)
    return spark.sql(_Q70_TMPL)


# --------------------------------------------------------------------------
# q17 / q29: three-fact chains (sale → return → re-purchase)
# --------------------------------------------------------------------------

# store_sales → store_returns → catalog_sales in the reference; here the
# return is an 'R'-flagged lineitem for the same (customer, part) and the
# re-purchase is a later 'O'-status lineitem for the same pair. The chain
# joins fact-to-fact on (custkey via orders, partkey) — the shape that makes
# q17/q29 distinct from every single-fact port in tpcds.py/tpcds_sub.py.
_Q17_TMPL = """
    SELECT p_brand AS i_item_id,
           ns.n_name AS s_state,
           count(*) AS store_sales_quantitycount,
           avg(CAST(round(s.l_quantity) AS BIGINT)) AS store_sales_quantityave,
           CASE WHEN count(*) > 1 THEN
             round(stddev_samp(CAST(round(s.l_quantity) AS BIGINT)), 4)
           END AS store_sales_quantitystdev,
           CASE WHEN count(*) > 1 THEN
             round(stddev_samp(CAST(round(s.l_quantity) AS BIGINT))
                   / avg(CAST(round(s.l_quantity) AS BIGINT)), 4)
           END AS store_sales_quantitycov,
           avg(CAST(round(r.l_quantity) AS BIGINT)) AS store_returns_quantityave,
           CASE WHEN count(*) > 1 THEN
             round(stddev_samp(CAST(round(r.l_quantity) AS BIGINT)), 4)
           END AS store_returns_quantitystdev,
           avg(CAST(round(c2.l_quantity) AS BIGINT)) AS catalog_sales_quantityave,
           CASE WHEN count(*) > 1 THEN
             round(stddev_samp(CAST(round(c2.l_quantity) AS BIGINT)), 4)
           END AS catalog_sales_quantitystdev
    FROM lineitem s
    JOIN orders so   ON s.l_orderkey = so.o_orderkey
    JOIN lineitem r  ON r.l_returnflag = 'R' AND r.l_partkey = s.l_partkey
    JOIN orders ro   ON r.l_orderkey = ro.o_orderkey AND ro.o_custkey = so.o_custkey
    JOIN lineitem c2 ON c2.l_partkey = r.l_partkey
    JOIN orders co   ON c2.l_orderkey = co.o_orderkey AND co.o_custkey = ro.o_custkey
    JOIN part     ON s.l_partkey = p_partkey
    JOIN supplier ON s.l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    WHERE year(s.l_shipdate) = 1997 AND quarter(s.l_shipdate) <= 2
      AND s.l_returnflag <> 'R'
      AND year(r.l_shipdate) IN (1997, 1998)
      AND year(c2.l_shipdate) IN (1997, 1998, 1999) AND c2.l_linestatus = 'O'
    GROUP BY p_brand, ns.n_name
    ORDER BY i_item_id, s_state
    LIMIT 100
"""


@query("tpcds_q17_sale_return_rebuy_stats", oracle=_Q17_TMPL)
def tpcds_q17_sale_return_rebuy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17 shape (tpcds/q17.sql): the store→return→catalog
    three-fact chain — a sale, its return by the same customer for the
    same item, and that customer's later re-purchase — with per-group
    count/avg/stddev_samp/coefficient-of-variation stats. Quantities are
    exact integers so the avgs are bit-identical; stddevs round at 4dp
    (agg_central_moments precedent) and are NULL-guarded for 1-row groups
    (Spark NaN vs DuckDB NULL). Ordered by the full group key, so the
    LIMIT is deterministic."""
    _views(spark, sf_dir)
    return spark.sql(_Q17_TMPL)


_Q29_TMPL = """
    SELECT p_brand AS i_item_id,
           s_name AS s_store_name,
           CAST(sum(CAST(round(s.l_quantity) AS BIGINT)) AS BIGINT)
             AS store_sales_quantity,
           CAST(sum(CAST(round(r.l_quantity) AS BIGINT)) AS BIGINT)
             AS store_returns_quantity,
           CAST(sum(CAST(round(c2.l_quantity) AS BIGINT)) AS BIGINT)
             AS catalog_sales_quantity
    FROM lineitem s
    JOIN orders so   ON s.l_orderkey = so.o_orderkey
    JOIN lineitem r  ON r.l_returnflag = 'R' AND r.l_partkey = s.l_partkey
    JOIN orders ro   ON r.l_orderkey = ro.o_orderkey AND ro.o_custkey = so.o_custkey
    JOIN lineitem c2 ON c2.l_partkey = r.l_partkey
    JOIN orders co   ON c2.l_orderkey = co.o_orderkey AND co.o_custkey = ro.o_custkey
    JOIN part     ON s.l_partkey = p_partkey
    JOIN supplier ON s.l_suppkey = s_suppkey
    WHERE year(s.l_shipdate) = 1997 AND month(s.l_shipdate) BETWEEN 1 AND 6
      AND s.l_returnflag <> 'R'
      AND year(r.l_shipdate) IN (1997, 1998)
      AND year(c2.l_shipdate) IN (1997, 1998, 1999) AND c2.l_linestatus = 'O'
    GROUP BY p_brand, s_name
    ORDER BY i_item_id, s_store_name
    LIMIT 100
"""


@query("tpcds_q29_sale_return_rebuy_sums", oracle=_Q29_TMPL)
def tpcds_q29_sale_return_rebuy_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q29 shape (tpcds/q29.sql): the same three-fact chain as q17
    but with quantity SUMS per (item, store) and q29's date topology — a
    month-sliced sale window, a bounded return window, and a multi-year
    re-purchase window. Integer sums, full-key ORDER BY under LIMIT."""
    _views(spark, sf_dir)
    return spark.sql(_Q29_TMPL)


# --------------------------------------------------------------------------
# q9: CASE ladder of scalar subqueries
# --------------------------------------------------------------------------

_Q9_BUCKET = """
  CASE WHEN (SELECT count(*) FROM lineitem
             WHERE l_quantity BETWEEN {lo} AND {hi}) > {threshold}
    THEN (SELECT avg(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
          FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi})
    ELSE (SELECT avg(CAST(round(l_discount * 100) AS BIGINT)) / 100.0
          FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi}) END AS bucket{i}"""

# thresholds alternate so BOTH branches execute at the driver's sf0.01
# (each 10-wide quantity bucket holds ~12k of the 60k rows there)
_Q9_TMPL = "SELECT " + ",".join(
    _Q9_BUCKET.format(i=i + 1, lo=lo, hi=lo + 9, threshold=t)
    for i, (lo, t) in enumerate(
        [(1, 11000), (11, 999999999), (21, 11000), (31, 999999999), (41, 11000)]
    )
)


@query("tpcds_q9_bucket_ladder", oracle=_Q9_TMPL)
def tpcds_q9_bucket_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 shape (tpcds/q9.sql): a CASE ladder of 15 uncorrelated
    scalar subqueries — per quantity bucket, a count threshold picks
    which of two averages the bucket reports — collapsing to ONE row.
    The optimizer signature is scalar-subquery reuse: each bucket's three
    subqueries share a filter, and Spark plans each as an independent
    single-row subquery broadcast into the projection (no joins, no
    cartesians). Averages are exact-integer-cents divided once."""
    _views(spark, sf_dir)
    return spark.sql(_Q9_TMPL)


# --------------------------------------------------------------------------
# q23b: the full two-CTE form, per-customer top-100
# --------------------------------------------------------------------------

_Q23B_TMPL = """
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
        SELECT o_custkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)
                              * CAST(round(l_extendedprice * 100) AS BIGINT))
                         AS BIGINT) AS csales
        FROM lw GROUP BY o_custkey) x),
    best_customer AS (
      SELECT o_custkey
      FROM (SELECT o_custkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)
                                  * CAST(round(l_extendedprice * 100) AS BIGINT))
                              AS BIGINT) AS ssales
            FROM lw GROUP BY o_custkey) y, max_sales
      WHERE ssales > 0.5 * cmax)
    SELECT c_name AS c_last_name,
           round(CAST(sum(sales) AS BIGINT) / 100.0, 2) AS sales
    FROM (
      SELECT o_custkey, CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lw JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1998 AND month(l_shipdate) = 2
        AND l_linestatus = 'F'
        AND p_brand IN (SELECT p_brand FROM frequent_items WHERE m = 2)
        AND o_custkey IN (SELECT o_custkey FROM best_customer)
      UNION ALL
      SELECT o_custkey, CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT) AS sales
      FROM lw JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1998 AND month(l_shipdate) = 2
        AND l_linestatus = 'O'
        AND p_brand IN (SELECT p_brand FROM frequent_items WHERE m = 2)
        AND o_custkey IN (SELECT o_custkey FROM best_customer)
    ) u JOIN customer ON u.o_custkey = c_custkey
    GROUP BY c_name
    ORDER BY c_last_name, sales
    LIMIT 100
"""


@query("tpcds_q23b_best_customer_names", oracle=_Q23B_TMPL)
def tpcds_q23b_best_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23b shape (tpcds/q23b.sql): the full two-CTE form — the
    q23a CTE chain (frequent items; best customers via a HAVING threshold
    read from a scalar max-CTE) with q23b's final block: the two-channel
    UNION ALL re-joined to customer and reported per customer name,
    top-100 (q23a collapses to one scalar instead —
    tpcds_q23_frequent_best in tpcds_sub.py). c_name is unique per
    customer, so the ORDER BY is deterministic under LIMIT."""
    _views(spark, sf_dir)
    return spark.sql(_Q23B_TMPL)


# --------------------------------------------------------------------------
# q69 / q35: channel-absence and channel-presence demographics
# --------------------------------------------------------------------------

_Q69_TMPL = """
    SELECT c_mktsegment AS cd_gender,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS cd_purchase_estimate,
           count(*) AS cnt1
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_19', 'NATION_11', 'NATION_10', 'NATION_20',
                     'NATION_17', 'NATION_3', 'NATION_7', 'NATION_14')
      AND EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE o_custkey = c.c_custkey AND l_returnflag = 'N'
                    AND year(l_shipdate) = 1998
                    AND month(l_shipdate) BETWEEN 4 AND 6)
      AND NOT EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c.c_custkey AND l_returnflag = 'A'
                        AND year(l_shipdate) = 1998
                        AND month(l_shipdate) BETWEEN 4 AND 6)
      AND NOT EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c.c_custkey AND l_returnflag = 'R'
                        AND year(l_shipdate) = 1998
                        AND month(l_shipdate) BETWEEN 4 AND 6)
    GROUP BY c_mktsegment, CAST(floor(c_acctbal / 2000) AS BIGINT)
    ORDER BY cd_gender, cd_purchase_estimate
    LIMIT 100
"""


@query("tpcds_q69_channel_absence", oracle=_Q69_TMPL)
def tpcds_q69_channel_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q69 shape (tpcds/q69.sql): demographics of customers who
    bought in-store but NOT by web and NOT by catalog in the window — the
    conjunctive NOT-EXISTS dual of q10's OR-of-EXISTS (channel encoding
    per tpcds_q10_disjunctive_exists: returnflag N/A/R). Decorrelates to
    one semi join + two anti joins — never per-customer re-scans.
    Account-balance bands stand in for cd_purchase_estimate."""
    _views(spark, sf_dir)
    return spark.sql(_Q69_TMPL)


_Q35_TMPL = """
    SELECT n_name AS ca_state,
           c_mktsegment AS cd_gender,
           count(*) AS cnt1,
           CAST(min(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS min_bal,
           CAST(max(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_bal,
           avg(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS avg_bal
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE o_custkey = c.c_custkey AND l_returnflag = 'N'
                    AND year(l_shipdate) = 1998 AND quarter(l_shipdate) < 4)
      AND (EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE o_custkey = c.c_custkey AND l_returnflag = 'A'
                     AND year(l_shipdate) = 1998 AND quarter(l_shipdate) < 4)
           OR EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c.c_custkey AND l_returnflag = 'R'
                        AND year(l_shipdate) = 1998 AND quarter(l_shipdate) < 4))
    GROUP BY n_name, c_mktsegment
    ORDER BY ca_state, cd_gender
    LIMIT 100
"""


@query("tpcds_q35_channel_presence_stats", oracle=_Q35_TMPL)
def tpcds_q35_channel_presence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q35 shape (tpcds/q35.sql): customers active in-store AND in
    at least one of the other two channels (conjunctive EXISTS over a
    disjunctive EXISTS pair — one semi join + one ExistenceJoin pair),
    reported as min/max/avg account-balance triplets per (state, segment)
    — the stat-triplet flavor that distinguishes q35 from q10's counts.
    Balances aggregate as exact integer cents."""
    _views(spark, sf_dir)
    return spark.sql(_Q35_TMPL)
