"""Aggregation coverage (SURVEY.md §2.4).

Reference parity: Sum/Average/Count/Min/Max (catalyst expressions/aggregate/
Sum.scala:27 etc.), First/Last (First.scala:36), central moments
(CentralMomentAgg.scala:137-213), Corr/Covariance (Corr.scala:33,
Covariance.scala:81), HyperLogLogPlusPlus (HyperLogLogPlusPlus.scala:54),
ApproximatePercentile (ApproximatePercentile.scala:67), CollectList/Set
(collect.scala:85,108), grouping sets / cube / rollup (grouping.scala:41-61 +
ExpandExec.scala:36), pivot (RelationalGroupedDataset.scala:314), distinct
rewrite (RewriteDistinctAggregates.scala).

All are single-shuffle hash aggregations with map-side partial combine —
the plan shape that scales linearly with input.

DuckDB-parity notes: skewness/kurtosis differ between engines (Spark uses
population moments, DuckDB sample-adjusted), so those oracles spell out the
moment formula; approx sketches (HLL++, approx percentile) get rows-only
checks plus an exact companion query that IS oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "agg_minmax_first_last",
    oracle="""
    SELECT l_returnflag,
           min(l_quantity)      AS min_qty,
           max(l_quantity)      AS max_qty,
           min(l_shipdate)      AS first_ship,
           max(l_shipdate)      AS last_ship,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_minmax_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "agg_first_last_deterministic",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, o_orderpriority, l_extendedprice, l_discount,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_extendedprice, l_discount) AS rn
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_orderkey < 1000
    )
    SELECT l_orderkey,
           min(o_orderpriority) AS prio,
           max(CASE WHEN rn = 1 THEN l_extendedprice END) AS line1_price,
           max(CASE WHEN rn = 1 THEN l_discount END)      AS line1_disc
    FROM ranked GROUP BY l_orderkey
    """,
)
def agg_first_last_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregate First/Last forms themselves (reference aggregate/First.scala:38,
    Last.scala:37, incl. ignoreNulls), demonstrated deterministically:
    first() of a value constant within its group, and first/last with
    ignoreNulls=True over a column with exactly ONE non-null per group
    (row_number()==1 under a total order) — the shapes where their result
    is well-defined regardless of partition order, hence oracle-checkable
    (min/max twins in SQL)."""
    from pyspark.sql import Window as W

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    o = load_table(spark, sf_dir, "orders")
    j = l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_discount"
    )
    ranked = j.withColumn("rn", F.row_number().over(w))
    line1 = F.when(F.col("rn") == 1, F.col("l_extendedprice"))
    line1_disc = F.when(F.col("rn") == 1, F.col("l_discount"))
    return ranked.groupBy("l_orderkey").agg(
        F.first("o_orderpriority").alias("prio"),
        F.first(line1, ignorenulls=True).alias("line1_price"),
        F.last(line1_disc, ignorenulls=True).alias("line1_disc"),
    )


@query(
    "agg_central_moments",
    oracle="""
    WITH base AS (
      SELECT o_totalprice, avg(o_totalprice) OVER () AS mu FROM orders
    ), mom AS (
      SELECT sum(pow(o_totalprice - mu, 2)) / count(*) AS m2,
             sum(pow(o_totalprice - mu, 3)) / count(*) AS m3,
             sum(pow(o_totalprice - mu, 4)) / count(*) AS m4,
             stddev_samp(o_totalprice) AS sds,
             stddev_pop(o_totalprice)  AS sdp,
             var_samp(o_totalprice)    AS vs
      FROM base
    )
    SELECT round(sds, 4) AS sd_samp,
           round(sdp, 4) AS sd_pop,
           round(vs, 2)  AS var_s,
           round(m3 / pow(m2, 1.5), 4)    AS skew,
           round(m4 / pow(m2, 2) - 3, 4)  AS kurt
    FROM mom
    """,
)
def agg_central_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/skewness/kurtosis (reference CentralMomentAgg.scala:137-213).
    Spark's skewness/kurtosis are population moments (g1, g2 = m4/m2²−3); the
    oracle reproduces that formula since DuckDB's builtins are sample-adjusted."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("o_totalprice"), 4).alias("sd_pop"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_s"),
        F.round(F.skewness("o_totalprice"), 4).alias("skew"),
        F.round(F.kurtosis("o_totalprice"), 4).alias("kurt"),
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 6)      AS corr_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_pop,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_samp
    FROM lineitem
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corr + covariance co-moments (reference Corr.scala:33, Covariance.scala:81)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cov_pop"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_samp"),
    )


@query(
    "agg_distinct_exact",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)  AS n_cust,
           count(DISTINCT o_orderstatus) AS n_status,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates — triggers the reference's Expand-based
    RewriteDistinctAggregates (optimizer/RewriteDistinctAggregates.scala)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_approx_sketches",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS hll_within_3rsd,
           true AS p50_within_tol,
           true AS p25_within_tol,
           true AS p75_within_tol
    FROM lineitem
    """,
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx count-distinct (reference HyperLogLogPlusPlus.scala:54)
    and approximate percentile (ApproximatePercentile.scala:67). Sketch
    estimates are engine-specific, so the driver-checked output is the
    *accuracy contract*, not the estimate: booleans asserting the HLL
    estimate is within 3·rsd of the exact distinct count and each approx
    percentile is within 0.5% of the exact interpolated percentile (both
    sketches guarantee far tighter: measured ≤0.95% / ≤0.06% at sf0.01).
    The exact distinct count rides along as a value-checked column."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("a_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile_approx("l_extendedprice", 0.25, 10000).alias("a25"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("e25"),
        F.percentile_approx("l_extendedprice", 0.75, 10000).alias("a75"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("e75"),
    )

    def _within(a: str, e: str, tol: float):
        return (F.abs(F.col(a) - F.col(e)) / F.col(e)) < tol

    return agg.select(
        "exact_parts",
        _within("a_parts", "exact_parts", 0.06).alias("hll_within_3rsd"),
        _within("a50", "e50", 0.005).alias("p50_within_tol"),
        _within("a25", "e25", 0.005).alias("p25_within_tol"),
        _within("a75", "e75", 0.005).alias("p75_within_tol"),
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (continuous interpolation) — matches DuckDB
    quantile_cont; reference delegates `percentile` to Hive UDAF
    (HiveSessionCatalog.scala:227-230), modern Spark has F.percentile."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
    )


@query(
    "agg_collect_list_set",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',')          AS nations,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_set
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollectList/CollectSet (reference collect.scala:85,108) — sorted for
    cross-engine determinism (collect order is partition-dependent)."""
    n = load_table(spark, sf_dir, "nation")
    # array outputs are joined to strings for the comparison layer — numpy
    # (Spark->pandas) and list (DuckDB) render differently under naive hashing
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias("nations_set"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nation_csv
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation = concat_ws over a sorted collect_list."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nation_csv")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — reference GroupingSets logical + ExpandExec
    (basicLogicalOperators.scala:622, ExpandExec.scala:36)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           cast(grouping(o_orderstatus) AS int)  AS g_status,
           cast(grouping(o_orderpriority) AS int) AS g_prio,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() markers (reference grouping.scala:49)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               cast(grouping(o_orderstatus) AS int)  AS g_status,
               cast(grouping(o_orderpriority) AS int) AS g_prio,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_O,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (reference PivotFirst.scala:71, RelationalGroupedDataset.scala:314)
    with explicit value list — the scalable form (no value-discovery scan)."""
    l = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_quantity) > 150
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_partkey")
        .agg(
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 150)
        .select("l_partkey", F.round(F.col("_raw_qty"), 2).alias("total_qty"))
    )


@query(
    "stat_describe",
    oracle="""
    SELECT count(o_totalprice)                 AS n,
           round(avg(o_totalprice), 4)         AS mean,
           round(stddev_samp(o_totalprice), 4) AS sd,
           min(o_totalprice)                   AS min_v,
           max(o_totalprice)                   AS max_v
    FROM orders
    """,
)
def stat_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-equivalent summary (reference Dataset.scala:1944,
    StatFunctions.scala) in typed form (describe() returns strings)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.count("o_totalprice").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("mean"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.min("o_totalprice").alias("min_v"),
        F.max("o_totalprice").alias("max_v"),
    )


@query(
    "stat_crosstab",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')   AS p2,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table (reference StatFunctions.crossTabulate:178) in
    deterministic pivot form."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("p1"),
        F.count(F.when(F.col("o_orderpriority") == "2-HIGH", 1)).alias("p2"),
        F.count(F.when(F.col("o_orderpriority") == "3-MEDIUM", 1)).alias("p3"),
    )


@query(
    "agg_mergeable_sketches",
    oracle="""
    WITH j AS (
        SELECT c_nationkey, l_partkey
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    )
    SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_groups,
           CAST(count(DISTINCT l_partkey) AS BIGINT)   AS exact_global_parts,
           true AS union_within_5pct
    FROM j
    """,
)
def agg_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distributed sketches — the pattern that makes approximate
    aggregation scale: per-group sketches built in one pass, then UNIONED
    (not recomputed) into a global estimate. Here: per-nation Apache
    DataSketches HLL (F.hll_sketch_agg, Spark 3.5+ — the modern successor
    of the reference's HyperLogLogPlusPlus.scala:54) re-aggregated with
    hll_union_agg. Sketch bytes are engine-specific, so the driver-checked
    output is the merge contract: the union-of-sketches estimate lands
    within 5% of the exact global distinct (default lgK=12 → rsd≈1.6%;
    measured ≤0.45%), plus two exactly-checked columns (group count, exact
    global distinct). Per-group accuracy is pinned in
    tests/test_properties.py.

    At 100 TB: sketches make the second aggregation O(groups × sketch_size)
    instead of a second pass over raw data — the same partial/final
    discipline as HashAggregateExec (AggUtils.scala:80), but re-mergeable
    across *queries* (store per-partition sketches, union at read time)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    merged = (
        joined.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        )
    )
    exact = joined.agg(F.countDistinct("l_partkey").alias("exact_global_parts"))
    # both sides are single-row aggregates → a 1×1 cartesian, no shuffle risk
    return merged.crossJoin(exact).select(
        "n_groups",
        "exact_global_parts",
        (
            F.abs(F.col("est") - F.col("exact_global_parts"))
            / F.col("exact_global_parts")
            < 0.05
        ).alias("union_within_5pct"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT l_returnflag AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches frequent-items (approx_top_k, Spark 4.x — the modern
    heavy-hitters sketch; reference-era analogue is the Hive histogram /
    count-based top-k). On a column whose cardinality is far below the
    sketch capacity the counts are EXACT by the sketch's guarantee, so the
    oracle is plain GROUP BY counts — a value check of the sketch path
    end-to-end (build → serialize → merge → extract)."""
    l = load_table(spark, sf_dir, "lineitem")
    tk = l.agg(F.expr("approx_top_k(l_returnflag, 10)").alias("tk"))
    return tk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
    )


@query(
    "agg_theta_set_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
         r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT CAST((SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM r)) AS BIGINT)
             AS exact_union,
           CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM r)) AS BIGINT)
             AS exact_intersect,
           true AS union_within_5pct,
           true AS intersect_within_5pct
    """,
)
def agg_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches, Spark 4.x): the MERGEABLE
    distinct-count sketch that also supports SET ALGEBRA — union,
    intersection, difference of sketches built on different partitions of
    the data, the capability HLL lacks (reference's HyperLogLogPlusPlus
    .scala:54 can only union). Driver-checked output: exact union/intersect
    cardinalities (value-checked) plus the sketch estimates' 5% accuracy
    contract (lgK=12 → rsd≈1.6%; set-op error compounds, 5% ≈ 3σ)."""
    l = load_table(spark, sf_dir, "lineitem")
    flag = (
        l.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.expr("theta_sketch_agg(l_partkey)").alias("s"))
    )
    est = flag.agg(
        F.expr("theta_sketch_estimate(theta_union_agg(s))").alias("u_est"),
        F.expr("theta_sketch_estimate(theta_intersection_agg(s))").alias("i_est"),
    )
    a = l.filter("l_returnflag = 'A'").select("l_partkey")
    r = l.filter("l_returnflag = 'R'").select("l_partkey")
    exact = (
        a.union(r).agg(F.countDistinct("l_partkey").alias("exact_union"))
        .crossJoin(
            a.intersect(r).agg(F.count(F.lit(1)).alias("exact_intersect"))
        )
    )
    return est.crossJoin(exact).select(
        "exact_union",
        "exact_intersect",
        (
            F.abs(F.col("u_est") - F.col("exact_union")) / F.col("exact_union") < 0.05
        ).alias("union_within_5pct"),
        (
            F.abs(F.col("i_est") - F.col("exact_intersect"))
            / F.col("exact_intersect")
            < 0.05
        ).alias("intersect_within_5pct"),
    )


@query(
    "agg_argmax_argmin",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS best_order,
           arg_min(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS worst_order,
           round(max(o_totalprice), 2) AS best_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_argmax_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin, Spark 3.3+ — the one-pass form of the
    aggregate-then-join-back pattern in q2/q15): the orderkey of each
    customer's most/least expensive order. The ordering key is made
    tie-free (price + εꞏorderkey) so the arg is engine-deterministic."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_totalprice") + F.col("o_orderkey") * 1e-9
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", key).alias("best_order"),
        F.min_by("o_orderkey", key).alias("worst_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@query(
    "agg_boolean_conditional",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25.5) AS BIGINT) AS n_bulk,
           bool_and(l_extendedprice > 0)        AS all_positive,
           bool_or(l_discount >= 0.085)         AS any_deep_discount,
           CAST(sum(CASE WHEN l_tax < 0.005 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_boolean_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: count_if, bool_and (= every),
    bool_or (= any/some) — the SQL-2023 additions layered on the same
    partial+final HashAggregate plan as Sum/Count (AggUtils.scala:80).
    Thresholds sit OFF representable data points (25.5 for the integral
    quantity domain, 0.085 for the 0.01-step discount domain, <0.005 for
    tax==0) so a DuckDB decimal-literal vs Spark double-literal comparison
    can never flip a row at the boundary — the round-1 tie discipline."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25.5).alias("n_bulk"),
        F.bool_and(F.col("l_extendedprice") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") >= 0.085).alias("any_deep_discount"),
        F.sum(F.when(F.col("l_tax") < 0.005, 1).otherwise(0)).alias("n_taxfree"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS bitmap_distinct,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-based EXACT distinct counting (Spark 3.5 bitmap functions):
    per-group bitmaps of bucketed key positions OR-merge like sketches but
    count exactly — the third point on the distinct-count spectrum
    (exact-shuffle / HLL-approx / bitmap-exact-mergeable). Bitmaps are
    exact, so the driver oracle is count(DISTINCT) itself for BOTH output
    columns — the bitmap path and the shuffle path must agree to the row."""
    l = load_table(spark, sf_dir, "lineitem")
    # one bitmap per (group, 32k-value bucket): bitmap_bucket_number splits
    # the key domain, bitmap_bit_position indexes within the bucket
    per_bucket = l.groupBy(
        "l_returnflag", F.bitmap_bucket_number("l_partkey").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("l_partkey")).alias("bm"))
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count("bm")).alias("bitmap_distinct"))
        .join(exact, "l_returnflag")
    )


@query(
    "agg_histogram_numeric",
    oracle="""
    SELECT CAST(8 AS BIGINT) AS n_bins,
           round(CAST(count(*) AS DOUBLE), 2)    AS total_weight,
           round(CAST(min(l_quantity) AS DOUBLE), 2) AS lo_center_floor,
           round(CAST(max(l_quantity) AS DOUBLE), 2) AS hi_center_ceil
    FROM lineitem
    """,
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric — the aggregate the reference delegates to Hive
    (HiveSessionCatalog.scala:227-230), native since Spark 3.3. Bin centers
    are data-adaptive (engine-specific placement), so the driver-checked
    output is the histogram's deterministic invariants: bin count equals the
    requested 8, total bin weight equals row count exactly (weights are
    integer counts), and the extreme bin centers clamp to the data min/max
    (a NumericHistogram centroid is a mean of in-bin points, so the lowest
    center can't go below min and the highest can't exceed max — projected
    via clamping so the oracle can state min/max directly)."""
    l = load_table(spark, sf_dir, "lineitem")
    hist = l.agg(
        F.expr("histogram_numeric(l_quantity, 8)").alias("h"),
        F.min("l_quantity").cast("double").alias("qmin"),
        F.max("l_quantity").cast("double").alias("qmax"),
    )
    lo = F.element_at(F.col("h"), 1)["x"].cast("double")
    hi = F.element_at(F.col("h"), -1)["x"].cast("double")
    return hist.select(
        F.size("h").cast("long").alias("n_bins"),
        F.round(
            F.aggregate(F.col("h"), F.lit(0.0), lambda acc, s: acc + s["y"]), 2
        ).alias("total_weight"),
        # clamp-project: equals qmin/qmax iff the invariant holds
        F.round(F.least(lo, F.col("qmin")), 2).alias("lo_center_floor"),
        F.round(F.greatest(hi, F.col("qmax")), 2).alias("hi_center_ceil"),
    )


@query(
    "agg_mode_median_regr",
    oracle="""
    SELECT l_returnflag,
           mode(l_linenumber)                                  AS mode_line,
           round(median(l_extendedprice), 4)                   AS median_price,
           round(regr_slope(l_extendedprice, l_quantity), 6)   AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)      AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_mode_median_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate tail: mode (most frequent — l_linenumber has a
    strict winner so ties can't bite), exact interpolated median, and the
    Hive-era linear-regression family regr_slope/intercept/r2/count
    (reference delegates these to Hive UDAFs via HiveSessionCatalog
    .scala:227-230; modern Spark has them native, SPARK-37623). All
    partial-aggregable moment sums — one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.mode("l_linenumber").alias("mode_line"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )
