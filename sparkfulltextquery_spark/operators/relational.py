"""Core relational spine: scan → filter → project → join → agg → sort → limit.

Parity targets (reference file:line):
- FileSourceScanExec  sql/core/.../execution/DataSourceScanExec.scala:141
- FilterExec/ProjectExec  sql/core/.../execution/basicPhysicalOperators.scala:85/36
- HashAggregateExec  sql/core/.../execution/aggregate/HashAggregateExec.scala:38
- BroadcastHashJoinExec  sql/core/.../execution/joins/BroadcastHashJoinExec.scala:38
- TakeOrderedAndProjectExec  sql/core/.../execution/limit.scala:114

Scale notes: dimension tables (region/nation/supplier/part/customer) are
broadcast; the only shuffles are the aggregation exchanges on the grouping
keys. At 100 TB the lineitem scan dominates — filters and column pruning are
pushed to parquet (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash agg (partial+final, map-side combine).

    Reference: HashAggregateExec w/ codegen fast maps
    (sql/core/.../aggregate/HashAggregateExec.scala:38); the partial/final
    split is AggUtils.planAggregateWithoutDistinct (AggUtils.scala:80).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way join + agg — the spine of SURVEY.md §2.

    Join strategy at scale: region/nation/supplier/customer are broadcast
    (reference JoinSelection canBroadcast, SparkStrategies.scala:116), so
    the fact-table join chain has NO shuffle until the final groupBy(n_name)
    exchange — which AQE coalesces. Catalyst reorders the broadcast joins.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → joins → agg → top-k.

    The orderBy(...).limit(k) is planned as TakeOrderedAndProjectExec
    (reference sql/core/.../execution/limit.scala:114): per-partition bounded
    heaps merged on the driver — never a global sort, which is the only
    top-k strategy that survives 100 TB.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterExec + ProjectExec, with both predicate and column pruning pushed
    into the parquet scan (reference ParquetFilters.scala:171). The scan must
    read only 6 of 11 lineitem columns — asserted in tests/test_plans.py."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            # round at 4dp = the product's exact decimal count (2dp × 2dp),
            # so rounding is tie-free and bit-identical across engines
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
        )
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure top-k (TakeOrderedAndProjectExec) with a deterministic tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "range_tvf_sum",
    oracle="""
    SELECT count(*) AS n, CAST(sum(CASE WHEN i % 7 = 0 THEN i END) AS BIGINT) AS sum7
    FROM (SELECT unnest(range(0, 100000)) AS i)
    """,
)
def range_tvf_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeExec (reference basicPhysicalOperators.scala:317): codegen'd long
    range generator split across partitions; the classic codegen benchmark
    shape (range/filter/sum, MiscBenchmark.scala:38)."""
    return spark.range(0, 100000).select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("id") % 7 == 0, F.col("id"))).alias("sum7"),
    )


@query(
    "local_scan_union_inline",
    oracle="""
    SELECT k, v FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(k, v)
    """,
)
def local_scan_union_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalTableScanExec (reference LocalTableScanExec.scala:29): driver-local
    rows — the VALUES-list scan."""
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")


@query(
    "sample_fraction",
    oracle="SELECT true AS sample_in_bounds, true AS keys_unique",
)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SampleExec (reference basicPhysicalOperators.scala:229): Bernoulli
    sample with a fixed seed — deterministic within Spark, not across
    engines, so the driver-checked output is the sampling CONTRACT: the
    sample size concentrates around fraction·N (bounds [0.04, 0.16]·N are
    >7σ at the smallest SF) and sampled keys are source keys, unique. The
    per-row sample remains exercised — the invariants aggregate it."""
    o = load_table(spark, sf_dir, "orders")
    s = o.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")
    stats = s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )
    total = o.agg(F.count(F.lit(1)).alias("n_total"))
    return stats.crossJoin(total).select(
        ((F.col("n_sampled") >= 0.04 * F.col("n_total"))
         & (F.col("n_sampled") <= 0.16 * F.col("n_total"))).alias("sample_in_bounds"),
        (F.col("n_keys") == F.col("n_sampled")).alias("keys_unique"),
    )


@query(
    "na_fill_drop",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'UNKNOWN') AS priority,
           CASE WHEN o_totalprice > 100000 THEN o_totalprice END    AS big_price
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NOT NULL
    """,
)
def na_fill_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling surface: na.fill / na.drop / nullif / coalesce
    (reference nullExpressions.scala; DataFrameNaFunctions)."""
    o = load_table(spark, sf_dir, "orders")
    with_nulls = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("priority"),
        F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).alias("big_price"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nn"),
    )
    return (
        with_nulls.na.drop(subset=["status_nn"])
        .na.fill({"priority": "UNKNOWN"})
        .select("o_orderkey", "priority", "big_price")
    )
