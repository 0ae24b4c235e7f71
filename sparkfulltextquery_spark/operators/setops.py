"""Set-operation coverage (SURVEY.md §2.7).

Reference: Union (bag semantics, basicLogicalOperators.scala:200 → UnionExec),
Intersect → left-semi + distinct (Optimizer.scala:1065), Except → left-anti +
distinct (Optimizer.scala:1086), Distinct → Aggregate (Optimizer.scala:1047).

UnionExec is shuffle-free (partition concat); intersect/except cost one
shuffle each for the distinct — same plan Catalyst produces today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


def _segment(spark, sf_dir, seg):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == seg).select("c_custkey", "c_nationkey")


@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 8000
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics union (duplicates preserved) — `df.union` == UNION ALL,
    a semantic the reference inherits from Spark (Dataset.scala:1513)."""
    c = load_table(spark, sf_dir, "customer")
    a = _segment(spark, sf_dir, "BUILDING")
    b = c.filter(F.col("c_acctbal") > 8000).select("c_custkey", "c_nationkey")
    return a.union(b)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 8000
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = _segment(spark, sf_dir, "BUILDING")
    b = c.filter(F.col("c_acctbal") > 8000).select("c_custkey", "c_nationkey")
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set) — Catalyst rewrites to left-semi join + distinct,
    mirroring reference Optimizer.scala:1065."""
    a = _segment(spark, sf_dir, "BUILDING").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    b = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set) — left-anti join + distinct (reference Optimizer.scala:1086).
    The right side is filtered to urgent orders: every customer has some
    order, so an unfiltered EXCEPT would be vacuously empty."""
    a = _segment(spark, sf_dir, "BUILDING").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return a.exceptAll(o.select(F.col("o_custkey").alias("c_custkey"))).distinct()


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct → Aggregate rewrite (reference Optimizer.scala:1047)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()


@query(
    "dropdup_deterministic",
    oracle="""
    SELECT o_custkey, min(o_orderkey) AS first_orderkey
    FROM orders GROUP BY o_custkey
    """,
)
def dropdup_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates keeps an arbitrary row (reference Dataset.scala:1869
    builds first()-aggregates); for cross-engine determinism the engine's
    canonical form is groupBy + min — same single-shuffle plan."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(F.min("o_orderkey").alias("first_orderkey"))


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag): per-key multiplicity = min(count_left,
    count_right). Catalyst rewrites it to a row_number-tagged join (modern
    superset of the reference's set-only Intersect, Optimizer.scala:1065)."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "R").select("l_suppkey", "l_quantity")
    b = l.filter(F.col("l_returnflag") == "A").select("l_suppkey", "l_quantity")
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey, l_quantity FROM (
      SELECT l_suppkey, l_quantity FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_suppkey, l_quantity FROM lineitem WHERE l_returnflag = 'A'
    )
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag): per-key multiplicity = max(count_left - count_right,
    0) — duplicates surviving proportionally, unlike the distinct-collapsing
    EXCEPT above."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "R").select("l_suppkey", "l_quantity")
    b = l.filter(F.col("l_returnflag") == "A").select("l_suppkey", "l_quantity")
    return a.exceptAll(b)


@query(
    "setop_union_by_name",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL BY NAME
    SELECT c_acctbal, c_custkey, CAST(NULL AS INTEGER) AS c_nationkey
    FROM customer WHERE c_acctbal < 0
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-evolution union — columns
    align by NAME (not position), absent columns null-fill. The modern form
    of the reference's positional Union (basicLogicalOperators.scala:200)
    for heterogeneous-schema corpus shards."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    b = c.filter(F.col("c_acctbal") < 0).select("c_acctbal", "c_custkey")
    return a.unionByName(b, allowMissingColumns=True)
