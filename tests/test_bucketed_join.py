"""Bucketed co-located joins: the 100 TB fact⋈fact strategy.

The orders⋈lineitem join shuffles both sides on the order key. Persisting
both tables bucketed on that key (reference DataFrameWriter.bucketBy,
sql/core/.../DataFrameWriter.scala:170) makes the join exchange-free:
matching buckets are read co-located and sort-merge joined in place.
This test materializes both, asserts the plan has NO shuffle exchange,
and checks results equal the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfulltextquery_spark.plans import count_exchanges, physical_plan
from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    (
        o.repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .option("path", f"file://{base}/orders_b")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        l.repartition(8, "l_orderkey")
        .write.mode("overwrite")
        .option("path", f"file://{base}/lineitem_b")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    return "orders_b", "lineitem_b"


def _joined(spark, o_name, l_name):
    o = spark.table(o_name)
    l = spark.table(l_name)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    # at test scale Spark would just broadcast the small side (also shuffle-
    # free, but not what we're proving) — disable broadcast to observe the
    # bucketed path a 100 TB fact⋈fact join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark, o_name, l_name)
        plan = physical_plan(df)
        # the join itself must not exchange; the only allowed exchange is
        # the final aggregation
        n_ex = count_exchanges(df)
        assert n_ex <= 1, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    bucketed = {
        (r.o_orderpriority): (r.n_lines, r.total)
        for r in _joined(spark, o_name, l_name).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.o_orderpriority): (r.n_lines, r.total)
        for r in (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_extendedprice"), 2).alias("total"),
            )
            .collect()
        )
    }
    assert bucketed == plain
