"""JDBC source/sink (SURVEY.md §2.1: JDBCRDD partitioned reads + predicate
pushdown, reference sql/core/.../datasources/jdbc/JDBCRDD.scala) — exercised
against Spark's bundled embedded Derby (no external DB needed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfulltextquery_spark.plans import physical_plan
from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    src = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    src.write.format("jdbc").option("url", url).option("dbtable", "customers").option(
        "driver", DRIVER
    ).mode("overwrite").save()
    return url


def test_jdbc_round_trip(spark, jdbc_url):
    src = load_table(spark, SF_DIR, "customer")
    back = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", "customers")
        .option("driver", DRIVER)
        .load()
    )
    assert back.count() == src.count()
    a = {r.C_CUSTKEY if hasattr(r, "C_CUSTKEY") else r.c_custkey for r in back.collect()}
    b = {r.c_custkey for r in src.collect()}
    assert a == b


def test_jdbc_partitioned_read(spark, jdbc_url):
    """Partitioned JDBC scan (partitionColumn/lowerBound/upperBound/
    numPartitions) — N parallel range-queries, the reference's JDBCRDD
    partitioning model."""
    df = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", "customers")
        .option("driver", DRIVER)
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "0")
        .option("upperBound", "200")
        .option("numPartitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == load_table(spark, SF_DIR, "customer").count()


def test_jdbc_predicate_pushdown(spark, jdbc_url):
    df = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", "customers")
        .option("driver", DRIVER)
        .load()
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    plan = physical_plan(df)
    # filter is pushed into the generated SQL (RowDataSourceScanExec shows
    # PushedFilters for JDBC relations)
    assert "PushedFilters" in plan and "c_acctbal" in plan.split("PushedFilters")[1][:200]
    rows = df.collect()
    assert all(r.c_acctbal > 5000 for r in rows)


def test_jdbc_aggregate_pushdown(spark, jdbc_url):
    """DSv2 JDBC aggregate pushdown: through the JDBCTableCatalog (the v2
    read path — format('jdbc') stays v1) the groupBy/count/max executes
    INSIDE the database; the scan node advertises PushedAggregates."""
    spark.conf.set(
        "spark.sql.catalog.derbycat",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set("spark.sql.catalog.derbycat.url", jdbc_url)
    spark.conf.set("spark.sql.catalog.derbycat.driver", DRIVER)
    spark.conf.set("spark.sql.catalog.derbycat.pushDownAggregate", "true")

    df = spark.table("derbycat.APP.CUSTOMERS")
    agg = df.groupBy("C_NATIONKEY").agg(
        F.count(F.lit(1)).alias("n"), F.max("C_ACCTBAL").alias("mx")
    )
    plan = physical_plan(agg)
    assert "PushedAggregates" in plan and "COUNT" in plan.upper(), plan
    want = (
        load_table(spark, SF_DIR, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.max("c_acctbal").alias("mx"))
    )
    got = {(r[0], r[1], round(r[2], 2)) for r in agg.collect()}
    exp = {(r[0], r[1], round(r[2], 2)) for r in want.collect()}
    assert got == exp
