"""DDL surface (reference DDLStrategy, core execution/SparkStrategies.scala:418
+ SparkSqlParser DDL rules): CTAS, INSERT INTO, SHOW TABLES/DESCRIBE against
the session catalog, with data living as managed parquet tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR


def test_ctas_insert_show_describe(spark, tmp_path):
    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("nation_v")

    spark.sql("DROP TABLE IF EXISTS nation_small")
    spark.sql(
        "CREATE TABLE nation_small USING parquet AS "
        "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey < 5"
    )
    try:
        assert spark.table("nation_small").count() == 5

        # INSERT INTO appends through the same analyzer path
        spark.sql(
            "INSERT INTO nation_small "
            "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey = 7"
        )
        assert spark.table("nation_small").count() == 6

        # catalog introspection
        names = [t.name for t in spark.catalog.listTables()]
        assert "nation_small" in names
        desc = {r.col_name: r.data_type for r in spark.sql("DESCRIBE nation_small").collect()}
        assert desc["n_nationkey"] == "int"
        assert desc["n_name"] == "string"

        # CTAS result participates in planning like any table (pushdown)
        df = spark.table("nation_small").filter(F.col("n_nationkey") >= 3)
        assert df.count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_small")
    assert "nation_small" not in [t.name for t in spark.catalog.listTables()]


def test_analyze_table_cbo_statistics(spark):
    """ANALYZE TABLE + cost-based optimizer surface (reference
    command/AnalyzeTableCommand.scala, AnalyzeColumnCommand.scala;
    statsEstimation/FilterEstimation.scala): table stats land in the
    catalog, column stats carry min/max/ndv, and with CBO enabled the
    optimizer derives a cardinality estimate for a filter — the input
    join-reordering and broadcast decisions consume at scale."""
    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("nation_v")
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    spark.sql("CREATE TABLE cbo_nation USING parquet AS SELECT * FROM nation_v")
    try:
        spark.sql(
            "ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name"
        )

        # table-level stats visible in the catalog
        stats_row = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE EXTENDED cbo_nation").collect()
        }.get("Statistics", "")
        assert "25 rows" in stats_row, stats_row

        # column-level stats: min/max/distinct_count
        col = {
            r.info_name: r.info_value
            for r in spark.sql("DESCRIBE EXTENDED cbo_nation n_nationkey").collect()
        }
        assert col["min"] == "0" and col["max"] == "24"
        assert col["distinct_count"] == "25"

        # CBO consumes them: exact rowCount on the scan, and a derived
        # (not just propagated) estimate through a filter
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            scan_rc = (
                spark.table("cbo_nation")._jdf.queryExecution()
                .optimizedPlan().stats().rowCount()
            )
            assert scan_rc.get() == 25
            filt_rc = (
                spark.table("cbo_nation").filter("n_nationkey < 5")
                ._jdf.queryExecution().optimizedPlan().stats().rowCount()
            )
            # selectivity estimate from min/max/ndv: close to the true 5,
            # far below the table's 25
            assert filt_rc.isDefined() and 1 <= filt_rc.get() <= 10
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_parameterized_sql(spark):
    """Parameterized spark.sql: named and positional binding (injection-safe
    literal substitution at parse time — modern analyzer surface)."""
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders_v")
    named = spark.sql(
        "SELECT count(*) AS n FROM orders_v "
        "WHERE o_totalprice > :lo AND o_orderpriority = :prio",
        args={"lo": 100000, "prio": "1-URGENT"},
    ).collect()[0].n
    positional = spark.sql(
        "SELECT count(*) AS n FROM orders_v "
        "WHERE o_totalprice > ? AND o_orderpriority = ?",
        args=[100000, "1-URGENT"],
    ).collect()[0].n
    direct = (
        load_table(spark, SF_DIR, "orders")
        .filter((F.col("o_totalprice") > 100000) & (F.col("o_orderpriority") == "1-URGENT"))
        .count()
    )
    assert named == positional == direct > 0
