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
