"""Hive catalog support (SURVEY.md §2.1: metastore catalog, sql/hive/) —
enableHiveSupport with an embedded Derby metastore. Runs in a subprocess
because the catalog implementation is fixed at first-session creation."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest


@pytest.mark.heavy
def test_hive_metastore_table_round_trip(tmp_path):
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("hive-test")
            .config("spark.sql.warehouse.dir", "file://{tmp_path}/wh")
            .config("javax.jdo.option.ConnectionURL",
                    "jdbc:derby:;databaseName={tmp_path}/metastore_db;create=true")
            .config("spark.ui.enabled", "false")
            .enableHiveSupport()
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        spark.sql("CREATE DATABASE IF NOT EXISTS sftq_db")
        spark.sql(
            "CREATE TABLE sftq_db.regions (r_regionkey INT, r_name STRING) USING parquet"
        )
        spark.sql(
            "INSERT INTO sftq_db.regions VALUES (0, 'AFRICA'), (1, 'AMERICA'), (2, 'ASIA')"
        )
        rows = spark.sql(
            "SELECT r_name FROM sftq_db.regions ORDER BY r_regionkey"
        ).collect()
        assert [r.r_name for r in rows] == ["AFRICA", "AMERICA", "ASIA"], rows
        tables = [t.name for t in spark.catalog.listTables("sftq_db")]
        assert "regions" in tables
        print("HIVE_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "HIVE_OK" in out.stdout, f"stdout={out.stdout[-800:]}\nstderr={out.stderr[-800:]}"


@pytest.mark.heavy
def test_hive_udf_udaf_udtf_passthrough(tmp_path):
    """Hive UDF/UDAF/UDTF fallthrough (reference hiveUDFs.scala:41,114,183;
    HiveSessionCatalog.scala:227-230): CREATE TEMPORARY FUNCTION against
    Hive classes, wrapped by HiveSimpleUDF/HiveGenericUDF/HiveUDAFFunction/
    HiveGenericUDTF and callable from SQL over a metastore table."""
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("hive-udf-test")
            .config("spark.sql.warehouse.dir", "file://{tmp_path}/wh")
            .config("javax.jdo.option.ConnectionURL",
                    "jdbc:derby:;databaseName={tmp_path}/metastore_db;create=true")
            .config("spark.ui.enabled", "false")
            .enableHiveSupport()
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.sql("CREATE TABLE vals (x DOUBLE, s STRING, a ARRAY<INT>) USING parquet")
        spark.sql(
            "INSERT INTO vals VALUES (1.0,'ab',array(1,2)), (2.0,'cd',array(3)), "
            "(3.0,'ef',array(4,5))"
        )

        # GenericUDF (scalar)
        spark.sql("CREATE TEMPORARY FUNCTION hive_upper AS "
                  "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper'")
        got = [r.u for r in spark.sql(
            "SELECT hive_upper(s) AS u FROM vals ORDER BY s").collect()]
        assert got == ['AB', 'CD', 'EF'], got

        # simple UDF (non-generic class)
        spark.sql("CREATE TEMPORARY FUNCTION hive_hex AS "
                  "'org.apache.hadoop.hive.ql.udf.UDFHex'")
        got = [r.h for r in spark.sql(
            "SELECT hive_hex(cast(x AS int)) AS h FROM vals ORDER BY x").collect()]
        assert got == ['1', '2', '3'], got

        # UDAF (aggregation through HiveUDAFFunction)
        spark.sql("CREATE TEMPORARY FUNCTION hive_papprox AS "
                  "'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFPercentileApprox'")
        got = spark.sql(
            "SELECT hive_papprox(x, 0.5) AS p FROM vals").collect()[0].p
        assert 1.0 <= got <= 3.0, got  # Hive's histogram sketch, not exact

        # UDTF (generator through HiveGenericUDTF)
        spark.sql("CREATE TEMPORARY FUNCTION hive_explode AS "
                  "'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode'")
        got = sorted(r.col for r in spark.sql(
            "SELECT hive_explode(a) FROM vals").collect())
        assert got == [1, 2, 3, 4, 5], got

        # the functions route through the session catalog
        fns = {{f.name for f in spark.catalog.listFunctions()}}
        assert 'hive_upper' in fns and 'hive_papprox' in fns, fns
        print("HIVE_UDF_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "HIVE_UDF_OK" in out.stdout, (
        f"stdout={out.stdout[-800:]}\nstderr={out.stderr[-800:]}"
    )
