"""Hive catalog support (SURVEY.md §2.1: metastore catalog, sql/hive/) —
enableHiveSupport with an embedded Derby metastore. Runs in a subprocess
because the catalog implementation is fixed at first-session creation."""

from __future__ import annotations

import subprocess
import sys
import textwrap


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
