"""Thrift JDBC/ODBC server (reference sql/hive-thriftserver/.../
HiveServer2.java, HiveThriftServer2Suites.scala): the stock Spark
HiveThriftServer2 started in-process over the engine's session, driven
through the bundled hive-jdbc driver — the wire path beeline/BI tools use.

Runs in a subprocess (like test_hive.py): the server and the
thriftServer.singleSession static conf are JVM/session-global, so they must
not leak into the shared test session.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.heavy


def test_thrift_server_jdbc_round_trip(tmp_path):
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession, functions as F

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("thrift-test")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.sql.warehouse.dir", "file://{tmp_path}/wh")
            .config("javax.jdo.option.ConnectionURL",
                    "jdbc:derby:;databaseName={tmp_path}/metastore_db;create=true")
            .config("spark.sql.hive.thriftServer.singleSession", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from sparkfulltextquery_spark.server import (
            jdbc_query,
            jdbc_server_metadata,
            register_engine_views,
            serve_tables,
            start_thrift_server,
            stop_thrift_server,
        )
        from sparkfulltextquery_spark.sources import load_table

        sf = "{SF_DIR}"
        server, port = start_thrift_server(spark)

        # 1. BI-tool handshake: DatabaseMetaData over the wire
        md = jdbc_server_metadata(spark, port)
        assert md["product"] == "Spark SQL", md
        assert "Hive JDBC" in md["driver"], md

        # 2. global temp views: visible to the server's OWN sessions even
        #    without singleSession (catalog-level sharing)
        serve_tables(spark, sf, ["lineitem", "nation"])
        cols, rows = jdbc_query(
            spark, "SELECT count(*) AS n FROM global_temp.lineitem", port
        )
        assert cols == ["n"], cols
        assert rows[0][0] == load_table(spark, sf, "lineitem").count()

        # 3. a real aggregate through the wire == the DataFrame API answer
        cols, rows = jdbc_query(
            spark,
            \"\"\"SELECT l_returnflag, count(*) AS n,
                      round(sum(l_quantity), 2) AS sum_qty
               FROM global_temp.lineitem
               GROUP BY l_returnflag ORDER BY l_returnflag\"\"\",
            port,
        )
        l = load_table(spark, sf, "lineitem")
        want = [
            (r.l_returnflag, r.n, r.sum_qty)
            for r in l.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
            .orderBy("l_returnflag")
            .collect()
        ]
        assert cols == ["l_returnflag", "n", "sum_qty"]
        assert [tuple(r) for r in rows] == want, (rows, want)

        # 4. an engine-built analytical view served to JDBC clients
        rev = register_engine_views(spark, sf)
        cols, rows = jdbc_query(
            spark,
            "SELECT n_name, revenue FROM global_temp.nation_revenue "
            "ORDER BY revenue DESC, n_name LIMIT 3",
            port,
        )
        want = [
            (r.n_name, r.revenue)
            for r in rev.orderBy(F.col("revenue").desc(), "n_name").limit(3).collect()
        ]
        assert [(r[0], float(r[1])) for r in rows] == [
            (n, float(v)) for n, v in want
        ], (rows, want)

        # 5. singleSession=true: plain session temp views cross the wire too
        spark.range(5).selectExpr("id", "id * id AS sq").createOrReplaceTempView("tv")
        _, rows = jdbc_query(spark, "SELECT sum(sq) AS s FROM tv", port)
        assert rows[0][0] == 30, rows

        # 6. the bundled beeline CLI (the reference's interactive client)
        #    connects and queries an engine view over the wire
        import os
        import subprocess

        import pyspark

        bee = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")
        r = subprocess.run(
            [bee, "-u", f"jdbc:hive2://127.0.0.1:{{port}}/default", "-n", "anon",
             "--outputformat=csv2", "--silent=true", "-e",
             "SELECT count(*) AS n FROM global_temp.nation"],
            capture_output=True, text=True, timeout=180,
        )
        n_nations = load_table(spark, sf, "nation").count()
        assert r.returncode == 0, r.stderr[-1500:]
        assert str(n_nations) in r.stdout, r.stdout[-500:]

        stop_thrift_server(server)
        print("THRIFT_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "THRIFT_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-4000:]
