"""Thrift JDBC/ODBC SQL server — the reference's user-facing network surface.

Reference analogue: the HiveServer2-based thrift server the reference forks
(`sql/hive-thriftserver/src/main/java/org/apache/hive/service/server/
HiveServer2.java`, suite `HiveThriftServer2Suites.scala`). Spark-first
re-expression: no server re-implementation — the stock
``HiveThriftServer2.startWithContext`` is started IN-PROCESS over this
engine's ``SparkSession``, so every registered operator, view, and persisted
index the session can see is immediately queryable by any JDBC/ODBC client
(beeline, Tableau, the bundled ``hive-jdbc`` driver). The engine's tables
are exposed either as

- **global temp views** (``global_temp.<name>`` — visible to every
  server-side session; what :func:`serve_tables` registers), or
- **catalog tables** (Hive metastore / ``saveAsTable`` — the persisted
  bucketed indexes in ``functions.index`` are already this), or
- **session temp views**, when the session was built with
  ``spark.sql.hive.thriftServer.singleSession=true`` (static conf — must be
  set at session creation).

Scale shape: the server adds no execution machinery of its own — each JDBC
statement plans and runs as the same Catalyst/Tungsten job the DataFrame
API would produce, on the same cluster; concurrency is Spark's scheduler
(FAIR pools if configured). At 100 TB the endpoint is a thin control-plane
door into the same plans this repo benchmarks.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import DataFrame, SparkSession

from sparkfulltextquery_spark.sources import load_table


def find_free_port(host: str = "127.0.0.1") -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind((host, 0))
    port = s.getsockname()[1]
    s.close()
    return port


def start_thrift_server(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int | None = None,
    wait_secs: float = 30.0,
):
    """Start HiveThriftServer2 over this session; returns (server, port).

    ``hive.server2.thrift.port``/``bind.host`` are runtime confs (verified)
    so any session can serve; only temp-view *sharing* needs the static
    ``singleSession`` conf at build time. Blocks until the port accepts
    connections (the server binds asynchronously)."""
    if port is None:
        port = find_free_port(host)
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", host)
    jvm = spark.sparkContext._jvm
    server = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    deadline = time.time() + wait_secs
    while time.time() < deadline:
        try:
            probe = socket.create_connection((host, port), timeout=1)
            probe.close()
            return server, port
        except OSError:
            time.sleep(0.25)
    server.stop()
    raise TimeoutError(f"thrift server did not bind {host}:{port} in {wait_secs}s")


def stop_thrift_server(server) -> None:
    server.stop()


def serve_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | tuple[str, ...]
) -> list[str]:
    """Register testdata tables as GLOBAL temp views — visible to every
    thrift-server-side session without the singleSession conf. Returns the
    fully-qualified ``global_temp.<name>`` identifiers."""
    out = []
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceGlobalTempView(t)
        out.append(f"global_temp.{t}")
    return out


def _to_py(jvm_val):
    """py4j auto-converts String/Long/Double/Boolean; anything else (e.g.
    java.math.BigDecimal, java.sql.Date) is stringified."""
    if jvm_val is None or isinstance(jvm_val, (str, int, float, bool)):
        return jvm_val
    return str(jvm_val.toString())


def jdbc_query(
    spark: SparkSession,
    sql: str,
    port: int,
    host: str = "127.0.0.1",
    user: str = "anon",
) -> tuple[list[str], list[tuple]]:
    """Run ``sql`` through the server's wire protocol with the bundled
    ``hive-jdbc`` driver (the exact client path beeline uses) and fetch all
    rows. Returns (column_names, rows). For bounded result sets only —
    this is a client, the same discipline as any collect."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:hive2://{host}:{port}/default", user, ""
    )
    try:
        rs = conn.createStatement().executeQuery(sql)
        md = rs.getMetaData()
        n = md.getColumnCount()
        cols = [md.getColumnLabel(i) for i in range(1, n + 1)]
        rows = []
        while rs.next():
            rows.append(tuple(_to_py(rs.getObject(i)) for i in range(1, n + 1)))
        return cols, rows
    finally:
        conn.close()


def jdbc_server_metadata(
    spark: SparkSession, port: int, host: str = "127.0.0.1"
) -> dict[str, str]:
    """DatabaseMetaData through the wire — what BI tools read on connect."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:hive2://{host}:{port}/default", "anon", ""
    )
    try:
        md = conn.getMetaData()
        return {
            "product": str(md.getDatabaseProductName()),
            "version": str(md.getDatabaseProductVersion()),
            "driver": str(md.getDriverName()),
        }
    finally:
        conn.close()


def register_engine_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience: expose a ready-to-serve analytical view over the engine
    (top revenue per nation) alongside the base tables — shows a thrift
    client consuming an engine-built view, not just raw scans."""
    from pyspark.sql import functions as F

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    rev.createOrReplaceGlobalTempView("nation_revenue")
    return rev
