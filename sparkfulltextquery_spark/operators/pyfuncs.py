"""Python-function surface (SURVEY.md §2.10): pandas_udf (scalar + grouped),
applyInPandas, cogroup, SQL-registered UDFs, Python UDTF.

Reference parity: the fork evaluated Python UDFs row-at-a-time over pickle
batches (BatchEvalPythonExec, sql/core/.../execution/python/
BatchEvalPythonExec.scala:44; ExtractPythonUDFs.scala:93). The engine's rule:
Python only through Arrow-vectorized pandas UDFs, and only where `F.*`
cannot express the logic. Every UDF here is deterministic arithmetic so the
DuckDB oracle can verify the full Arrow round-trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@F.pandas_udf(DoubleType())
def _log_price_score(price: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: 10·ln(1+x), rounded."""
    return np.round(np.log1p(price) * 10.0, 6)


@query(
    "pandas_udf_scalar",
    oracle="""
    SELECT o_orderkey, round(ln(1 + o_totalprice) * 10.0, 6) AS price_score
    FROM orders WHERE o_orderkey < 500
    """,
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF (the modern BatchEvalPythonExec path —
    ArrowEvalPython in the plan)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select("o_orderkey", _log_price_score("o_totalprice").alias("price_score"))


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: per-customer z-score of order totals (std==0/NaN → 0)."""
    std = pdf["o_totalprice"].std(ddof=1)
    mean = pdf["o_totalprice"].mean()
    if pd.isna(std) or std == 0:
        z = pd.Series(0.0, index=pdf.index)
    else:
        z = (pdf["o_totalprice"] - mean) / std
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "zscore": np.round(z, 6),
        }
    )


@query(
    "apply_in_pandas_zscore",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CASE WHEN stddev_samp(o_totalprice) OVER w IS NULL
                        OR stddev_samp(o_totalprice) OVER w = 0 THEN 0.0
                      ELSE (o_totalprice - avg(o_totalprice) OVER w)
                           / stddev_samp(o_totalprice) OVER w END, 6) AS zscore
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (reference MapGroupsExec, objects.scala:298,
    modernized through Arrow): per-group pandas computation with a window-SQL
    oracle. NOTE: expressible as pure window functions (see oracle) — kept as
    the canonical grouped-map example; real uses are logic window fns can't
    express (model scoring, per-group fits)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").applyInPandas(
        _zscore_group, schema="o_custkey bigint, o_orderkey bigint, zscore double"
    )


def _order_line_ratio(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "o_orderkey": [key[0]],
            "n_orders": [len(left)],
            "n_lines": [len(right)],
        }
    )


@query(
    "cogroup_apply_in_pandas",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k, count(*) AS n_orders FROM orders GROUP BY 1),
         l AS (SELECT l_orderkey AS k, count(*) AS n_lines  FROM lineitem GROUP BY 1)
    SELECT coalesce(o.k, l.k) AS o_orderkey,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_lines, 0)  AS n_lines
    FROM o FULL OUTER JOIN l ON o.k = l.k
    """,
)
def cogroup_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (reference CoGroupExec, objects.scala:402):
    orders ⟂ lineitem aligned per order key, one pandas call per key pair."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.groupBy("o_orderkey")
        .cogroup(l.groupBy("l_orderkey"))
        .applyInPandas(
            _order_line_ratio, schema="o_orderkey bigint, n_orders bigint, n_lines bigint"
        )
    )


@query(
    "sql_registered_udf",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'A'
                WHEN o_totalprice >= 50000  THEN 'B'
                ELSE 'C' END AS band
    FROM orders WHERE o_orderkey < 400
    """,
)
def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registration surface (reference UDFRegistration; Python udf at
    python/pyspark/sql/functions.py:1787): register a pandas UDF and call it
    from SQL text."""

    @F.pandas_udf("string")
    def price_band(p: pd.Series) -> pd.Series:
        return pd.Series(
            np.where(p >= 150000, "A", np.where(p >= 50000, "B", "C")), index=p.index
        )

    spark.udf.register("price_band", price_band)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, price_band(o_totalprice) AS band FROM orders WHERE o_orderkey < 400"
    )


@query(
    "mapinpandas_running",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_quantity * l_extendedprice, 4) AS qty_price
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def mapinpandas_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas per-partition batch iterator (reference MapPartitionsExec,
    objects.scala:168) — partition-local transform, no shuffle."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "qty_price": np.round(pdf["l_quantity"] * pdf["l_extendedprice"], 4),
                }
            )

    return l.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice").mapInPandas(
        op, schema="l_orderkey bigint, l_linenumber int, qty_price double"
    )


@query(
    "mapinarrow_revenue",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_revenue
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def mapinarrow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy sibling of mapInPandas — the Python
    function sees raw pyarrow.RecordBatch objects (no pandas conversion at
    all), the cheapest possible Python boundary for columnar compute.
    Same physical shape as the reference's MapPartitionsExec
    (objects.scala:168): partition-local, no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)

    def op(batches):
        for batch in batches:
            rev = pc.round(
                pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
                ndigits=4,
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"), rev],
                names=["l_orderkey", "l_linenumber", "net_revenue"],
            )

    return l.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).mapInArrow(op, schema="l_orderkey bigint, l_linenumber int, net_revenue double")
