"""Canonical table loaders for the engine's corpus.

Parity: the reference reads test tables through FileSourceScanExec with
column pruning + predicate pushdown (sql/core/.../execution/DataSourceScanExec.scala:141,
ParquetFileFormat.scala:54). `spark.read.parquet` plans the identical scan in
modern Spark — `.explain("formatted")` shows PushedFilters/ReadSchema; the
tests in tests/test_plans.py assert pushdown actually happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Scans stay columnar + pushdown-capable.

    TIMESTAMP(NANOS) columns (written by pandas/pyarrow) have no Spark type;
    with spark.sql.legacy.parquet.nanosAsLong they surface as LongType nanos
    and are converted here to proper timestamps (micros) — a projection on
    top of the scan, so pruning/pushdown on other columns is unaffected.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events":
        # must hold even when the caller supplies a vanilla SparkSession
        # (the driver's correctness harness does) — runtime-settable conf
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for `spark.sql` entry."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 64,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist a table bucketed on a key so later joins/lookups on that key
    are shuffle-free (reference: DataFrameWriter.bucketBy/sortBy,
    sql/core/.../DataFrameWriter.scala:170,184). Used for the posting index:
    bucketBy(term) makes term lookups a pruned scan, not a shuffle.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)
