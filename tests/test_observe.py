"""DataFrame.observe: in-flight data-quality metrics collected on the SAME
pass as the main action (CollectMetricsExec — the accumulator-based upgrade
over running a second validation scan; at 100 TB the second scan is the
cost you can't pay)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR


def test_observe_collects_quality_metrics_in_one_pass(spark):
    li = load_table(spark, SF_DIR, "lineitem")

    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("n_null_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    # one action drives BOTH the business result and the metrics
    revenue = observed.agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    ).head()[0]
    m = obs.get

    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("n_null_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    ).head()
    assert m["n_rows"] == direct.n_rows > 0
    assert m["n_null_qty"] == direct.n_null_qty
    assert m["min_ship"] == direct.min_ship
    assert m["max_ship"] == direct.max_ship
    assert revenue is not None


def test_observe_metrics_follow_filters(spark):
    """Metrics observe the relation AT THE POINT of the observe() call —
    downstream filters don't change them, upstream ones do (gate placement
    semantics a pipeline relies on)."""
    ord_ = load_table(spark, SF_DIR, "orders").filter(F.col("o_totalprice") > 0)

    obs = Observation("gate")
    observed = ord_.observe(obs, F.count(F.lit(1)).alias("n_in"))
    kept = observed.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert obs.get["n_in"] == ord_.count()
    assert 0 < kept < obs.get["n_in"]


def test_observe_metrics_on_streaming_query(spark, tmp_path):
    """observe() on a streaming DataFrame: per-micro-batch metrics surface in
    StreamingQueryProgress.observedMetrics — the no-second-pass quality gate
    for ingest pipelines."""
    li = load_table(spark, SF_DIR, "lineitem").limit(1000)
    src = f"file://{tmp_path}/obsrc"
    li.write.mode("append").parquet(src)

    stream = spark.readStream.schema(li.schema).parquet(src).observe(
        "ingest_gate",
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("n_null_qty"),
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", f"file://{tmp_path}/obckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    seen = [
        p.observedMetrics["ingest_gate"]
        for p in q.recentProgress
        if "ingest_gate" in (p.observedMetrics or {})
    ]
    assert seen, "no observed metrics in any progress event"
    assert sum(m["n_rows"] for m in seen) == 1000
    assert all(m["n_null_qty"] == 0 for m in seen)
