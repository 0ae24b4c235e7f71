"""Registered streaming-equivalent batch queries + DuckDB oracles.

Structured Streaming's contract is batch-equivalence (the incremental plan
must equal the batch plan — reference IncrementalExecution.scala:30), so the
driver-checkable form of each streaming operator is its batch twin on the
events table. The live-stream execution paths are exercised in
tests/test_streaming.py with Trigger.AvailableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table
from sparkfulltextquery_spark.streaming import sessionize, windowed_counts


@query(
    "streaming_sliding_window",
    oracle="""
    WITH wins AS (
      SELECT event_type, value, ts,
             time_bucket(INTERVAL '30 minutes', ts)
               - k.k * (INTERVAL '30 minutes') AS win_start
      FROM events CROSS JOIN (SELECT unnest(range(2)) AS k) k
    )
    SELECT win_start, event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM wins
    WHERE ts >= win_start AND ts < win_start + INTERVAL '1 hour'
    GROUP BY win_start, event_type
    """,
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h size / 30min slide) — reference TimeWindow with
    slideDuration (TimeWindow.scala:29); every event lands in 2 windows."""
    e = load_table(spark, sf_dir, "events")
    return windowed_counts(e, window="1 hour", slide="30 minutes").withColumnRenamed(
        "win_start", "win_start"
    )


@query(
    "streaming_session_windows",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
    ),
    g AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*)                        AS n_events,
           round(sum(value), 2)            AS total
    FROM g GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30min gap (F.session_window — the capability the
    reference's DStream era approximated with updateStateByKey,
    PairDStreamFunctions.scala:397). Oracle = gaps-and-islands SQL."""
    e = load_table(spark, sf_dir, "events")
    return sessionize(e, gap="30 minutes")


@query(
    "streaming_dedup_equivalence",
    oracle="""
    WITH doubled AS (
      SELECT event_id, event_type FROM events
      UNION ALL
      SELECT event_id, event_type FROM events
    )
    SELECT event_type, count(DISTINCT event_id) AS n_unique, count(*) AS n_raw
    FROM doubled GROUP BY event_type
    """,
)
def streaming_dedup_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup batch twin: double the feed (simulating at-least-once
    delivery), count unique vs raw event ids per type — the invariant
    dropDuplicates+watermark maintains incrementally."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    doubled = e.union(e)
    return doubled.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_unique"),
        F.count(F.lit(1)).alias("n_raw"),
    )


@query(
    "streaming_kafka_roundtrip",
    oracle="""
    SELECT 'events' AS topic,
           CAST(user_id % 4 AS INT) AS partition,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(event_id) AS BIGINT) AS max_offset,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY user_id % 4
    """,
)
def streaming_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka record encode∘decode == identity, end to end: events → the
    connector's sink shape (to_kafka_records: key bytes + JSON value
    bytes) → the source's fixed record schema (topic/partition/offset/
    timestamp) → parse_kafka_records (value → from_json → typed columns)
    → per-partition aggregate. The oracle aggregates the RAW events
    table, so any drift in the encode or decode path (field loss, type
    coercion, offset mixups) breaks value equality — this is the
    broker-free twin of a Kafka ingest job (streaming/kafka.py; reference
    external/kafka-0-10/.../DirectKafkaInputDStream.scala:54)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from sparkfulltextquery_spark.streaming.kafka import (
        parse_kafka_records,
        to_kafka_records,
    )

    e = load_table(spark, sf_dir, "events")
    enc = to_kafka_records(
        e, key_col="user_id", value_cols=["event_id", "event_type", "value"]
    )
    # partition/offset derive from the ENCODED record alone (key bytes and
    # payload json), as a real consumer would see them
    payload = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    shaped = enc.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("key").cast("long") % 4).cast("int").alias("partition"),
        F.get_json_object(F.col("value"), "$.event_id").cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    parsed = parse_kafka_records(shaped, payload)
    return parsed.groupBy("topic", "partition").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("offset").alias("max_offset"),
        F.round(F.sum("value"), 2).alias("total"),
    )


@query(
    "streaming_kafka_offset_dedup",
    oracle="""
    SELECT CAST((SELECT count(*) FROM events)
                + (SELECT count(*) FROM events WHERE event_id < 500)
                AS BIGINT) AS n_delivered,
           CAST((SELECT count(*) FROM events) AS BIGINT)       AS n_after,
           CAST((SELECT count(*) FROM events WHERE event_id < 500) AS BIGINT)
             AS n_replayed
    FROM (SELECT 1)
    """,
)
def streaming_kafka_offset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once consumption primitive: a replayed micro-batch
    re-delivers the first 500 offsets; dedup_by_offset collapses the
    double delivery back to one row per (topic, partition, offset) —
    the offset-keyed idempotency a Kafka sink/source pair relies on
    (streaming/kafka.py::dedup_by_offset)."""
    from sparkfulltextquery_spark.streaming.kafka import dedup_by_offset

    e = load_table(spark, sf_dir, "events")
    records = e.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    replay = records.filter(F.col("offset") < 500)
    delivered = records.unionAll(replay)
    deduped = dedup_by_offset(delivered)
    # declarative: three count aggregates cross-joined into one row (no
    # driver-side actions at plan-build time)
    return (
        delivered.agg(F.count(F.lit(1)).alias("n_delivered"))
        .crossJoin(deduped.agg(F.count(F.lit(1)).alias("n_after")))
        .crossJoin(replay.agg(F.count(F.lit(1)).alias("n_replayed")))
    )
