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
