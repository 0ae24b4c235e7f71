"""Range joins and as-of joins — the patterns Spark lacks as primitives.

The reference planned any non-equi condition as BroadcastNestedLoopJoin /
CartesianProduct (SURVEY.md §2.3) — O(n·m) and driver-bounded. The engine
instead ships the two standard scalable rewrites:

- range_join:  "right.ts ∈ [left.ts, left.ts + gap]" → bucket both sides by
  ⌊ts/gap⌋, explode the left row into its 2 candidate buckets, equi-join on
  (keys, bucket), refine with the exact predicate. Shuffle-partitioned on
  (keys, bucket); no nested loop anywhere. Generalizes to any bounded-band
  condition.
- as_of_join:  "latest right row at-or-before each left row" → union the two
  tagged streams and take a running max over a (keys)-partitioned window —
  one shuffle, no per-row subquery, no skewed self-join.

Both have exact theta-join DuckDB oracles (tiny data) proving the rewrite's
semantics equal the naive form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with same key and right.ts in
    (left.ts, left.ts + gap]. Returns left/right id+ts columns.

    Plan: one shuffle on (key, bucket); per-bucket hash join; exact refine.
    """
    gap = F.lit(gap_seconds)
    lb = left.select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("ts_a"),
        F.col("event_id").alias("id_a"),
        (F.unix_timestamp(ts_col) / gap_seconds).cast("bigint").alias("b0"),
    )
    # left row can match right rows in its own bucket or the next one
    lb = lb.select(
        "k", "ts_a", "id_a", F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket")
    )
    rb = right.select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("ts_b"),
        F.col("event_id").alias("id_b"),
        (F.unix_timestamp(ts_col) / gap_seconds).cast("bigint").alias("bucket"),
    )
    joined = lb.join(rb, ["k", "bucket"])
    return joined.filter(
        (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.make_dt_interval(secs=gap))
    ).select("k", "id_a", "id_b", "ts_a", "ts_b")


@query(
    "range_join_events",
    oracle="""
    SELECT a.user_id AS k, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    GROUP BY a.user_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs per user within a 10-minute forward window — the bucketed
    range join vs the oracle's naive theta join."""
    e = load_table(spark, sf_dir, "events")
    pairs = range_join_pairs(e, e, key="user_id", ts_col="ts", gap_seconds=600)
    return pairs.groupBy(F.col("k")).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "asof_join_events",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id,
           max(c.ts) AS last_click_ts
    FROM purchases p LEFT JOIN clicks c
      ON c.user_id = p.user_id AND c.ts <= p.ts
    GROUP BY p.event_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it. Implementation = union tagged streams + running-max
    window (single shuffle on user_id); oracle = naive theta join + max."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_type"), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # 'click' < 'purchase' lexically, so an equal-ts click sorts before the
    # purchase and is correctly visible to it (ties included — matches the
    # oracle's c.ts <= p.ts)
    enriched = tagged.withColumn("last_click_ts", F.max("click_ts").over(w))
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id", "last_click_ts"
    )
