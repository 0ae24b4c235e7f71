"""Event-funnel and retention analytics over the events stream table —
the product-analytics workload the windowed/sessionized operators feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "funnel_signup_to_purchase",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
      GROUP BY e.user_id
    )
    SELECT count(*)                           AS n_signed_up,
           count(first_purchase_ts)           AS n_converted,
           round(count(first_purchase_ts) * 1.0 / count(*), 6) AS conversion
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: users whose first purchase follows their first
    signup; conversion rate. Single-pass per-user aggregation — at scale a
    conditional-min groupBy, not per-step self-joins."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.struct("ts")).alias("p")
        ).alias("purchases"),
    )
    converted = per_user.filter(F.col("signup_ts").isNotNull()).select(
        "user_id",
        "signup_ts",
        F.array_min(
            F.filter(F.col("purchases"), lambda p: p["ts"] > F.col("signup_ts"))
        )["ts"].alias("first_purchase_ts"),
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.count("first_purchase_ts").alias("n_converted"),
        F.round(F.count("first_purchase_ts") / F.count(F.lit(1)), 6).alias("conversion"),
    )


@query(
    "retention_daily_actives",
    oracle="""
    SELECT cast(date_trunc('day', ts) AS timestamp) AS day,
           count(DISTINCT user_id) AS dau,
           count(*)                AS n_events,
           round(sum(value), 2)    AS total_value
    FROM events
    GROUP BY 1
    """,
)
def retention_daily_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-active-users rollup — count distinct per time bucket."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "user_event_sequences",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) FILTER (WHERE rn <= 5) AS first5
    FROM o GROUP BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequence (first 5 events) — the
    sequence-mining preprocessing shape (sessionize → order → concat)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return ranked.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("first5")
    )


@query(
    "attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             max(CASE WHEN event_type IN ('click', 'view')
                      THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch_ts
      FROM events
    )
    SELECT user_id, event_id AS purchase_id, round(value, 2) AS amount,
           last_touch_ts
    FROM (SELECT t.*, e.value FROM tagged t
          JOIN events e USING (event_id))
    WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credited to the user's most
    recent preceding touch event (click/view), NULL when none precedes.
    A running-max window over a conditional timestamp — one shuffle on
    user_id, no self-join (the classic join-free formulation of
    point-in-time attribution; same frame machinery as reference
    WindowExec.scala:34-82 'growing' processor)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch_ts = F.when(F.col("event_type").isin("click", "view"), F.col("ts"))
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "value",
            F.max(touch_ts).over(w).alias("last_touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.round("value", 2).alias("amount"),
            "last_touch_ts",
        )
    )
