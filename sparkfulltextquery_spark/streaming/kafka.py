"""Kafka connector wiring (SURVEY.md §2.1 protocol sources).

Reference anchor: the reference ships DStream Kafka integrations
(external/kafka-0-10/src/main/scala/org/apache/spark/streaming/kafka010/
DirectKafkaInputDStream.scala:54, KafkaUtils.scala) and 0.8
(external/kafka-0-8/). The modern equivalent is the Structured Streaming
Kafka source (`format("kafka")`), which is a SEPARATE artifact
(spark-sql-kafka-0-10) deployed with the application, not bundled in
pyspark — exactly as the reference keeps Kafka outside core in
external/. This module therefore splits the connector into:

1. **Reader/writer wiring** (`kafka_stream_reader`, `kafka_stream_writer`,
   `kafka_batch_reader`) — option validation + DataStreamReader plumbing.
   These are real in any environment; `.load()` additionally needs the
   connector jar on the classpath (`connector_available()`).
2. **Record-shape transforms** (`parse_kafka_records`,
   `to_kafka_records`) — pure DataFrame logic over the FIXED Kafka source
   schema (key/value binary, topic, partition, offset, timestamp,
   timestampType — KafkaRecordToRowConverter in the connector). These
   run and are tested broker-free on kafka-shaped frames: the decode
   path a Kafka deployment would use is the tested code, only the
   source swaps.

The contract test (tests/test_kafka_contract.py) asserts the wiring
resolves the provider when the jar is present, and that absence fails at
the provider-lookup boundary (not an option bug) when it is not.

Live-broker attempt (2026-08-14, r5): a KRaft single-node broker cannot
run in this sandbox — no Kafka distribution or broker binaries on disk,
no spark-sql-kafka / kafka-clients jars in the Spark 4.1.2 install
(checked /opt/spark-4.1.2-bin-hadoop3/jars), no kafka Python client,
and package installation is out of scope. The `.load()`-through-broker
path therefore remains exercised only up to the provider-resolution
boundary; everything below the source swap (record transforms, offset
dedup, exactly-once bookkeeping) is tested on kafka-shaped frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The Structured Streaming Kafka source's row schema — fixed by the
#: connector (KafkaOffsetReader/KafkaRecordToRowConverter), independent of
#: topic contents. Transforms below are written against this shape.
KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_SUBSCRIBE_MODES = ("subscribe", "subscribePattern", "assign")


def connector_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _validated_options(
    bootstrap_servers: str, mode: str, target: str, **options: str
) -> dict[str, str]:
    if mode not in _SUBSCRIBE_MODES:
        raise ValueError(
            f"mode must be one of {_SUBSCRIBE_MODES}, got {mode!r}"
        )
    if not bootstrap_servers:
        raise ValueError("kafka.bootstrap.servers is required")
    if not target:
        raise ValueError(f"{mode} target (topics/pattern/partitions) is required")
    opts = {"kafka.bootstrap.servers": bootstrap_servers, mode: target}
    opts.update({k: str(v) for k, v in options.items()})
    return opts


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    *,
    mode: str = "subscribe",
    target: str,
    starting_offsets: str = "latest",
    **options: str,
):
    """Configured `spark.readStream.format("kafka")` DataStreamReader.

    Call `.load()` to materialize — requires the connector jar
    (`connector_available`); everything up to that point (option
    validation, provider name, reader plumbing) is exercised broker-free
    by the contract test."""
    opts = _validated_options(bootstrap_servers, mode, target, **options)
    opts["startingOffsets"] = starting_offsets
    r = spark.readStream.format("kafka").options(**opts)
    # introspection handle for contract tests / logging — the JVM reader
    # keeps its own state; this records exactly what we handed it
    r._sftq_source = "kafka"
    r._sftq_options = dict(opts)
    return r


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    *,
    mode: str = "subscribe",
    target: str,
    **options: str,
):
    """Batch (`spark.read`) variant — Kafka as a bounded source, the
    backfill path (startingOffsets=earliest/endingOffsets=latest)."""
    opts = _validated_options(bootstrap_servers, mode, target, **options)
    opts.setdefault("startingOffsets", "earliest")
    opts.setdefault("endingOffsets", "latest")
    r = spark.read.format("kafka").options(**opts)
    r._sftq_source = "kafka"
    r._sftq_options = dict(opts)
    return r


def kafka_stream_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    **options: str,
):
    """Configured `df.writeStream.format("kafka")` DataStreamWriter.

    `df` must already be kafka-sink-shaped (`to_kafka_records`): a
    `value` column (binary or string), optional `key`/`topic`/`headers`."""
    cols = set(df.columns)
    if "value" not in cols:
        raise ValueError("kafka sink requires a 'value' column (to_kafka_records)")
    w = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in options.items():
        w = w.option(k, str(v))
    return w


def parse_kafka_records(
    records: DataFrame, value_schema, *, ts_col: str = "kafka_ts"
) -> DataFrame:
    """Decode kafka-shaped rows (KAFKA_RECORD_SCHEMA) into typed columns:
    value bytes → UTF-8 → from_json(value_schema), key bytes → string,
    plus the (topic, partition, offset, timestamp) provenance columns every
    exactly-once downstream needs for offset-based dedup.

    Pure DataFrame logic — works on the real Kafka source and on any
    test frame with the same shape (how the broker-free tests drive it)."""
    parsed: Column = F.from_json(F.col("value").cast("string"), value_schema)
    return records.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias(ts_col),
        parsed.alias("payload"),
    ).select("kafka_key", "topic", "partition", "offset", ts_col, "payload.*")


def to_kafka_records(
    df: DataFrame, *, key_col: str | None = None, value_cols: list[str] | None = None
) -> DataFrame:
    """Encode a typed frame into the Kafka SINK shape: `value` = JSON of
    the selected columns, optional `key` from `key_col` — the inverse of
    `parse_kafka_records`, shared by the writer path and its tests."""
    vcols = value_cols or [c for c in df.columns if c != key_col]
    out = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*[F.col(c) for c in vcols])).alias("value"),
    )
    return out


def dedup_by_offset(
    records: DataFrame,
    *,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Exactly-once consumption primitive: keep the first row per
    (topic, partition, offset) — idempotent re-reads after a replayed
    micro-batch collapse to one.

    `watermark=(ts_col, delay)` (e.g. ``("timestamp", "10 minutes")``)
    applies an event-time watermark and uses
    ``dropDuplicatesWithinWatermark`` so streaming dedup state is evicted
    once an offset's timestamp falls behind the watermark — bounded state
    on unbounded streams. A STREAMING frame without a watermark raises
    (ADVICE r04: unbounded (topic, partition, offset) state otherwise
    accumulates silently); batch frames dedup exactly with no watermark
    needed."""
    if records.isStreaming:
        if watermark is None:
            raise ValueError(
                "dedup_by_offset on a streaming frame requires "
                "watermark=(ts_col, delay) so dedup state stays bounded; "
                "e.g. watermark=('timestamp', '10 minutes')"
            )
        ts_col, delay = watermark
        return records.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["topic", "partition", "offset"]
        )
    if watermark is not None:
        ts_col, delay = watermark  # no-op marker on batch frames, kept for parity
        records = records.withWatermark(ts_col, delay)
    return records.dropDuplicates(["topic", "partition", "offset"])
