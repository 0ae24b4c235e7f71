"""Structured Streaming operators (SURVEY.md §2.11, §7 step 6).

The reference's 2.0-era micro-batch engine (StreamExecution,
sql/core/.../execution/streaming/StreamExecution.scala:47) supported file/
socket/memory sources, Append/Complete/Update modes, and TimeWindow
aggregation — but had NO watermark (grep-verified absent; late data grew
state unboundedly). This module carries the same capabilities on modern
Structured Streaming and adds the watermark as the documented upgrade.

Operators:
- windowed_counts      : tumbling/sliding event-time aggregation + watermark
- streaming_dedup      : dropDuplicates over event ids within the watermark
- sessionize           : session windows (F.session_window)
- run_available_now    : drain a bounded source with Trigger.AvailableNow —
                         how the batch-equivalence tests execute streams

Batch/stream parity: each streaming transform has a batch twin on the same
events table (fn_datetime_window_bucket, streaming_* queries) because
Structured Streaming's contract IS batch-equivalence — the incremental plan
must produce what the batch plan would (IncrementalExecution.scala:30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _ltz_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require session-TZ timestamps (EVENT_TIME_IS_NOT_ON_
    TIMESTAMP_TYPE); parquet written with isAdjustedToUTC=false reads back
    as TIMESTAMP_NTZ under Spark's inferTimestampNTZ. Cast once at the
    event-time boundary — a no-op when the column is already TIMESTAMP,
    and applied to batch twins too so stream/batch equality holds."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed aggregation. Works identically on batch and
    streaming frames; on streams the watermark bounds state (the upgrade over
    the reference, which lacked EventTimeWatermark entirely)."""
    df = _ltz_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event feed: drop duplicate event_ids; on streams the
    watermark lets the engine expire seen-id state."""
    df = _ltz_event_time(events, "ts")
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.dropDuplicates(["event_id"])


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: activity separated by > gap starts a new
    session (F.session_window — absent in the reference era, capability
    upgrade). Returns (user_id, session_start, session_end, n_events)."""
    df = _ltz_event_time(events, "ts")
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "6 hours",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with a time-range condition: attribute each
    purchase to the clicks of the same user in the preceding ``horizon``
    (ad-attribution shape). On streams both sides carry watermarks and the
    range predicate bounds join state to the horizon window — the condition
    Structured Streaming requires to ever expire buffered rows
    (StreamingSymmetricHashJoinExec). Works identically on batch frames,
    which is how the equivalence test checks it."""
    clicks = _ltz_event_time(clicks, "ts")
    purchases = _ltz_event_time(purchases, "ts")
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c.user_id == p.p_user_id)
        & (p.purchase_ts >= c.click_ts)
        & (p.purchase_ts <= c.click_ts + F.expr(f"INTERVAL {horizon}"))
    )
    # outer stream-stream joins emit the null-padded side only once the
    # watermark passes a row's join window — state expiry doubles as the
    # completeness signal (StreamingSymmetricHashJoinExec outer semantics)
    return c.join(p, cond, how).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value"
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup where duplicates are only
    guaranteed to arrive within the watermark delay of each other — state
    expires by event time instead of growing with all-time distinct ids
    (the production-shape of streaming dedup; Spark 3.5+)."""
    return _ltz_event_time(events, "ts").withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> list:
    """Execute a streaming DataFrame to completion over its currently
    available input (Trigger.AvailableNow → memory sink), return the rows.
    The scripted-test harness pattern (reference StreamTest.scala) without
    an always-on cluster."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(query_name).collect()


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful operator via applyInPandasWithState — the modern
    form of the DStream-era updateStateByKey/mapWithState (reference
    streaming/.../dstream/PairDStreamFunctions.scala:397/380, absent from
    its Structured Streaming). Maintains per-user running (n_events, total)
    across micro-batches; state survives restarts via the checkpoint.

    Output (update mode): one row per user per batch with the cumulative
    totals. State is O(distinct users) — bounded keys only, per the
    engine's 100 TB discipline.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )



class _CompatValueState:
    """ValueState twin (get/exists/update/clear) for the portable
    StatefulProcessor executor below."""

    def __init__(self) -> None:
        self._value = None

    def exists(self) -> bool:
        return self._value is not None

    def get(self):
        return self._value

    def update(self, value) -> None:
        self._value = tuple(value)

    def clear(self) -> None:
        self._value = None


class _CompatHandle:
    """StatefulProcessorHandle twin: registers named ValueState variables.
    Field names are prefixed per state and packed into ONE flat GroupState
    struct (plus a presence flag each, so clear() round-trips)."""

    def __init__(self) -> None:
        self.specs: list[tuple[str, str]] = []  # (name, schema) in reg. order
        self.states: dict[str, _CompatValueState] = {}

    def getValueState(self, name: str, schema: str, ttl_duration_ms=None):
        if name not in self.states:
            self.specs.append((name, schema))
            self.states[name] = _CompatValueState()
        return self.states[name]


def transform_with_state(
    events: DataFrame,
    processor_factory,
    group_keys: list[str],
    output_struct: str,
    output_mode: str = "update",
    native: bool | None = None,
) -> DataFrame:
    """Run a transformWithStateInPandas-style StatefulProcessor (init with
    named ValueState variables / handleInputRows / close — the Spark 4.x
    successor of DStream updateStateByKey/mapWithState, reference
    PairDStreamFunctions.scala:397/380) on WHICHEVER stateful engine the
    cluster has:

    - native=True  → ``transformWithStateInPandas`` (needs the protobuf
      state-server runtime + RocksDB provider),
    - native=False → a portable executor over ``applyInPandasWithState``:
      the processor's named ValueStates are packed (with presence flags)
      into the single flat GroupState struct, one fresh processor instance
      per key-batch, identical per-key semantics and checkpoint recovery,
    - native=None  → auto: native when protobuf is importable.

    State stays O(distinct keys) either way; the executor adds no extra
    shuffle — it IS applyInPandasWithState's plan."""
    if native is None:
        try:
            import google.protobuf  # noqa: F401

            native = True
        except ImportError:
            native = False

    if native:
        return events.groupBy(*group_keys).transformWithStateInPandas(
            processor_factory(),
            outputStructType=output_struct,
            outputMode=output_mode.capitalize(),
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # dry init driver-side to learn the state layout (names + schemas)
    probe = _CompatHandle()
    processor_factory().init(probe)
    specs = probe.specs
    field_counts = []
    state_fields = []
    for name, schema in specs:
        fields = [f.strip() for f in schema.split(",")]
        field_counts.append(len(fields))
        state_fields.append(f"{name}__set boolean")
        state_fields.extend(f"{name}__{f}" for f in fields)
    state_struct = ", ".join(state_fields)

    def update(key, pdf_iter, state: GroupState):
        proc = processor_factory()
        handle = _CompatHandle()
        proc.init(handle)
        if state.exists:
            flat = list(state.get)
            pos = 0
            for (name, _), n_fields in zip(specs, field_counts):
                present, vals = flat[pos], flat[pos + 1 : pos + 1 + n_fields]
                pos += 1 + n_fields
                if present:
                    handle.states[name].update(tuple(vals))
        yield from proc.handleInputRows(key, pdf_iter, None)
        flat_out: list = []
        for (name, _), n_fields in zip(specs, field_counts):
            st = handle.states[name]
            if st.exists():
                flat_out.append(True)
                flat_out.extend(st.get())
            else:
                flat_out.append(False)
                flat_out.extend([None] * n_fields)
        state.update(tuple(flat_out))
        getattr(proc, "close", lambda: None)()  # optional, as in the native API

    return events.groupBy(*group_keys).applyInPandasWithState(
        update,
        outputStructType=output_struct,
        stateStructType=state_struct,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _running_totals_processor():
    """StatefulProcessor computing per-user running (n_events, total) — the
    processor passed to either transform_with_state engine."""
    import pandas as pd

    try:
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        base = StatefulProcessor
    except ImportError:  # protobuf-less env: the API class itself imports it
        base = object

    class RunningTotals(base):  # type: ignore[misc, valid-type]
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, round(total, 2)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return RunningTotals


def running_user_totals_tws(events: DataFrame, native: bool | None = None) -> DataFrame:
    """Per-user running totals through the StatefulProcessor API (named,
    typed state variables with lifecycle hooks — the next-gen form of
    running_user_totals above). Engine selected by `native` / auto-detect:
    transformWithStateInPandas where the protobuf runtime exists, the
    portable applyInPandasWithState executor otherwise — same semantics,
    same checkpoint recovery, state O(distinct users) either way."""
    return transform_with_state(
        events,
        _running_totals_processor(),
        group_keys=["user_id"],
        output_struct="user_id bigint, n_events bigint, total double",
        output_mode="update",
        native=native,
    )


# registered queries import the helpers above; keep this import last
from sparkfulltextquery_spark.streaming import queries  # noqa: E402,F401


def stream_rollup_by_source(
    doc_stream: DataFrame, rollup_dir: str, checkpoint_dir: str
):
    """Incrementally-maintained materialized rollup: per-source doc/char
    counts kept in a parquet table PARTITIONED BY source, refreshed with
    dynamic partition overwrite — each micro-batch rewrites ONLY the
    partitions of sources it touched (merge new counts into the old), never
    the whole table. The materialized-view-maintenance pattern on plain
    parquet: at 100 TB the per-batch write cost is O(touched partitions),
    not O(table).
    """
    from pyspark.sql import functions as F

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        try:
            existing = (
                spark.read.parquet(rollup_dir)
                .select("source", "n_docs", "n_chars")  # drop src_part
                .join(delta.select("source"), "source", "left_semi")
            )
        except Exception:
            existing = None  # first batch, nothing materialized yet
        if existing is not None:
            delta = (
                delta.unionByName(existing)
                .groupBy("source")
                .agg(F.sum("n_docs").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
            )
        (
            delta.withColumn("src_part", F.col("source"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_part")
            .parquet(rollup_dir)
        )

    return (
        doc_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
