"""Tumbling-window event counts with late-data handling (Q27's streaming
variant, SURVEY.md section 2.3).

The reference has no windowed aggregation -- its consumer only counts a
batch (cmd/sqs-record-consumer/main.go:29). This is the declared Spark
extension: ``groupBy(window(ts, '1 hour'))`` with a watermark so state is
bounded (late rows past the watermark are dropped instead of growing
state forever -- the property that keeps a continuous 100 TB/day stream's
memory flat).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

# Serializes the set/start/restore dance below: the shuffle-partition conf
# is session-global, so two threads starting streams (or one starting a
# stream while another plans a batch query) could otherwise observe the
# temporary value or race the restore.
_START_LOCK = threading.Lock()


def _start_with_state_partitions(
    spark: SparkSession, writer, state_partitions: int | None
) -> StreamingQuery:
    """Start a streaming query with its state-store count sized to the
    expected STATE, not the session's CPU-count shuffle default: every
    stateful operator instantiates shuffle-partition-count state stores
    (pinned by the checkpoint forever), and each store pays open/commit
    overhead per micro-batch -- measured 14.5 s -> 3.4 s at sf0.1 for
    the stream-stream join going 32 -> 8. The conf is read at query
    START only, so it is set around .start() and restored after."""
    if state_partitions is None:
        return writer.start()
    with _START_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            return writer.start()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) per tumbling window.

    Works identically on a batch or streaming DataFrame (withWatermark is
    a no-op in batch), so tests can assert stream == batch on one code
    path. The sum goes through DECIMAL: partial aggregation order differs
    between micro-batch and batch plans, and double addition is not
    associative.

    Watermarks reject TIMESTAMP_NTZ (the type the nanos fixtures load
    as); with the session zone pinned to UTC (catalog contract) the cast
    to TIMESTAMP is value-preserving.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,8)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_hourly_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    sink_table: str = "hourly_counts",
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    state_partitions: int = 8,
) -> StreamingQuery:
    """File stream -> windowed counts -> in-memory sink (drain-and-stop).

    Complete output mode: every trigger rewrites the full window table,
    which keeps the final answer independent of how files were split into
    micro-batches (append mode would hold back windows the watermark has
    not passed at end-of-stream).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(
        stream,
        window_duration=window_duration,
        watermark=watermark,
    )
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return _start_with_state_partitions(spark, writer, state_partitions)


def session_event_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key SESSION windows via Spark's native ``session_window``:
    events merge while consecutive gaps stay UNDER ``gap``; the window
    closes ``gap`` after its last event. The dynamic-window operator the
    x21 lag/gap method emulates relationally -- here state merging is
    native (and streaming-capable: with the watermark, closed sessions
    are finalized and state is evicted, keeping memory flat on an
    unbounded stream).

    Output: (key, session_start, session_end, n_events) where
    session_end = last event + gap (the operator's window end).

    Works identically on batch and streaming input (withWatermark is a
    batch no-op), so tests assert stream == batch on one code path.
    Session-window semantics note for the oracle: a gap EXACTLY equal to
    ``gap`` starts a new session (window ends are exclusive), so the
    relational mirror must split on ``>=``, not ``>``.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_session_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    sink_table: str = "session_counts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    state_partitions: int = 8,
) -> StreamingQuery:
    """File stream -> native session windows -> in-memory sink.

    Complete output mode for the same reason as the tumbling drain:
    the final table must not depend on how files were micro-batched,
    and append mode would hold back sessions the watermark has not
    closed at end-of-stream.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = session_event_counts(
        stream, key_col=key_col, gap=gap, watermark=watermark
    )
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return _start_with_state_partitions(spark, writer, state_partitions)


def enriched_segment_counts(
    events: DataFrame,
    customer: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """STREAM-STATIC enrichment join + windowed rollup: events (stream
    or batch) LEFT-join a broadcast customer dimension on user_id, then
    tumble into per-(window, market-segment) counts -- the standard
    "enrich the firehose against a slowly-changing dim" shape.

    Stream-static joins need no watermark on the static side and keep
    NO join state: each micro-batch probes the broadcast dim and moves
    on, so a 100 TB/day stream joins a dim table at scan speed. LEFT
    join so events with no dim row survive (segment NULL -> 'unknown'),
    exactly what a late-arriving dim row must not silently drop.

    Works identically on batch input (withWatermark + broadcast are
    batch no-ops/hints), so the oracle's plain SQL join hash-matches
    the drained stream -- stream == batch is the correctness contract.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        events.withWatermark(ts_col, watermark)
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias(
                "segment"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL accumulation (x27 contract): distinct aggregates
            # are unsupported on streams, and double sums are partial-
            # aggregation-order dependent
            F.round(
                F.sum(F.col("value").cast("decimal(30,8)")).cast(
                    "double"
                ),
                4,
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "sum_value",
        )
    )


def streaming_segment_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    customer: DataFrame,
    checkpoint_dir: str,
    sink_table: str = "segment_counts",
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    state_partitions: int = 8,
) -> StreamingQuery:
    """File stream -> broadcast dim join -> windowed counts -> memory
    sink (complete mode + availableNow drain, the x27 contract)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = enriched_segment_counts(
        stream,
        customer,
        window_duration=window_duration,
        watermark=watermark,
    )
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return _start_with_state_partitions(spark, writer, state_partitions)


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "24 hours",
    watermark: str = "48 hours",
) -> DataFrame:
    """STREAM-STREAM interval join: attribute each click to every view
    by the same user within the trailing attribution window -- the
    ad-attribution / funnel-stitching shape that needs state on BOTH
    sides (a view must wait for clicks that haven't arrived; a click
    must probe views already seen).

    Inner stream-stream joins emit a pair the moment both sides have
    arrived; the watermarks plus the time-interval bound let Spark
    EVICT join state older than (watermark + window), which is what
    keeps a continuous stream's state flat -- without the interval
    condition the view side would buffer forever. Works identically on
    batch inputs (withWatermark is a batch no-op), so the oracle's
    plain interval-join SQL hash-matches the drained stream.
    """
    from pyspark.sql.types import TimestampNTZType

    def _ts(df: DataFrame) -> DataFrame:
        if isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    v = (
        _ts(views)
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    c = (
        _ts(clicks)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (
            F.col("v_ts")
            >= F.col("c_ts") - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return c.join(v, cond).select(
        "click_id",
        "view_id",
        F.col("user_id").cast("long").alias("user_id"),
        (
            F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")
        ).cast("long").alias("gap_sec"),
    )


def streaming_attribution(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    sink_table: str = "attribution_pairs",
    attribution_window: str = "24 hours",
    watermark: str = "48 hours",
    state_partitions: int = 8,
) -> StreamingQuery:
    """One events file-stream forked into view/click branches (two
    filtered views of the SAME readStream -- a streaming self-join),
    interval-joined, appended to a memory sink, drained with
    availableNow (the x27 contract; append mode because inner
    stream-stream joins emit matches immediately).

    ``state_partitions`` sizes the state stores: a stream-stream join
    instantiates shuffle-partition-count state stores PER SIDE, and
    that count is pinned by the checkpoint forever -- so it must track
    expected STATE size (rows inside watermark + window), not cluster
    CPU count. Oversizing is pure per-batch overhead (store open/
    commit/snapshot x partitions; measured 14.5 s -> 3.4 s at sf0.1
    going 32 -> 8); undersizing caps join parallelism. The conf is
    read at query START, so it is set around .start() and restored
    immediately after."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    pairs = view_click_attribution(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "click"),
        attribution_window=attribution_window,
        watermark=watermark,
    )
    writer = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return _start_with_state_partitions(spark, writer, state_partitions)
