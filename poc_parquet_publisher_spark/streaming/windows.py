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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


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
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
