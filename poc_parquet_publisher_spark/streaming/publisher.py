"""Micro-batch queue publishing over a file stream.

The reference's continuous leg: rows -> 10-message SQS batches
(cmd/parquetgo-record-processor/handler.go:199-216) -> SQS-triggered
consumer logging ``len(event.Records)`` (cmd/sqs-record-consumer/
main.go:27-32), with redrive to a DLQ after 5 failures (template.yaml:6-16).

Spark-native: ``readStream`` file source -> ``foreachBatch`` running the
SAME batch publisher (pipeline.publish), so batch and streaming share one
code path. Checkpointing makes re-delivery bookkeeping exactly-once at
the micro-batch level; inside a batch the publish remains at-least-once
under retry -- identical to SQS's own contract. A failed micro-batch
stops the query (fail-fast); restart resumes from the checkpoint, the
DLQ-redrive analog.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..pipeline.publish import SQS_BATCH_SIZE, publish

logger = logging.getLogger(__name__)


def stream_publish(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    client_factory: Callable[[], Any],
    checkpoint_dir: str,
    queue_url: str = "",
    batch_size: int = SQS_BATCH_SIZE,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Stream parquet files from ``source_dir``, publishing each micro-batch.

    ``on_batch(batch_id, rows_published)`` is the consumer-count hook
    (driver-side), mirroring the reference consumer's only observable
    behavior. ``available_now=True`` drains the current file set then
    stops -- the batch-parity mode used by tests; leave False for a
    long-running tail.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def handle(batch_df, batch_id: int) -> None:
        result = publish(
            batch_df, client_factory, queue_url=queue_url,
            batch_size=batch_size,
        )
        logger.info(
            "published micro-batch",
            extra={"batch_id": batch_id, "rows": result.published},
        )
        if on_batch is not None:
            on_batch(batch_id, result.published)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
