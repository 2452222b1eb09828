"""Custom stateful streaming operator via applyInPandasWithState.

The reference consumer is stateless (it logs each batch's size and
forgets it, cmd/sqs-record-consumer/main.go:27-32). A real ingest
monitor needs per-key state that SURVIVES across micro-batches --
running totals, rate trackers, dedup ledgers. Spark's primitive for
arbitrary user state is ``applyInPandasWithState``: state is keyed,
partitioned with the stream (each key's state lives on exactly one
executor -- no coordination), checkpointed with the query, and
Arrow-batched into Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import TimestampNTZType

OUTPUT_SCHEMA = "event_type string, batch_rows long, running_total long"
STATE_SCHEMA = "total long"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch_rows = sum(len(pdf) for pdf in pdfs)
    (total,) = state.get if state.exists else (0,)
    total += batch_rows
    state.update((total,))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "batch_rows": [batch_rows],
            "running_total": [total],
        }
    )


def running_event_totals(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key running event totals, one output row per key per batch.

    Emits (event_type, batch_rows, running_total): the consumer-side
    batch count the reference logs, plus the cross-batch total it
    cannot produce without state. NoTimeout keeps counters forever --
    totals are monotone; for session-style state use an event-time
    timeout tied to the watermark instead.
    """
    if isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
