"""Parquet -> queue publishing pipeline (SURVEY.md section 3, entry point 1).

Spark-native rebuild of the reference's Lambda pipeline
(cmd/parquetgo-record-processor/handler.go): request envelope -> parquet
scan -> per-row JSON -> 10-message queue batches, fail-fast, plus the
batch-count consumer analog (cmd/sqs-record-consumer/main.go:27-32).
"""

from .consumer import consume_batch_counts
from .ingest import read_request, resolve_paths
from .publish import (
    DEFAULT_MAX_ATTEMPTS,
    DirectoryQueue,
    PublishResult,
    publish,
    run_pipeline,
    serialize_json,
)

__all__ = [
    "DEFAULT_MAX_ATTEMPTS",
    "DirectoryQueue",
    "PublishResult",
    "consume_batch_counts",
    "publish",
    "read_request",
    "resolve_paths",
    "run_pipeline",
    "serialize_json",
]
