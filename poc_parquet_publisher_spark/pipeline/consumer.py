"""Queue-consumer analog (cmd/sqs-record-consumer/main.go:27-32).

The reference's consumer is an SQS-triggered Lambda whose entire body is
``logger.Info("records", len(event.Records))``. Against a DirectoryQueue
spool, each ``*.batch.jsonl`` file is one delivered batch event; this
module reproduces the per-event count log and returns the counts for
assertions.
"""

from __future__ import annotations

import glob
import json
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

logger = logging.getLogger(__name__)


def consume_batch_counts(spool_dir: str) -> list[int]:
    """Count messages per delivered batch, logging each like the reference."""
    counts: list[int] = []
    for path in sorted(glob.glob(os.path.join(spool_dir, "*.batch.jsonl"))):
        with open(path, encoding="utf-8") as f:
            n = sum(1 for _ in f)
        logger.info("processing records", extra={"records": n})
        counts.append(n)
    return counts


def messages_as_dataframe(
    spark: SparkSession, spool_dir: str, schema: StructType
) -> DataFrame:
    """Published messages back as a typed DataFrame (the consumer's
    downstream view: queue -> table).

    The spool is JSON-lines of SendMessageBatch entries; bodies parse
    with the SOURCE schema, closing the round-trip the reference only
    counts (rows -> to_json -> queue -> from_json -> rows). All JVM-side:
    json datasource + from_json, no driver-side parsing.
    """
    env = spark.read.json(os.path.join(spool_dir, "*.batch.jsonl"))
    return env.select(
        F.from_json(F.col("MessageBody"), schema).alias("m")
    ).select("m.*")


def read_messages(spool_dir: str) -> list[dict]:
    """Parse every published message body back to a dict (test helper)."""
    out: list[dict] = []
    for path in sorted(glob.glob(os.path.join(spool_dir, "*.batch.jsonl"))):
        with open(path, encoding="utf-8") as f:
            for line in f:
                out.append(json.loads(json.loads(line)["MessageBody"]))
    return out
