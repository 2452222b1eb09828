"""Data layout management for parquet at scale: partitioned writes and
small-file compaction.

The reference's only layout control is a size-bounded single file
(cmd/create-test-data/main.go:57-91: flush every 10k rows, stop at
1 GB). At 100 TB a single unpartitioned directory is unusable -- every
query scans everything -- so this module provides the two layout
operations a production lake needs:

- ``write_partitioned``: hive-style ``partitionBy`` directories (e.g.
  ``event_date=2024-01-05/``) so Catalyst prunes whole partitions at
  planning time (visible as ``PartitionFilters`` in the scan node),
  plus in-file ordering via ``sortWithinPartitions`` so parquet
  row-group min/max stats prune within files. One ``repartition`` on
  the partition columns keeps each output directory written by as few
  tasks as possible -- without it, every one of the N shuffle tasks can
  emit a file into every one of the P directories (N*P small files,
  the classic lake pathology).
- ``compact``: rewrite a directory tree to a bounded file count per
  partition, the standard maintenance pass after streaming/incremental
  ingestion leaves thousands of KB-sized files behind.

Row-group sizing (the reference's flush interval) maps to
``parquet.block.size``; per-file row bounds to ``maxRecordsPerFile``.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hive-partitioned parquet tree.

    Shuffles once on the partition columns so each output directory is
    produced by the tasks that own that key range (bounded file count),
    then sorts within tasks so row groups carry tight min/max stats on
    ``sort_cols`` -- the two cheap layout decisions that make every
    later scan prune both partitions and row groups.

    ``max_records_per_file`` bounds any one file (the reference's 1 GB
    stop condition, expressed in rows); AQE may still coalesce tiny
    partitions into fewer tasks.
    """
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def data_files(path: str) -> list[str]:
    """All parquet data files under a (possibly partitioned) tree."""
    found: list[str] = []
    for root, _dirs, files in os.walk(path):
        found.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return found


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    partition_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet tree into ~``target_file_bytes`` files.

    Reads the tree, computes the output task count from the observed
    on-disk bytes (so compression ratio is measured, not guessed --
    the same bytes-per-row sampling trick the generator uses for the
    reference's 1 GB stop condition), and rewrites. Partitioned trees
    keep their partitioning; the write goes to a staging directory
    first and swaps in atomically-ish (rename) so a crashed compaction
    never leaves the table half-rewritten.

    Returns {files_before, files_after, bytes}.
    """
    files = data_files(path)
    if not files:
        raise ValueError(f"no parquet data files under {path}")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)

    staging = path.rstrip("/") + "._compact_tmp"
    if partition_cols:
        # keep the hive layout; bound files per directory via coalesced
        # shuffle on the partition key
        out = df.repartition(*[F.col(c) for c in partition_cols])
        if sort_cols:
            out = out.sortWithinPartitions(*partition_cols, *sort_cols)
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            staging
        )
    else:
        out = df.repartition(n_out)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(staging)

    import shutil

    backup = path.rstrip("/") + "._compact_old"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return {
        "files_before": len(files),
        "files_after": len(data_files(path)),
        "bytes": total_bytes,
    }
