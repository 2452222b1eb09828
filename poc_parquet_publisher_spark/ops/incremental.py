"""Incremental cross-batch deduplication: the continuous-ingestion leg.

A crawl/ingest pipeline receives drops daily; dedup must hold ACROSS
drops without re-scanning the accumulated corpus. The standard shape is
a persistent hash index (one narrow parquet table of text hashes):

1. dedup the new batch internally (one hash-groupBy, min-id survivor);
2. anti-join its hashes against the index -- a hash-partitioned join
   against a hash-only table, NOT against the corpus text;
3. append the surviving hashes to the index.

The index is ~16 bytes/doc -- at 10B docs it is ~300 GB of parquet, a
broadcast-infeasible but comfortably joinable table, and the anti-join
shuffles only (hash, id), never document text. Streaming analog:
``streaming/dedup.py`` (dropDuplicatesWithinWatermark) for in-flight
windows; this module is the batch/backfill path with unbounded lookback.

Append-mode durability: each batch writes its new hashes as its own
parquet files (no rewrite of the index); a crashed run re-appends the
same hashes on retry, which is harmless -- the anti-join semantics are
idempotent under duplicate index rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _index_exists(spark: SparkSession, index_path: str) -> bool:
    from ..pipeline.layout import _fs_for

    fs, jpath = _fs_for(spark, index_path)
    return bool(fs.exists(jpath))


def incremental_dedup(
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    update_index: bool = True,
) -> DataFrame:
    """Rows of ``batch`` not seen in any prior batch (by normalized text
    hash), deduped within the batch first (min id survives). With
    ``update_index`` the survivors' hashes are appended to the index, so
    the next call sees them.

    Returns the surviving rows with their ``__h`` hash column dropped.
    """
    spark = batch.sparkSession
    h = F.md5(F.lower(F.col(text_col))).alias("__h")
    hashed = batch.withColumn("__h", h)
    # within-batch: min id per hash survives (same rule as exact_dedup)
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    fresh = hashed.join(keep, ["__h", id_col], "left_semi")
    if _index_exists(spark, index_path):
        seen = spark.read.parquet(index_path)
        fresh = fresh.join(seen, fresh["__h"] == seen["h"], "left_anti")
    if update_index:
        # materialize before the append: the survivors' plan reads the
        # index, and appending to a parquet path while a plan reading
        # it is still lazy is a correctness hazard
        fresh = fresh.localCheckpoint()
        fresh.select(F.col("__h").alias("h")).write.mode("append").parquet(
            index_path
        )
    return fresh.drop("__h")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Corpus snapshot diff: classify every document id across two
    dataset versions as added / removed / changed / unchanged by
    content hash -- the audit step of dataset versioning (what changed
    between crawl N and crawl N+1, what incremental_dedup must
    reprocess, what a training run's data card should report).

    Output: (id, status), one row per id present in either snapshot.

    Scale shape: each side reduces to a narrow (id, md5) projection at
    scan time, then ONE full-outer equi-join on the id -- shuffle on
    the join key only, content never moves twice. At 100 TB both sides
    prune to two columns (ReadSchema) and the join is sort-merge on
    id; no collect, no window.
    """
    oh = old.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("old_h")
    )
    nh = new.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("new_h")
    )
    joined = oh.join(nh, "id", "full_outer")
    status = (
        F.when(F.col("old_h").isNull(), F.lit("added"))
        .when(F.col("new_h").isNull(), F.lit("removed"))
        .when(F.col("old_h") == F.col("new_h"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("id").alias(id_col), status.alias("status")
    )
