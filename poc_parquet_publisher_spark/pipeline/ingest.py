"""Request-envelope ingestion: {bucket, paths[]} -> one DataFrame.

Reference behavior being rebuilt:
- request/response JSON envelope (cmd/parquetgo-record-processor/
  handler.go:28-37, cmd/duckdb-record-processor/handler.go:17-26)
- per-path S3 GetObject + io.Copy staging to a temp dir
  (cmd/parquetgo-record-processor/handler.go:108-148) -- REPLACED by
  direct ``s3a://`` reads: at 100 TB, staging a full copy per worker is a
  non-starter, and a direct scan keeps predicate pushdown and split
  planning against the object store.
- the multi-file loop (handler.go:118) -- replaced by one
  ``spark.read.parquet(*paths)`` over all files, so Spark plans splits
  across the whole file set instead of processing files serially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import ensure_session_confs


def resolve_paths(bucket: str | None, paths: list[str]) -> list[str]:
    """Map the request envelope to datasource URIs.

    With a bucket, keys become ``s3a://bucket/key`` (the s3a endpoint /
    credentials come from session conf, mirroring the reference's
    S3_ENDPOINT_OVERRIDE -- session.build_session). Without one, paths are
    used verbatim (local files, absolute paths, or full URIs).
    """
    if not paths:
        raise ValueError("request contains no paths")
    if bucket:
        return [f"s3a://{bucket}/{p.lstrip('/')}" for p in paths]
    return list(paths)


def read_request(spark: SparkSession, request: dict) -> DataFrame:
    """{bucket, paths[]} -> DataFrame over every requested parquet file."""
    ensure_session_confs(spark)
    uris = resolve_paths(request.get("bucket"), list(request.get("paths", [])))
    return spark.read.parquet(*uris)
