"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q5-shaped multiway join,
  q12_join_multiway) on /root/testdata/sf0.001.
- ``queries()``: every implemented operator from SURVEY.md section 2
  (declared set Q01-Q28 + LLM-pipeline extensions).
- ``oracle_sql()``: DuckDB-dialect equivalents for every
  SQL-expressible entry; approximate operators (MinHash LSH, hyperplane
  ANN, simhash banding) are rows-only by design and validated against
  exact baselines in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from poc_parquet_publisher_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from poc_parquet_publisher_spark.queries.declared import q12_join_multiway

    return q12_join_multiway(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return all_oracles()
