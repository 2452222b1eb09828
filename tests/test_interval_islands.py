"""Edge-case semantics of x149's gaps-and-islands merge, pinned on
hand-built intervals (the registry entry hash-verifies against DuckDB
on fixture data; these document the merge rules)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _islands(spark, rows):
    """Mirror x149's window pipeline over (sk, ok, ln, s, e) rows."""
    df = spark.createDataFrame(
        rows, "sk long, ok long, ln long, s date, e date"
    )
    order_keys = [F.col(c) for c in ("s", "e", "ok", "ln")]
    wprev = (
        Window.partitionBy("sk")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("sk")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = df.withColumn("pe", F.max("e").over(wprev))
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("pe").isNull() | (F.col("s") > F.col("pe")), 1
            ).otherwise(0)
        ).over(wcum),
    )
    g = isl.groupBy("sk", "island").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie_")
    )
    return {
        (r["sk"], r["island"]): (r["is_"], r["ie_"])
        for r in g.collect()
    }


def _d(s):
    return datetime.date.fromisoformat(s)


def test_touching_intervals_merge(spark):
    # s == prev_end is NOT a break (break requires s > running max end):
    # [1..5] and [5..9] merge into one island
    out = _islands(
        spark,
        [(1, 1, 1, _d("2024-01-01"), _d("2024-01-05")),
         (1, 2, 1, _d("2024-01-05"), _d("2024-01-09"))],
    )
    assert out == {(1, 1): (_d("2024-01-01"), _d("2024-01-09"))}


def test_contained_interval_does_not_split(spark):
    # [1..10], [2..3], [4..12]: the short contained interval must not
    # reset the running max -- all three are one island ending 01-12
    out = _islands(
        spark,
        [(1, 1, 1, _d("2024-01-01"), _d("2024-01-10")),
         (1, 2, 1, _d("2024-01-02"), _d("2024-01-03")),
         (1, 3, 1, _d("2024-01-04"), _d("2024-01-12"))],
    )
    assert out == {(1, 1): (_d("2024-01-01"), _d("2024-01-12"))}


def test_gap_splits_and_partitions_are_independent(spark):
    # supplier 1 has a 1-day gap ([1..2], [4..5] -> two islands);
    # supplier 2's overlapping interval must not bleed across keys
    out = _islands(
        spark,
        [(1, 1, 1, _d("2024-01-01"), _d("2024-01-02")),
         (1, 2, 1, _d("2024-01-04"), _d("2024-01-05")),
         (2, 3, 1, _d("2024-01-01"), _d("2024-01-31"))],
    )
    assert out == {
        (1, 1): (_d("2024-01-01"), _d("2024-01-02")),
        (1, 2): (_d("2024-01-04"), _d("2024-01-05")),
        (2, 1): (_d("2024-01-01"), _d("2024-01-31")),
    }
