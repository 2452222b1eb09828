"""Temporal join operators Spark lacks as built-ins: as-of join and
tolerance (band) range join.

Both are expressed as compositions of existing DataFrame ops -- no
Python UDFs, no cartesian products -- so they inherit Catalyst's
pushdown/pruning and stay shuffle-minimal:

- ``asof_join``: ONE shuffle (the key partition for a window running
  ``last(..., ignorenulls)`` over the union of both sides). The usual
  formulation -- a theta-join ``l.ts >= r.ts`` + per-left-row argmax --
  plans as a broadcast-nested-loop or cartesian and dies at scale; the
  union+window form carries O(1) running state per key partition.
- ``range_join_pairs``: |l.ts - r.ts| <= tolerance via time-bucket
  blocking. Naive inequality joins also plan as nested-loop; bucketing
  turns the band predicate into an equi-join on the bucket id (the
  left side probes its 3 covering buckets), then an exact residual
  filter. Shuffle volume is the two inputs, never their product.

The reference has no temporal joins (SURVEY.md section 2.1: joins live
inside its embedded DuckDB, unexercised); these are north-star
extension operators in the x-series registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: dict[str, str],
    left_order: str,
    right_order: str,
    split_interval_seconds: float | None = None,
) -> DataFrame:
    """Attach to each left row the most recent right row of the same key.

    "Most recent" is backward-looking and strict under the composite
    sort key ``(ts, order, side)`` with right rows ordering before left
    rows on full ties: a right row matches a left row iff
    ``(r.ts, r.order) < (l.ts, l.order)`` lexicographically (when the
    order columns share one id space, e.g. both sides filtered from one
    event log) or ``r.ts <= l.ts`` with deterministic tie resolution
    otherwise. Unmatched left rows keep NULLs (left-join semantics).

    ``right_values`` maps right-side columns to their output aliases;
    aliases must not collide with left's columns. ALL value columns are
    taken from the SAME matched right row: the window fills one struct
    of every right value (``last(struct(...), ignorenulls=True)``), so a
    NULL in one right column is never back-filled from an older row.

    Scale shape: one hash partition by ``on``; within each key the
    window keeps O(1) running state (``last`` over an ever-growing
    frame is incremental, not re-scanned). A monster key serializes
    into one task -- pass ``split_interval_seconds`` to pre-split every
    key by coarse time range and stitch the boundaries: the window then
    partitions by (key, time-chunk) so a hot key parallelizes across
    its chunks, and a small per-(key, chunk) carry-in table (last right
    row of every earlier chunk, broadcast-joined back) restores
    cross-chunk matches exactly.
    """
    out_aliases = list(right_values.values())
    rv_type = T.StructType(
        [
            T.StructField(alias, right.schema[rc].dataType, True)
            for rc, alias in right_values.items()
        ]
    )

    def _null_like(df: DataFrame, name: str) -> Column:
        return F.lit(None).cast(df.schema[name].dataType)

    left_payload = [c for c in left.columns if c != on]
    l_side = left.select(
        F.col(on),
        F.col(left_ts).alias("__ats"),
        F.col(left_order).alias("__ord"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_side = right.select(
        F.col(on),
        F.col(right_ts).alias("__ats"),
        F.col(right_order).alias("__ord"),
        F.lit(0).alias("__side"),
        *[_null_like(left, c).alias(c) for c in left_payload],
        F.struct(
            *[F.col(rc).alias(alias) for rc, alias in right_values.items()]
        ).alias("__rv"),
    )
    unioned = l_side.unionByName(r_side)

    if split_interval_seconds is None:
        w = (
            Window.partitionBy(on)
            .orderBy("__ats", "__ord", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            F.col(on),
            F.col("__side"),
            *[F.col(c) for c in left_payload],
            F.last("__rv", ignorenulls=True).over(w).alias("__rv"),
        )
    else:
        filled = _asof_fill_split(
            unioned, on, left_payload, split_interval_seconds
        )

    return filled.filter(F.col("__side") == 1).select(
        F.col(on),
        *[F.col(c) for c in left_payload],
        *[F.col(f"__rv.{alias}").alias(alias) for alias in out_aliases],
    )


def _asof_fill_split(
    unioned: DataFrame,
    on: str,
    left_payload: list[str],
    split_interval_seconds: float,
) -> DataFrame:
    """Skew-hardened fill: window per (key, time-chunk) + carry-stitch.

    Chunks partition time, so every row of an earlier chunk strictly
    precedes every row of a later one; the within-chunk window is
    exact locally, and the carry-in (last right struct of any earlier
    chunk, computed over the tiny (key, chunk) summary table and
    broadcast back) is exact for rows with no in-chunk predecessor.
    """
    ats_type = unioned.schema["__ats"].dataType
    if isinstance(ats_type, (T.TimestampType, T.TimestampNTZType)):
        epoch = F.unix_micros(F.col("__ats").cast("timestamp"))
        width = int(round(split_interval_seconds * 1_000_000))
    else:  # numeric ordering column: interval is in the column's units
        epoch = F.col("__ats").cast("double")
        width = split_interval_seconds
    chunked = unioned.withColumn("__chunk", F.floor(epoch / width))

    w_local = (
        Window.partitionBy(on, "__chunk")
        .orderBy("__ats", "__ord", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = chunked.select(
        F.col(on),
        F.col("__chunk"),
        F.col("__side"),
        *[F.col(c) for c in left_payload],
        F.last("__rv", ignorenulls=True).over(w_local).alias("__rv"),
    )

    # (key, chunk) -> last right struct of THAT chunk; chunks with no
    # right rows keep a NULL summary so the carry window skips them.
    summaries = chunked.groupBy(on, "__chunk").agg(
        F.max_by(
            "__rv", F.when(F.col("__side") == 0, F.struct("__ats", "__ord"))
        ).alias("__rv_last")
    )
    w_carry = (
        Window.partitionBy(on)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        F.col(on),
        F.col("__chunk"),
        F.last("__rv_last", ignorenulls=True).over(w_carry).alias("__carry"),
    )
    return (
        local.join(F.broadcast(carry), [on, "__chunk"], "left")
        .withColumn("__rv", F.coalesce("__rv", "__carry"))
        .drop("__chunk", "__carry")
    )


def _epoch_us(ts_col: str) -> Column:
    # TIMESTAMP_NTZ (the fixtures' type) won't feed unix_micros directly;
    # the cast is value-preserving under the pinned UTC session zone.
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: float,
) -> DataFrame:
    """All (left, right) pairs with |left.ts - right.ts| <= tolerance.

    Blocking: bucket both sides by ``floor(epoch_us / tolerance_us)``;
    any in-band pair differs by at most one bucket, so the left side
    probes buckets {b-1, b, b+1} (a 3x explode of the SMALLER side's
    keys only -- pass the smaller relation as ``left``), the join is a
    pure equi-join on the bucket id, and an exact residual filter
    removes corner-of-bucket false candidates. Each true pair is
    produced exactly once (each right row owns a single bucket).

    Inclusive bounds, computed in microseconds -- matches an
    ``r.ts BETWEEN l.ts - INTERVAL t AND l.ts + INTERVAL t`` predicate
    exactly at the engines' shared micros precision.

    Output: all left columns, then all right columns (caller aliases
    to avoid collisions). At 100 TB the shuffle moves each input once,
    keyed by time bucket; skew only appears if one tolerance-width
    window holds a disproportionate share of rows, in which case
    shrink the bucket width below the tolerance and probe more buckets.
    """
    tol_us = int(round(tolerance_seconds * 1_000_000))
    if tol_us <= 0:
        raise ValueError("tolerance_seconds must be positive")
    l_us = _epoch_us(left_ts)
    r_us = _epoch_us(right_ts)
    l_bucket = F.floor(l_us / tol_us)
    probes = F.explode(
        F.array(l_bucket - 1, l_bucket, l_bucket + 1)
    ).alias("__bucket")
    l_side = left.select("*", l_us.alias("__lus"), probes)
    r_side = right.select(
        "*", r_us.alias("__rus"), F.floor(r_us / tol_us).alias("__bucket")
    )
    return (
        l_side.join(r_side, "__bucket")
        .filter(F.abs(F.col("__lus") - F.col("__rus")) <= tol_us)
        .drop("__bucket", "__lus", "__rus")
    )
