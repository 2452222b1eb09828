"""Unit + plan tests for ops/temporal.py (as-of join, band range join).

Oracle hash-parity for the registered x29/x30 entries lives in
test_queries_oracle.py; here we pin the operator semantics on
constructed frames (ties, no-match rows, bucket-boundary candidates)
and the physical plans (no nested-loop/cartesian anywhere).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from poc_parquet_publisher_spark.ops import temporal
from tests.test_plans import plan_of


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 1, 10.0),
            ("A", _ts("2024-01-01 09:00:05"), 2, 11.0),
            ("A", _ts("2024-01-01 09:01:00"), 3, 12.0),
            ("B", _ts("2024-01-01 09:00:30"), 4, 99.0),
        ],
        "sym string, qts timestamp, qid long, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:05"), 10),  # tie ts vs quote 2
            ("A", _ts("2024-01-01 09:00:59"), 11),
            ("B", _ts("2024-01-01 09:00:00"), 12),  # before any B quote
            ("C", _ts("2024-01-01 09:00:00"), 13),  # key with no quotes
        ],
        "sym string, tts timestamp, tid long",
    )
    return quotes, trades


def test_asof_backward_strict_and_unmatched(spark):
    quotes, trades = _frames(spark)
    out = {
        r["tid"]: (r["qid"], r["px"])
        for r in temporal.asof_join(
            trades,
            quotes,
            on="sym",
            left_ts="tts",
            right_ts="qts",
            right_values={"qid": "qid", "px": "px"},
            left_order="tid",
            right_order="qid",
        ).collect()
    }
    # tie at 09:00:05: quote qid=2 has (ts equal, qid 2 < tid 10) => matched
    assert out[10] == (2, 11.0)
    # 09:00:59 sees the 09:00:05 quote, not the 09:01:00 one
    assert out[11] == (2, 11.0)
    # B trade precedes every B quote -> NULLs, row still present
    assert out[12] == (None, None)
    # key with no right rows at all -> NULLs
    assert out[13] == (None, None)


def test_asof_values_come_from_one_right_row(spark):
    """A NULL in one right column must NOT be back-filled from an older
    right row: all right values are taken from the same matched row."""
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 1, 10.0, 100.0),
            ("A", _ts("2024-01-01 09:00:10"), 2, None, 200.0),
        ],
        "sym string, qts timestamp, qid long, px double, sz double",
    )
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:00:20"), 50)],
        "sym string, tts timestamp, tid long",
    )
    row = temporal.asof_join(
        left,
        right,
        on="sym",
        left_ts="tts",
        right_ts="qts",
        right_values={"qid": "qid", "px": "px", "sz": "sz"},
        left_order="tid",
        right_order="qid",
    ).collect()[0]
    # matched right row is qid=2 (px NULL, sz 200): px must stay NULL,
    # not be mixed in from the older qid=1 row
    assert (row["qid"], row["px"], row["sz"]) == (2, None, 200.0)


def test_asof_split_matches_default_under_skew(spark):
    """split_interval_seconds parallelizes a monster key across time
    chunks; output must be identical to the single-window path."""
    base = _ts("2024-01-01 00:00:00")
    # one key holds 90% of the rows
    left_rows = [
        ("HOT" if i % 10 else f"C{i}", base + datetime.timedelta(seconds=7 * i), i)
        for i in range(1000)
    ]
    right_rows = [
        ("HOT" if i % 10 else f"C{i}", base + datetime.timedelta(seconds=11 * i), i,
         float(i) if i % 3 else None)
        for i in range(1000)
    ]
    left = spark.createDataFrame(left_rows, "sym string, tts timestamp, tid long")
    right = spark.createDataFrame(right_rows, "sym string, qts timestamp, qid long, px double")
    kwargs = dict(
        on="sym", left_ts="tts", right_ts="qts",
        right_values={"qid": "qid", "px": "px"},
        left_order="tid", right_order="qid",
    )
    default = sorted(map(tuple, temporal.asof_join(left, right, **kwargs).collect()))
    split = sorted(map(tuple, temporal.asof_join(
        left, right, split_interval_seconds=600, **kwargs
    ).collect()))
    assert split == default
    # hot-key window now partitions by (key, chunk): > 1 chunk for HOT
    span = 7 * 1000  # seconds covered by left
    assert span / 600 > 2


def test_asof_plan_is_window_not_join(spark):
    quotes, trades = _frames(spark)
    plan = plan_of(
        temporal.asof_join(
            trades,
            quotes,
            on="sym",
            left_ts="tts",
            right_ts="qts",
            right_values={"px": "px"},
            left_order="tid",
            right_order="qid",
        )
    )
    # the whole operator is union + ONE keyed window: any Join node here
    # means the nested-loop formulation snuck back in
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_pairs_bounds_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:10:00"))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (20, _ts("2024-01-01 00:05:00")),  # exactly -tolerance: in
            (21, _ts("2024-01-01 00:04:59")),  # just outside: out
            (22, _ts("2024-01-01 00:15:00")),  # exactly +tolerance: in
            (23, _ts("2024-01-01 00:15:01")),  # just outside: out
            (24, _ts("2024-01-01 00:10:00")),  # same instant: in
        ],
        "rid long, rts timestamp",
    )
    got = sorted(
        r["rid"]
        for r in temporal.range_join_pairs(
            left, right, "lts", "rts", tolerance_seconds=300
        ).collect()
    )
    assert got == [20, 22, 24]


def test_range_join_pair_uniqueness_across_buckets(spark):
    # rows landing in different buckets than their partner must appear
    # exactly once (the 3-bucket probe must not duplicate pairs)
    left = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + datetime.timedelta(seconds=37 * i))
         for i in range(40)],
        "lid long, lts timestamp",
    )
    right = left.select(
        F.col("lid").alias("rid"), F.col("lts").alias("rts")
    )
    pairs = temporal.range_join_pairs(
        left, right, "lts", "rts", tolerance_seconds=60
    )
    assert pairs.count() == pairs.distinct().count()
    # spot-check the count against the exact predicate on a plain join
    exact = (
        left.crossJoin(right)
        .filter(
            F.abs(
                F.col("lts").cast("timestamp").cast("long")
                - F.col("rts").cast("timestamp").cast("long")
            )
            <= 60
        )
        .count()
    )
    assert pairs.count() == exact


def test_range_join_plan_is_equi_join(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:10:00"))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(2, _ts("2024-01-01 00:11:00"))], "rid long, rts timestamp"
    )
    plan = plan_of(
        temporal.range_join_pairs(left, right, "lts", "rts", 300)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bitemporal_asof_matches_python_replay(spark):
    """x411: replay both knowledge snapshots in pure Python -- per
    user, the effective version at (valid<=V, tx<=T) is max by
    (valid_from, then tx_from, then tier); the late snapshot must
    see the corrections the early one cannot (revision_shift sums
    to zero across tiers: corrections MOVE users between tiers)."""
    import datetime
    import hashlib  # noqa: F401

    from pyspark.sql import functions as F

    from poc_parquet_publisher_spark.catalog import load_table
    from poc_parquet_publisher_spark.queries.extensions import (
        x411_bitemporal_asof,
    )

    SF = "/root/testdata/sf0.001"
    ev = load_table(spark, SF, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "value").collect()
    versions = []
    for r in ev:
        vf = r["ts"].date()
        tier = int(r["value"] // 100)
        versions.append((r["user_id"], vf, r["ts"], tier))
        if round(r["value"] * 100) % 5 == 0:
            versions.append(
                (r["user_id"], vf,
                 r["ts"] + datetime.timedelta(days=2), tier + 1)
            )
    V = datetime.date(2024, 1, 20)
    snaps = {
        1: datetime.datetime(2024, 1, 22),
        2: datetime.datetime(2024, 2, 15),
    }
    counts = {1: {}, 2: {}}
    for sid, T in snaps.items():
        per_user = {}
        for u, vf, tx, tier in versions:
            if vf <= V and tx <= T:
                key = (vf, tx, tier)
                if u not in per_user or key > per_user[u]:
                    per_user[u] = key
        for _, (_, _, tier) in per_user.items():
            counts[sid][tier] = counts[sid].get(tier, 0) + 1
    out = x411_bitemporal_asof(spark, SF).collect()
    tiers = set(counts[1]) | set(counts[2])
    assert {r["tier"] for r in out} == tiers
    for r in out:
        assert r["users_known_early"] == counts[1].get(r["tier"], 0), r
        assert r["users_known_late"] == counts[2].get(r["tier"], 0), r
        assert r["revision_shift"] == (
            r["users_known_late"] - r["users_known_early"]
        )
    # corrections re-tier users already counted at snapshot 1, and
    # snapshot 2 additionally never loses a user: totals only grow by
    # late-arriving initial records (none here: base tx == valid ts)
    assert sum(r["revision_shift"] for r in out) == sum(
        counts[2].values()
    ) - sum(counts[1].values())
    assert any(r["revision_shift"] != 0 for r in out), (
        "no corrections visible -- fixture degenerate"
    )
