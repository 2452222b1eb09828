"""Invariant tests for ops/packing.py (sequence packing for LLM batch
assembly) -- the gates promised by the x32 registry entry:

- every doc is assigned to exactly one sequence (row count + id set
  preserved);
- per-sequence token sums respect the budget, except oversize docs
  which land in singleton sequences (and are counted by packing_stats);
- output is a pure function of the input SET: identical under
  repartitioning / arrival order;
- chunk_oversize splits docs into <= budget chunks whose sums equal the
  original token counts, with a narrow (no-shuffle) plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_parquet_publisher_spark.ops import packing
from tests.test_plans import plan_of

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    # mixed sizes incl. zero-token, exact-budget, and oversize docs
    rows = [(f"d{i:04d}", (i * 37) % 260) for i in range(500)]
    rows += [("zero", 0), ("exact", BUDGET), ("huge", 10 * BUDGET)]
    return spark.createDataFrame(rows, "doc_id string, n_tokens long")


@pytest.fixture(scope="module")
def packed(docs):
    return packing.pack_sequences(
        docs, "doc_id", "n_tokens", budget=BUDGET, n_buckets=8
    ).cache()


def test_every_doc_assigned_exactly_once(docs, packed):
    n = docs.count()
    assert packed.count() == n
    assert packed.select("doc_id").distinct().count() == n
    orig = docs.select("doc_id", F.col("n_tokens").alias("orig_tokens"))
    assert (
        packed.join(orig, "doc_id")
        .filter(F.col("n_tokens") != F.col("orig_tokens"))
        .count()
        == 0
    )


def test_budget_respected_except_oversize_singletons(packed):
    per_seq = packed.groupBy("seq").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    over = per_seq.filter(F.col("seq_tokens") > BUDGET).collect()
    # every over-budget sequence is a single oversize doc, never a
    # packing overflow
    assert all(r.n_docs == 1 for r in over)
    over_ids = {
        r.doc_id
        for r in packed.join(
            per_seq.filter(F.col("seq_tokens") > BUDGET), "seq"
        ).collect()
    }
    assert all(
        t > BUDGET
        for t in [
            r.n_tokens
            for r in packed.filter(F.col("doc_id").isin(over_ids)).collect()
        ]
    )


def test_seq_ids_unique_across_buckets(packed):
    # seq = (bucket << 32) | local index: no two buckets may collide
    buckets_per_seq = packed.groupBy("seq").agg(
        F.countDistinct("bucket").alias("nb")
    )
    assert buckets_per_seq.filter(F.col("nb") > 1).count() == 0
    assert (
        packed.filter(
            F.shiftright(F.col("seq"), 32) != F.col("bucket")
        ).count()
        == 0
    )


def test_deterministic_under_repartition(docs, packed):
    again = packing.pack_sequences(
        docs.repartition(7), "doc_id", "n_tokens", budget=BUDGET, n_buckets=8
    )
    base = sorted(map(tuple, packed.collect()))
    assert sorted(map(tuple, again.collect())) == base


def test_packing_stats_contract(spark):
    docs = spark.createDataFrame(
        [("a", 60), ("b", 40), ("c", 90), ("d", 250)],
        "doc_id string, n_tokens long",
    )
    packed = packing.pack_sequences(
        docs, "doc_id", "n_tokens", budget=100, n_buckets=1
    )
    stats = packing.packing_stats(packed, budget=100).collect()[0]
    # FFD on one bucket: [250->own seq flagged oversize], [90], [60+40]
    assert stats.n_seqs == 3
    assert stats.n_oversize == 1
    # fill_rate averages within-budget seqs only: (1.0 + 0.9) / 2
    assert float(stats.fill_rate) == pytest.approx(0.95)


def test_chunk_oversize_sums_and_bounds(spark):
    docs = spark.createDataFrame(
        [("a", 250), ("b", 100), ("c", 1), ("d", 301)],
        "doc_id string, n_tokens long",
    )
    chunks = packing.chunk_oversize(docs, "doc_id", "n_tokens", budget=100)
    rows = chunks.collect()
    assert all(0 < r.n_tokens <= 100 for r in rows)
    sums = {
        r.doc_id: r.total
        for r in chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    assert sums == {"a": 250, "b": 100, "c": 1, "d": 301}
    # chunk indices are dense from 0
    idx = sorted(r.chunk_idx for r in rows if r.doc_id == "d")
    assert idx == [0, 1, 2, 3]
    # narrow plan: sequence+posexplode only, no shuffle
    assert "Exchange" not in plan_of(chunks)


def test_chunked_then_packed_roundtrip(spark):
    """The documented composition: chunk_oversize -> pack_sequences on
    (id, chunk_idx) leaves no over-budget sequence at all."""
    docs = spark.createDataFrame(
        [(f"d{i}", 50 + 97 * i) for i in range(40)],
        "doc_id string, n_tokens long",
    )
    chunks = packing.chunk_oversize(
        docs, "doc_id", "n_tokens", budget=BUDGET
    ).withColumn(
        "chunk_id", F.concat_ws("#", "doc_id", F.col("chunk_idx").cast("string"))
    )
    packed = packing.pack_sequences(
        chunks, "chunk_id", "n_tokens", budget=BUDGET, n_buckets=4
    )
    per_seq = packed.groupBy("seq").agg(F.sum("n_tokens").alias("t"))
    assert per_seq.filter(F.col("t") > BUDGET).count() == 0
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == sum(
        50 + 97 * i for i in range(40)
    )
