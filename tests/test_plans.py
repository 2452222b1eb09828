"""Physical-plan quality gates (SURVEY.md section 4.3: "verify with
df.explain in tests").

Correctness tests prove the answers match; these prove the PLANS are the
ones that survive a 100x scale-up: filters reach the parquet scan, scans
prune columns, small dims broadcast, top-k never global-sorts, and the
hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import pytest

from poc_parquet_publisher_spark.queries.declared import (
    q02_scan_project,
    q04_filter,
    q07_group_agg,
    q12_join_multiway,
    q16_join_broadcast,
    q20_topk,
)

SF = "/root/testdata/sf0.001"


def plan_of(df, execute: bool = False) -> str:
    if execute:
        # AQE finalizes (and codegens) the plan only once it runs
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(q04_filter(spark, SF))
    assert "PushedFilters: [" in plan
    # both conjuncts pushed: status equality and totalprice bound
    # (plan toString truncates long filter lists -- match prefixes)
    assert "EqualTo(o_orderstatus" in plan
    assert "GreaterThan(o_total" in plan


def test_column_pruning_in_scan(spark):
    plan = plan_of(q02_scan_project(spark, SF))
    # ReadSchema carries only the 4 projected columns, not all 16
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    for col in ("l_comment", "l_shipmode", "l_partkey"):
        assert col not in read_schema


def test_small_dims_broadcast(spark):
    assert "BroadcastHashJoin" in plan_of(q16_join_broadcast(spark, SF))
    # multiway join: nation/region (tiny) must broadcast, never shuffle
    plan = plan_of(q12_join_multiway(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    # ORDER BY ... LIMIT k must plan as TakeOrderedAndProject: a global
    # Sort of the full table would shuffle everything at 100 TB
    plan = plan_of(q20_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan


def test_agg_is_partial_then_final(spark):
    # partial (map-side) + final HashAggregate pair: the shuffle carries
    # one row per group per partition, not one per input row
    plan = plan_of(q07_group_agg(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_hot_path_stays_in_codegen(spark):
    plan = plan_of(q07_group_agg(spark, SF), execute=True)
    assert "isFinalPlan=true" in plan
    # '*(N)' prefixes mark WholeStageCodegen spans; both aggregate stages
    # (partial and final) must sit inside one
    import re

    assert re.search(r"\*\(\d+\) HashAggregate", plan)


@pytest.mark.parametrize("qfn", [q02_scan_project, q04_filter, q20_topk])
def test_no_cartesian_anywhere(spark, qfn):
    assert "CartesianProduct" not in plan_of(qfn(spark, SF))


def test_ann_scoring_plans_are_join_based(spark):
    """The LSH/IVF scale contract in the PLAN: candidate scoring is an
    equi-join back to the corpus (SortMergeJoin/BroadcastHashJoin/
    ShuffledHashJoin on ids), never a cartesian product, and the
    near-dup self-join goes through the band equi-key."""
    from poc_parquet_publisher_spark.catalog import load_table
    from poc_parquet_publisher_spark.ops import similarity
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    for df in (
        similarity.lsh_topk(
            emb, q, "vec_id", "embedding", dim=64, k=3,
            n_planes=16, n_bands=4,
        ),
        similarity.lsh_neardup_pairs(
            emb, "vec_id", "embedding", dim=64, threshold=0.4
        ),
    ):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "Join" in plan


def test_stratified_sample_is_shuffle_free(spark):
    """x25 is a pure narrow filter: the per-stratum CASE folds into the
    scan's filter stage -- no Exchange anywhere in the plan."""
    from poc_parquet_publisher_spark.catalog import load_table
    from poc_parquet_publisher_spark.ops import sampling

    docs = load_table(spark, SF, "documents")
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"es": 0.75, "zh": 0.25},
        default_fraction=0.5,
    )
    assert "Exchange" not in plan_of(out)
