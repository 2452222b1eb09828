"""Unit tests for ops/graph.py on hand-built graphs: the registry
entries (x104/x150) verify against DuckDB oracles on fixture data;
these pin the SEMANTICS on graphs small enough to check by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_parquet_publisher_spark.ops import graph


def _edges(spark, pairs):
    sym = pairs + [(v, u) for u, v in pairs]
    return spark.createDataFrame(sym, "u long, v long")


def test_bfs_levels_path_graph(spark):
    # 1-2-3-4-5 path: from node 1, levels are 1 node each for 4 hops
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {
        r["dist"]: r["n_nodes"]
        for r in graph.bfs_levels(e, hops=3).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}


def test_bfs_levels_star_plus_unreachable(spark):
    # star centered at 1 (leaves 2,3,4) plus a disconnected 10-11
    # component: everything reachable lands at hop 1, hops 2-3 are
    # EMPTY levels and must still report 0 (oracle parity)
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (10, 11)])
    out = {
        r["dist"]: r["n_nodes"]
        for r in graph.bfs_levels(e, hops=3).collect()
    }
    assert out == {0: 1, 1: 3, 2: 0, 3: 0}


def test_bfs_levels_no_revisit_on_cycle(spark):
    # triangle 1-2-3: hop 2 must not re-reach the seed or hop-1 nodes
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    out = {
        r["dist"]: r["n_nodes"]
        for r in graph.bfs_levels(e, hops=3).collect()
    }
    assert out == {0: 1, 1: 2, 2: 0, 3: 0}
