"""connected_components: label propagation correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from mora_spark.llm.cluster import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    out = connected_components(df).orderBy("node")
    return {(r.node, r.label) for r in out.collect()}


def test_path_graph_collapses_to_min(spark):
    # 1-2-3-4 chain: diameter 3, all label 1
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {
        (1, 1), (2, 1), (3, 1), (4, 1),
    }


def test_two_components(spark):
    got = _cc(spark, [(10, 20), (20, 30), (7, 8)])
    assert got == {(10, 10), (20, 10), (30, 10), (7, 7), (8, 7)}


def test_edge_direction_irrelevant(spark):
    fwd = _cc(spark, [(5, 1), (1, 9), (9, 2)])
    rev = _cc(spark, [(1, 5), (9, 1), (2, 9)])
    assert fwd == rev == {(1, 1), (2, 1), (5, 1), (9, 1)}


def test_star_and_clique(spark):
    # star (100 center) + triangle clique, converges in one round
    edges = [(100, i) for i in (101, 102, 103)] + [(1, 2), (2, 3), (1, 3)]
    got = _cc(spark, edges)
    assert got == {
        (100, 100), (101, 100), (102, 100), (103, 100),
        (1, 1), (2, 1), (3, 1),
    }
