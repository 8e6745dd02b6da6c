"""PageRank: hand-graph semantics vs an integer reference replay, plus
mass-accounting and fixture-level shape checks."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from litebase_spark.operators.graph import (
    _DAMP_DEN,
    _DAMP_NUM,
    _SCALE,
    graph_pagerank,
    pagerank,
    purchase_edges,
)


def reference_pagerank(nodes, edges, iters):
    """Pure-Python integer replay of the registered algorithm."""
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = _SCALE // n
    teleport = (_DAMP_DEN - _DAMP_NUM) * base // _DAMP_DEN
    rank = {v: base for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if v not in outdeg)
        in_mass = {v: 0 for v in nodes}
        for s, d in edges:
            in_mass[d] += rank[s] // outdeg[s]
        share = dangling // n
        rank = {
            v: teleport + _DAMP_NUM * (in_mass[v] + share) // _DAMP_DEN
            for v in nodes
        }
    return rank


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_integer_reference(spark, iters):
    # A -> B, A -> C, B -> C; C dangling. Asymmetric on purpose.
    nodes_py = [1, 2, 3]
    edges_py = [(1, 2), (1, 3), (2, 3)]
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, 3, iters=iters).collect()
    }
    assert got == reference_pagerank(nodes_py, edges_py, iters)


def test_pagerank_mass_approximately_conserved(spark):
    nodes_py = list(range(1, 8))
    edges_py = [(1, 2), (2, 3), (3, 1), (4, 1), (5, 6), (6, 5), (1, 7)]
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    ranks = pagerank(nodes, edges, len(nodes_py), iters=5)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    # Integer truncation leaks at most a few units per node per round.
    assert abs(total - _SCALE) < len(nodes_py) * 5 * 200
    assert ranks.filter(F.col("rank") <= 0).count() == 0


def test_pagerank_fixture_shape(spark, sf_dir):
    out = graph_pagerank(spark, sf_dir).collect()
    assert len(out) == 25
    ranks = [r["rank_e12"] for r in out]
    assert ranks == sorted(ranks, reverse=True)
    # Every supplier with sales should outrank leaf customers: the top
    # of the purchase graph is supplier-dominated.
    assert out[0]["node_kind"] == "supplier"
    # Deterministic across runs (partition-invariant integer algebra).
    again = [tuple(r) for r in graph_pagerank(spark, sf_dir).collect()]
    assert again == [tuple(r) for r in out]


def test_purchase_edges_distinct(spark, sf_dir):
    e = purchase_edges(spark, sf_dir)
    assert e.count() == e.distinct().count()


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_pagerank_random_graphs_match_reference(spark, seed):
    import random

    rng = random.Random(seed)
    nodes_py = list(range(1, 21))
    edges_py = sorted({
        (rng.randint(1, 20), rng.randint(1, 20)) for _ in range(40)
    })
    edges_py = [(s, d) for s, d in edges_py if s != d]
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, 20, iters=4).collect()
    }
    assert got == reference_pagerank(nodes_py, edges_py, 4)


def test_triangle_count_hand_graph(spark, tmp_path):
    """Orders {1:(A,B,C), 2:(A,B,C), 3:(A,B), 4:(B,D), 5:(B,D)}:
    edges with >=2 co-orders are AB, AC, BC, BD -> exactly one triangle
    (A,B,C); BD dangles off it."""
    from litebase_spark.operators.graph import graph_triangle_count

    rows = []
    baskets = {1: "ABC", 2: "ABC", 3: "AB", 4: "BD", 5: "BD"}
    part_id = {c: i + 1 for i, c in enumerate("ABCD")}
    for ok, parts in baskets.items():
        for c in parts:
            rows.append((ok, part_id[c]))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = str(tmp_path / "tri")
    li.write.parquet(f"{d}/lineitem.parquet")
    out = [tuple(r) for r in graph_triangle_count(spark, d).collect()]
    assert out == [(1, 2, 3)]  # (A, B, C), once, canonically ordered
