"""Graph analytics ops (ops/graph.py) vs hand/Python oracles."""

from __future__ import annotations

import pytest

from p5_rdf_rdb2rdf_spark.ops.graph import degrees, pagerank, triangle_count


def test_degrees_exact(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")],
        "src string, dst string",
    )
    got = {r.node: (r.out_degree, r.in_degree, r.degree) for r in degrees(edges).collect()}
    assert got == {
        "a": (2, 2, 4),
        "b": (1, 1, 2),
        "c": (1, 2, 3),
        "d": (1, 0, 1),
    }


def test_triangle_count_canonicalizes(spark):
    """K4 has 4 triangles; reversed duplicates, multi-edges and self-loops
    must not change the count."""
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    noise = [("b", "a"), ("c", "a"), ("a", "a"), ("b", "a")]  # dupes/loops
    edges = spark.createDataFrame(k4 + noise, "src string, dst string")
    assert triangle_count(edges).first().n_triangles == 4
    # removing one edge of K4 kills exactly 2 triangles
    edges2 = spark.createDataFrame(
        [e for e in k4 if e != ("a", "b")], "src string, dst string"
    )
    assert triangle_count(edges2).first().n_triangles == 2
    # triangle-free bipartite
    bip = spark.createDataFrame(
        [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)],
        "src string, dst string",
    )
    assert triangle_count(bip).first().n_triangles == 0


def _pagerank_py(edge_list, iterations, damping=0.85):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    deg = {}
    for u, _ in edge_list:
        deg[u] = deg.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        incoming = {v: 0.0 for v in nodes}
        for u, v in edge_list:
            incoming[v] += rank[u] / deg[u]
        dangling = 1.0 - sum(rank[v] for v in nodes if v in deg)
        base = (1.0 - damping) / n + damping * dangling / n
        rank = {v: base + damping * incoming[v] for v in nodes}
    return rank


@pytest.mark.parametrize("iters", [0, 1, 3])
def test_pagerank_matches_python_twin(spark, iters):
    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "c"),  # e, d feed c; f is dangling-only target
        ("c", "f"),
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(edges, iterations=iters).collect()}
    want = _pagerank_py(edge_list, iters)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_structure(spark):
    """Uniform on a cycle (perfect symmetry); the hub of an in-star
    dominates; empty edge set yields an empty frame."""
    cyc = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)], "src string, dst string"
    )
    ranks = {r.node: r.rank for r in pagerank(cyc, iterations=7).collect()}
    assert all(v == pytest.approx(1 / 6, abs=1e-12) for v in ranks.values())

    star = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(9)], "src string, dst string"
    )
    ranks = {r.node: r.rank for r in pagerank(star, iterations=5).collect()}
    assert ranks["hub"] > max(v for k, v in ranks.items() if k != "hub") * 5

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iterations=2).count() == 0
