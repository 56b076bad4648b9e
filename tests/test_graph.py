"""PageRank (operators/graph.py): engine vs an independent pure-Python
replay, plus the semantics the oracle pins (symmetry, dangling mass,
apriori prune)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators.graph import (
    copurchase_edges,
    pagerank,
)


def _py_pagerank(edges, damping=0.85, n_iter=5):
    """Reference replay: dict-based, same semantics as the module
    docstring (uniform init over edge-table nodes, dangling mass
    dropped)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += r[u] / outdeg[u]
        r = {v: (1 - damping) / n + damping * contrib[v] for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {row["id"]: row["pr"] for row in pagerank(df, **kw).collect()}


def test_pagerank_matches_python_replay(spark):
    # two triangles bridged by one edge, symmetrized
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    got = _run(spark, edges)
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # symmetric graph has no dangling nodes: total mass is conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_dropped(spark):
    # 1 -> 2 only: node 2 has no out-edges, its mass is dropped
    got = _run(spark, [(1, 2)])
    assert abs(got[1] - 0.15 / 2) < 1e-12  # teleport only, every round
    want = _py_pagerank([(1, 2)])
    assert abs(got[2] - want[2]) < 1e-12
    assert sum(got.values()) < 1.0


def test_copurchase_edges_symmetric_and_pruned(spark):
    rows = [
        # parts 10, 11 co-occur in orders 1 and 2 (support 2 — kept);
        # part 12 appears once (below min_support — pruned pre-join)
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r["src"], r["dst"]) for r in copurchase_edges(li, min_support=2).collect()}
    assert got == {(10, 11), (11, 10)}


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_triangle_counts_known_graph(spark):
    """K4 has 4 triangles, 3 per node; a pendant vertex has 0; a
    square (C4) has none."""
    from data_integration_and_harmonization_spark.operators.graph import (
        triangle_counts,
    )

    def sym(pairs):
        return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pend = [(4, 9)]
    c4 = [(20, 21), (21, 22), (22, 23), (23, 20)]
    edges = spark.createDataFrame(sym(k4 + pend + c4), "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 9: 0, 20: 0, 21: 0, 22: 0, 23: 0}, got
