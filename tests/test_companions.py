"""Companion operators vs pure-Python oracles on deterministic graphs
(the DuckDB oracle gate re-checks these at sf0.01; here we verify against
independent Python implementations and known structure)."""

import math

from pyspark.sql import functions as F

from leiden_communities_openmp_spark.operators.companions import (
    connected_components, label_propagation, pagerank, triangle_count,
)
from leiden_communities_openmp_spark.operators.graphgen import STEPS, block_circulant

N, B = 256, 32


def _edges_py(n=N, b=B):
    es = set()
    for i in range(n):
        j = i % b
        for a, c in STEPS:
            d = (i - j) + (j * a + c) % b
            if d != i:
                es.add((i, d))
    return sorted(es)


def test_connected_components_blocks(spark):
    cc = {r["id"]: r["component"] for r in
          connected_components(block_circulant(spark, N, B)).collect()}
    assert cc == {i: (i // B) * B for i in range(N)}


def test_pagerank_matches_python(spark):
    edges = _edges_py()
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n = N
    ranks = {i: 1.0 / n for i in range(n)}
    for _ in range(5):
        nxt = {i: 0.15 / n for i in range(n)}
        for s, ds in out.items():
            share = 0.85 * ranks[s] / len(ds)
            for d in ds:
                nxt[d] += share
        ranks = nxt
    got = {r["id"]: r["rank"] for r in pagerank(block_circulant(spark, N, B), 5).collect()}
    assert all(math.isclose(got[i], ranks[i], abs_tol=1e-9) for i in range(n))
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


def test_connected_components_path_log_rounds(spark):
    """High-diameter fixture: a 256-vertex path (diameter 255). The
    large-star/small-star alternation must finish in O(log n) rounds —
    naive min-label exchange would need 255."""
    from leiden_communities_openmp_spark.operators.companions import (
        connected_components_with_stats,
    )

    n = 256
    path = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"), F.lit(1.0).alias("w"))
    labels, rounds = connected_components_with_stats(path)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds


def test_pagerank_no_driver_collect_in_loop(spark, monkeypatch):
    """The dangling-mass term is folded into the iteration DAG as a one-row
    broadcast relation — pagerank must never round-trip through a driver
    .collect() (the old implementation collected the dangling sum every
    iteration: one extra full-|V| job per iteration)."""
    from pyspark.sql import DataFrame

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    g = block_circulant(spark, N, B).localCheckpoint(eager=True)
    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    try:
        ranks = pagerank(g, iterations=5)
        assert calls["n"] == 0, f"pagerank collected {calls['n']}× on the driver"
    finally:
        monkeypatch.undo()
    assert ranks.count() == N


def test_triangles_match_python(spark):
    edges = _edges_py()
    und = set()
    for s, d in edges:
        und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in und:
        tri += len(adj[a] & adj[b] & {x for x in adj[a] if x > b})
    got = triangle_count(block_circulant(spark, N, B)).collect()[0]["triangles"]
    assert got == tri


def test_lpa_deterministic(spark):
    g = block_circulant(spark, N, B)
    a = {r["id"]: r["label"] for r in label_propagation(g, 3).collect()}
    b_ = {r["id"]: r["label"] for r in label_propagation(g, 3).collect()}
    assert a == b_
    # labels never cross block boundaries (blocks are components)
    assert all((lbl // B) == (i // B) for i, lbl in a.items())


def test_bfs_levels(spark):
    from leiden_communities_openmp_spark.operators.transforms import bfs_levels

    lv = {r["id"]: r["level"] for r in bfs_levels(block_circulant(spark, N, B), 0).collect()}
    assert lv[0] == 0
    assert set(lv) == set(range(B))  # reaches exactly its block
    # python BFS oracle
    edges = _edges_py()
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    want = {0: 0}
    frontier = [0]
    depth = 0
    while frontier:
        depth += 1
        nxt = []
        for u in frontier:
            for v in out.get(u, []):
                if v not in want:
                    want[v] = depth
                    nxt.append(v)
        frontier = nxt
    assert lv == want


def test_dfs_preorder_matches_recursive_reference(spark):
    """V2: the single-task DFS preorder equals an independent recursive
    implementation of dfsVisitedForEachU (inc/dfs.hxx:19-25) with
    ascending-dst adjacency."""
    import sys

    from leiden_communities_openmp_spark.operators.graphgen import block_circulant
    from leiden_communities_openmp_spark.operators.transforms import dfs_preorder

    e = block_circulant(spark, 256, 64)
    got = [r["id"] for r in dfs_preorder(e, 0).orderBy("pos").collect()]

    adj = {}
    for r in e.collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    for k in adj:
        adj[k].sort()
    sys.setrecursionlimit(10000)
    vis, order = set(), []

    def rec(u):
        if u in vis:
            return
        vis.add(u)
        order.append(u)
        for v in adj.get(u, []):
            rec(v)

    rec(0)
    assert got == order
    assert got[0] == 0 and len(set(got)) == len(got)
