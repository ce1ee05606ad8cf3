"""Exact fixed-point PageRank (operators/graph.py).

The operator's whole point is bit-exactness: scaled-integer ranks must
match a naive single-threaded Python unrolling of the same recurrence
on every graph, partitioning, and iteration count.
"""

import numpy as np
import pytest

from redeye_spark.operators import graph


def naive_pagerank(edges, iterations, scale=1_000_000_000,
                   d_num=85, d_den=100):
    """Reference recurrence, straight from the docstring, in pure ints."""
    nodes = sorted({n for e in edges for n in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = scale - scale * d_num // d_den
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: base + (d_num * s[n]) // d_den for n in nodes}
    return r


def naive_triangles(edges):
    """Per-node triangle membership counts by brute-force enumeration."""
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    counts = {}
    nodes = sorted(adj)
    for a in nodes:
        for b in (n for n in adj[a] if n > a):
            for c in (n for n in adj[a] & adj[b] if n > b):
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def naive_bfs(edges, seeds, max_hops):
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {d for s, d in edges if s in frontier} - dist.keys()
        for n in nxt:
            dist[n] = h
        frontier = nxt
    return dist


class TestTriangleCounts:
    def test_matches_naive_on_random_graph(self, spark):
        rng = np.random.default_rng(7)
        edges = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["triangles"] for r in
               graph.triangle_counts(df).collect()}
        assert got == naive_triangles(edges)

    def test_normalizes_direction_duplicates_and_loops(self, spark):
        # one triangle 1-2-3 stated redundantly, plus a self-loop
        df = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)], ["src", "dst"])
        got = {r["node"]: r["triangles"] for r in
               graph.triangle_counts(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_triangle_free_graph_is_empty(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
        assert graph.triangle_counts(df).count() == 0

    def test_hub_star_plus_rim(self, spark):
        """A hub joined to a 6-cycle rim: each rim edge closes exactly
        one triangle with the hub — the degree-ordered orientation must
        not miscount around the hub."""
        rim = [(i, (i % 6) + 1) for i in range(1, 7)]
        spokes = [(0, i) for i in range(1, 7)]
        df = spark.createDataFrame(rim + spokes, ["src", "dst"])
        got = {r["node"]: r["triangles"] for r in
               graph.triangle_counts(df).collect()}
        assert got == {0: 6, **{i: 2 for i in range(1, 7)}}


class TestBfsDistances:
    def test_matches_naive_on_random_digraph(self, spark):
        rng = np.random.default_rng(9)
        edges = sorted({(int(a), int(b)) for a, b in
                        zip(rng.integers(0, 50, 120), rng.integers(0, 50, 120))})
        df = spark.createDataFrame(edges, ["src", "dst"])
        seeds = spark.createDataFrame([(0,), (7,)], ["node"])
        got = {r["node"]: r["dist"] for r in
               graph.bfs_distances(df, seeds, max_hops=3).collect()}
        assert got == naive_bfs(edges, [0, 7], 3)

    def test_direction_respected_and_hop_cap(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (9, 1)], ["src", "dst"])
        seeds = spark.createDataFrame([(1,)], ["node"])
        got = {r["node"]: r["dist"] for r in
               graph.bfs_distances(df, seeds, max_hops=2).collect()}
        # 9 points AT 1 but is not reachable FROM it; 4 is past the cap
        assert got == {1: 0, 2: 1, 3: 2}

    def test_seed_rediscovery_keeps_zero(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
        seeds = spark.createDataFrame([(1,), (2,)], ["node"])
        got = {r["node"]: r["dist"] for r in
               graph.bfs_distances(df, seeds, max_hops=3).collect()}
        assert got == {1: 0, 2: 0}


class TestPagerankFixedPoint:
    def test_matches_naive_on_random_graph(self, spark):
        rng = np.random.default_rng(11)
        edges = sorted({(int(a), int(b)) for a, b in
                        zip(rng.integers(0, 60, 300), rng.integers(0, 60, 300))})
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["r"] for r in
               graph.pagerank_fixed_point(df, iterations=5).collect()}
        assert got == naive_pagerank(edges, 5)

    def test_partitioning_invariance(self, spark):
        """Same graph, 1 partition vs many: identical rank vector."""
        rng = np.random.default_rng(4)
        edges = sorted({(int(a), int(b)) for a, b in
                        zip(rng.integers(0, 40, 120), rng.integers(0, 40, 120))})
        df = spark.createDataFrame(edges, ["src", "dst"])
        one = {r["node"]: r["r"] for r in
               graph.pagerank_fixed_point(df.coalesce(1), iterations=4).collect()}
        many = {r["node"]: r["r"] for r in
                graph.pagerank_fixed_point(df.repartition(7), iterations=4).collect()}
        assert one == many

    def test_dangling_node_contributes_nothing(self, spark):
        """A node with in-edges but no out-edges must keep receiving
        rank while emitting none (the oracle's inner join on deg)."""
        df = spark.createDataFrame([(1, 2), (3, 2)], ["src", "dst"])
        got = {r["node"]: r["r"] for r in
               graph.pagerank_fixed_point(df, iterations=3).collect()}
        assert got == naive_pagerank([(1, 2), (3, 2)], 3)
        # sinks 1 and 3 never receive: they sit at the base value
        base = 1_000_000_000 - 1_000_000_000 * 85 // 100
        assert got[1] == base and got[3] == base
        assert got[2] > base

    def test_zero_iterations_is_uniform(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
        got = {r["node"]: r["r"] for r in
               graph.pagerank_fixed_point(df, iterations=0).collect()}
        assert got == {1: 1_000_000_000, 2: 1_000_000_000}

    def test_plan_has_no_cartesian_or_row_python(self, spark):
        """part_rank is excluded from the registry-wide lazy plan gate
        (localCheckpoint is eager), so pin the same floor here."""
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
        out = graph.pagerank_fixed_point(df, iterations=2, checkpoint_every=100)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_checkpoint_cadence_does_not_change_values(self, spark):
        edges = [(i, (i + 1) % 10) for i in range(10)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        a = {r["node"]: r["r"] for r in
             graph.pagerank_fixed_point(df, iterations=6, checkpoint_every=2).collect()}
        b = {r["node"]: r["r"] for r in
             graph.pagerank_fixed_point(df, iterations=6, checkpoint_every=100).collect()}
        assert a == b == naive_pagerank(edges, 6)
