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
