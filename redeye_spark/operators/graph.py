"""Iterative graph algorithms beyond connected components: PageRank in
exact fixed-point arithmetic.

Floating-point PageRank cannot be hash-verified across engines: double
summation order differs per partitioning, so the usual implementation
is only testable to a tolerance. This one works in scaled INTEGER
arithmetic — ranks are multiples of 1/scale, every division is an
integer floor division, every sum is exact — so after any fixed number
of iterations the rank vector is bit-identical on any cluster size,
any partitioning, and any engine that follows the same recurrence
(DuckDB states it by unrolling the iterations into chained CTEs).

    r_0(v)   = scale
    r_i+1(v) = (scale - scale*d_num//d_den)
               + (d_num * sum over in-edges u->v of r_i(u) // deg(u)) // d_den

Truncation is toward zero on both engines (all operands positive, so
Spark's `div` and DuckDB's `//` agree).

Scale shape per iteration: one join edges(src)=ranks(node) — both
sides hash-partitioned on the same key, so consecutive iterations
reuse the layout — and one partial-aggregated groupBy(dst). State is
one bigint per node; lineage is cut with localCheckpoint every few
iterations exactly like the label-propagation CC (dedup.py). Overflow
cap: d_num * sum(contribs) must fit int64, i.e. n_nodes * scale <
2^63 / d_num (~1e8 nodes at the default scale; drop `scale` for
larger graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph given as any
    edge list (src, dst) — direction, duplicates, and self-loops are
    normalized away. Returns (node, triangles) for nodes in >=1
    triangle.

    Scale design: the classic degree-ordered orientation. Each
    undirected edge is directed from its (degree, id)-smaller endpoint
    to the larger, which bounds every out-degree by O(sqrt(m)) — so the
    wedge join (o1 x o2 on the common tail) generates
    sum_u C(outdeg(u), 2) = O(m^1.5) candidate wedges even on graphs
    with huge hubs, where a node-id orientation would blow up as
    O(hub_degree^2). The closing check is one more equi-join: because
    the orientation is a total order, the wedge (v1, v2) closes iff the
    oriented edge (v1, v2) exists. Three shuffles total, all
    partial-aggregated; no cartesian anywhere."""
    e = (edges.select(F.least("src", "dst").alias("a"),
                      F.greatest("src", "dst").alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct())
    deg = (e.select(F.col("a").alias("node"))
           .unionByName(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    o = (e.join(da, "a").join(db, "b")
         .select(F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
                 F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
                 F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v")))
    o1 = o.select("u", F.col("v").alias("v1"), F.col("deg_v").alias("dv1"))
    o2 = o.select("u", F.col("v").alias("v2"), F.col("deg_v").alias("dv2"))
    v1_first = (F.col("dv1") < F.col("dv2")) | (
        (F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    wedges = o1.join(o2, "u").filter(v1_first).select("u", "v1", "v2")
    tri = wedges.join(o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
                      ["v1", "v2"])
    return (tri.select(F.col("u").alias("node"))
            .unionByName(tri.select(F.col("v1").alias("node")))
            .unionByName(tri.select(F.col("v2").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))


def bfs_distances(edges: DataFrame, seeds: DataFrame,
                  max_hops: int = 3) -> DataFrame:
    """Minimum hop count from a seed set over a DIRECTED edge list
    (src, dst) — pass both directions for an undirected graph. Returns
    (node, dist) for every node within max_hops; unreachable nodes are
    simply absent. seeds is a DataFrame with a `node` column.

    Frontier expansion: each hop is one equi-join frontier><edges on
    src plus one distinct plus one anti-join against the visited set —
    all hash-partitioned on the node id, so consecutive hops reuse the
    layout. The loop is pure DataFrame composition (no count()/collect()
    per hop), so with a fixed max_hops the whole walk stays lazy and
    Catalyst sees one plan."""
    visited = seeds.select("node").distinct().select(
        "node", F.lit(0).cast("int").alias("dist"))
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (edges.join(frontier, edges.src == frontier.node)
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited.select("node"), "node", "left_anti"))
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).cast("int").alias("dist")))
        frontier = nxt
    return visited


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 1_000_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a DIRECTED edge list (src, dst) — pass both
    directions for an undirected graph. Returns (node, r) with
    r ~= scale * pagerank_probability * n_nodes (the un-normalized
    per-node form). Nodes are whatever appears in src/dst."""
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    deg = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .withColumnRenamed("src", "node"))
    # dangling nodes (no out-edges) keep deg rows absent; they simply
    # contribute nothing, matching the unrolled oracle's inner join
    base = scale - scale * damping_num // damping_den
    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("r"))
    deg = deg.localCheckpoint()
    for i in range(iterations):
        contribs = (
            edges.join(ranks.join(deg, "node"), edges.src == F.col("node"))
            .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
                ).cast("bigint").alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks
