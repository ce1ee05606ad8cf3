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
