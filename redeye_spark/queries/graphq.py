"""Graph queries: exact fixed-point PageRank, degree-ordered triangle
counting, and multi-source BFS — all over graphs derived from the
TPC-H-ish tables, all with EXACT (integer) DuckDB oracles.

The part co-occurrence graph used by triangles/BFS: two parts are
adjacent iff some order contains lineitems for both. Built with one
lineitem self-join on l_orderkey (fact x fact SMJ on the join key, no
cartesian) and canonicalized to a < b distinct edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (a.join(b, "ok")
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct())


_SQL_PART_EDGES = """
ed0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
)
"""


def q_part_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (5 iterations, d=0.85) over the undirected
    part—supplier bipartite graph from distinct lineitem edges.

    Iterative-algorithm coverage with an EXACT oracle: scaled integer
    arithmetic (operators/graph.py) makes every iteration's rank vector
    bit-identical across engines and partitionings, so DuckDB states
    the truth by unrolling the five iterations into chained CTEs — no
    float tolerance, a full hash match."""
    from ..operators.graph import pagerank_fixed_point

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    half = (li.select((F.col("l_partkey") * 2).alias("src"),
                      (F.col("l_suppkey") * 2 + 1).alias("dst"))
            .distinct())
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_fixed_point(edges, iterations=5)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier")).alias("kind"),
        F.expr("node div 2").alias("node_key"),
        F.col("r").alias("pr"),
    )


def _pagerank_oracle(iterations: int = 5,
                     scale: int = 1_000_000_000) -> str:
    """Unroll the exact integer PageRank recurrence into chained CTEs."""
    base = scale - scale * 85 // 100
    parts = [
        "WITH e0 AS (SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst"
        " FROM lineitem),",
        "ed AS (SELECT src, dst FROM e0"
        " UNION ALL SELECT dst AS src, src AS dst FROM e0),",
        "nodes AS (SELECT DISTINCT src AS node FROM ed),",
        "deg AS (SELECT src AS node, COUNT(*) AS d FROM ed GROUP BY src),",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"r{i} AS (SELECT nodes.node, CAST({base} + (85 * COALESCE(s.c, 0))"
            " // 100 AS BIGINT) AS r FROM nodes LEFT JOIN ("
            f"SELECT ed.dst AS node, SUM(r.r // deg.d) AS c FROM ed"
            f" JOIN r{i-1} r ON r.node = ed.src"
            " JOIN deg ON deg.node = ed.src GROUP BY ed.dst) s"
            " ON s.node = nodes.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        "SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,"
        f" node // 2 AS node_key, r AS pr FROM r{iterations}"
    )
    return "\n".join(parts)


SQL_PART_RANK = _pagerank_oracle()


def q_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts in the part co-occurrence graph.

    The Spark side runs the degree-ordered orientation
    (operators/graph.py:triangle_counts — O(m^1.5) wedges even with
    hubs); the oracle enumerates the same triangles with the simple
    a < b < c node-id orientation, which is exact on any graph — the
    triangle SET is orientation-independent, only the work bound
    differs."""
    from ..operators.graph import triangle_counts

    edges = _part_edges(spark, sf_dir)
    return (triangle_counts(edges)
            .select(F.col("node").alias("part_key"), "triangles"))


SQL_PART_TRIANGLES = f"""
WITH {_SQL_PART_EDGES},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ed0 e1
  JOIN ed0 e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN ed0 e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)
SELECT node AS part_key, COUNT(*) AS triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node
"""


def q_part_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS distances from the size-1 parts through the part
    co-occurrence graph (operators/graph.py:bfs_distances). Exact
    integer hop counts; the oracle walks the same frontier with a
    depth-capped WITH RECURSIVE and takes MIN(dist) per node."""
    from ..operators.graph import bfs_distances

    half = _part_edges(spark, sf_dir)
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = (spark.read.parquet(f"{sf_dir}/part.parquet")
             .filter(F.col("p_size") == 1)
             .select(F.col("p_partkey").alias("node")))
    return (bfs_distances(edges, seeds, max_hops=3)
            .select(F.col("node").alias("part_key"), "dist"))


SQL_PART_BFS = f"""
WITH RECURSIVE {_SQL_PART_EDGES},
ed AS (SELECT src, dst FROM ed0 UNION ALL SELECT dst, src FROM ed0),
walk(node, dist) AS (
  SELECT p_partkey AS node, 0 AS dist FROM part WHERE p_size = 1
  UNION
  SELECT ed.dst, walk.dist + 1
  FROM walk JOIN ed ON ed.src = walk.node
  WHERE walk.dist < 3
)
SELECT CAST(node AS BIGINT) AS part_key, CAST(MIN(dist) AS INT) AS dist
FROM walk GROUP BY node
"""


QUERIES = {
    "part_rank": q_part_rank,
    "part_triangles": q_part_triangles,
    "part_bfs": q_part_bfs,
}

ORACLES = {
    "part_rank": SQL_PART_RANK,
    "part_triangles": SQL_PART_TRIANGLES,
    "part_bfs": SQL_PART_BFS,
}
