"""Clustering queries: exact-arithmetic k-means over the embeddings
table. The DuckDB oracle replays Lloyd's ENTIRE iteration history in
SQL (unrolled CTEs — one distance/assign/update block per round), so a
hash match pins initialization, tie-breaking, the truncated-division
centroid update, and the final assignment — not just output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import clustering

_K = 4
_ITERS = 3


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted quantized k-means centroids (k=4, 3 Lloyd's rounds,
    deterministic smallest-id init) + membership counts under the final
    centroids. Exact integer arithmetic end-to-end: components floored
    onto the house 1e-6 grid, truncated-division updates — bit-identical
    under any partitioning and replayable by the SQL oracle. NOTE:
    fitting runs eagerly (one bounded k x d collect per round) when the
    query is constructed; the returned plan is the final cells join."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return clustering.kmeans_cells(spark, emb, k=_K, iters=_ITERS)


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster, dist) — every vector's cluster under the final
    fitted centroids, with its exact quantized squared distance. The
    assignment itself is a zero-shuffle codegen projection against
    centroid literals (the 100 TB-safe shape); only the fit performs
    bounded driver collects."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = clustering.kmeans_fit(emb, k=_K, iters=_ITERS)
    return clustering.kmeans_assign(emb, centroids)


def _kmeans_sql(k: int, iters: int, final: str) -> str:
    """Unrolled Lloyd's in DuckDB SQL. `final` selects the output shape:
    'cells' -> (cluster, pos, c_val, n_vecs); 'assign' -> (vec_id,
    cluster, dist). Exactness contracts mirrored from the Spark side:
    floor-quantize once, int64 distance sums (HUGEINT capped back to
    BIGINT), ties to MIN(cluster), update = (s - s % n) / n which is
    trunc-toward-zero division in both engines."""
    ctes = [
        f"""q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {clustering.QUANTIZE}) AS BIGINT)
         ) AS qv
  FROM embeddings
)""",
        """cells AS (
  SELECT vec_id,
         unnest(list_transform(qv, (x, i) -> i - 1)) AS pos,
         unnest(qv) AS val
  FROM q
)""",
        f"""init AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k})
)""",
        """c0 AS (
  SELECT i.cluster, c.pos, c.val FROM init i JOIN cells c USING (vec_id)
)""",
    ]
    # one distance/assign/update block per Lloyd's round
    for t in range(iters):
        ctes.append(f"""d{t} AS (
  SELECT c.vec_id, k.cluster,
         CAST(sum((c.val - k.val) * (c.val - k.val)) AS BIGINT) AS dist
  FROM cells c JOIN c{t} k USING (pos)
  GROUP BY c.vec_id, k.cluster
)""")
        ctes.append(f"""a{t} AS (
  SELECT vec_id, MIN(cluster) AS cluster
  FROM (SELECT vec_id, cluster, dist,
               MIN(dist) OVER (PARTITION BY vec_id) AS md FROM d{t})
  WHERE dist = md GROUP BY vec_id
)""")
        ctes.append(f"""c{t + 1} AS (
  SELECT cluster, pos, CAST((s - (s % n)) / n AS BIGINT) AS val
  FROM (SELECT a.cluster, c.pos, CAST(sum(c.val) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM a{t} a JOIN cells c USING (vec_id)
        GROUP BY a.cluster, c.pos)
)""")
    # final assignment under the fitted centroids c{iters}
    ctes.append(f"""dF AS (
  SELECT c.vec_id, k.cluster,
         CAST(sum((c.val - k.val) * (c.val - k.val)) AS BIGINT) AS dist
  FROM cells c JOIN c{iters} k USING (pos)
  GROUP BY c.vec_id, k.cluster
)""")
    ctes.append("""aF AS (
  SELECT vec_id, MIN(cluster) AS cluster, MIN(dist) AS dist
  FROM (SELECT vec_id, cluster, dist,
               MIN(dist) OVER (PARTITION BY vec_id) AS md FROM dF)
  WHERE dist = md GROUP BY vec_id
)""")
    if final == "cells":
        tail = f"""SELECT k.cluster, CAST(k.pos AS INTEGER) AS pos,
       k.val AS c_val, m.n_vecs
FROM c{iters} k
JOIN (SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs
      FROM aF GROUP BY 1) m USING (cluster)"""
    else:
        tail = "SELECT vec_id, cluster, dist FROM aF"
    return "WITH " + ",\n".join(ctes) + "\n" + tail


SQL_KMEANS_CELLS = _kmeans_sql(_K, _ITERS, "cells")
SQL_KMEANS_ASSIGN = _kmeans_sql(_K, _ITERS, "assign")


QUERIES = {
    "kmeans_cells": q_kmeans_cells,
    "kmeans_assign": q_kmeans_assign,
}

ORACLES = {
    "kmeans_cells": SQL_KMEANS_CELLS,
    "kmeans_assign": SQL_KMEANS_ASSIGN,
}
