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


def _kmeans_ctes(k: int, iters: int) -> list[str]:
    """The unrolled-Lloyd's CTE chain through aF (the final assignment)
    — shared by the k-means oracles and the SemDeDup oracles, which
    build their pair search on top of aF."""
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
    return ctes


def _kmeans_sql(k: int, iters: int, final: str) -> str:
    """Unrolled Lloyd's in DuckDB SQL. `final` selects the output shape:
    'cells' -> (cluster, pos, c_val, n_vecs); 'assign' -> (vec_id,
    cluster, dist). Exactness contracts mirrored from the Spark side:
    floor-quantize once, int64 distance sums (HUGEINT capped back to
    BIGINT), ties to MIN(cluster), update = (s - s % n) / n which is
    trunc-toward-zero division in both engines."""
    ctes = _kmeans_ctes(k, iters)
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


# SemDeDup (Abbas et al. 2023): k-means clusters as the blocking key,
# exact integer cosine inside each block. tau = 9/20 (0.45) is the
# corpus's discriminating threshold (8 pairs at sf0.01, 70 at sf0.1,
# zero at 11/20) — and because the test is a pure int64 inequality on
# the coarse grid, there is NO cross-engine float margin to reason
# about, unlike cosine_near_dup's list_cosine_similarity oracle.
_SEM_TAU = (9, 20)


def q_semantic_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster, id_a, id_b, dot_q): within-cluster semantic-duplicate
    pairs under the fitted k-means blocking (k=4, 3 rounds) at
    cos >= 0.45, decided by exact int64 cross-multiplication on the
    1e-3 grid. The oracle replays the ENTIRE pipeline — Lloyd's
    iteration history, the clamp+floor quantization, the dot products
    — so a hash match pins blocking and similarity math end-to-end."""
    from ..operators import semdedup
    from ._shared import _spread

    # _spread: the 1-row-group embeddings scan is unsplittable, so the
    # within-cluster pair search (~500k interpreted 64-dim integer dot
    # products in the join's probe stage) ran in ONE task (4.8 s at
    # sf0.1). Exact integer arithmetic — partitioning-invariant.
    emb = _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    centroids = clustering.kmeans_fit(emb, k=_K, iters=_ITERS)
    return semdedup.semantic_dup_pairs(emb, centroids, tau=_SEM_TAU)


def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster): survivors of the keep-first greedy — every
    vector without a senior (smaller-id) above-threshold neighbor in
    its own cluster. The drop anti-join carries bare ids only."""
    from ..operators import semdedup
    from ._shared import _spread

    emb = _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    centroids = clustering.kmeans_fit(emb, k=_K, iters=_ITERS)
    return semdedup.semantic_dedup_keep(emb, centroids, tau=_SEM_TAU)


def _semdedup_sql(k: int, iters: int, num: int, den: int, final: str) -> str:
    """SemDeDup oracle on top of the k-means CTE chain: coarse
    clamp+floor quantization (1e-3 grid), exact list dot products
    (HUGEINT capped back to BIGINT, matching Spark's int64-by-guard),
    the division-free threshold test, and either the pair set
    ('pairs') or the keep-first survivors ('keep')."""
    from ..operators.semdedup import SIM_QUANTIZE

    ctes = _kmeans_ctes(k, iters)
    ctes.append(f"""qc AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -1.0), 1.0)
                           * {SIM_QUANTIZE}) AS BIGINT)) AS cq
  FROM embeddings
)""")
    ctes.append("""sn AS (
  SELECT vec_id, cq,
         CAST(list_sum(list_transform(cq, v -> v * v)) AS BIGINT) AS n2
  FROM qc
)""")
    ctes.append("""sp AS (
  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_sum(list_transform(x.cq, (v, i) -> v * y.cq[i]))
              AS BIGINT) AS dot_q,
         x.n2 AS n2a, y.n2 AS n2b
  FROM aF a
  JOIN aF b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN sn x ON x.vec_id = a.vec_id
  JOIN sn y ON y.vec_id = b.vec_id
)""")
    ctes.append(f"""sdup AS (
  SELECT cluster, id_a, id_b, dot_q FROM sp
  WHERE dot_q > 0
    AND CAST(dot_q AS HUGEINT) * dot_q * {den * den}
        >= CAST({num * num} AS HUGEINT) * n2a * n2b
)""")
    if final == "pairs":
        tail = "SELECT cluster, id_a, id_b, dot_q FROM sdup"
    else:
        tail = """SELECT a.vec_id, a.cluster FROM aF a
WHERE a.vec_id NOT IN (SELECT id_b FROM sdup)"""
    return "WITH " + ",\n".join(ctes) + "\n" + tail


SQL_SEMANTIC_DUP_PAIRS = _semdedup_sql(_K, _ITERS, *_SEM_TAU, "pairs")
SQL_SEMANTIC_DEDUP_KEEP = _semdedup_sql(_K, _ITERS, *_SEM_TAU, "keep")


QUERIES = {
    "kmeans_cells": q_kmeans_cells,
    "kmeans_assign": q_kmeans_assign,
    "semantic_dup_pairs": q_semantic_dup_pairs,
    "semantic_dedup_keep": q_semantic_dedup_keep,
}

ORACLES = {
    "kmeans_cells": SQL_KMEANS_CELLS,
    "kmeans_assign": SQL_KMEANS_ASSIGN,
    "semantic_dup_pairs": SQL_SEMANTIC_DUP_PAIRS,
    "semantic_dedup_keep": SQL_SEMANTIC_DEDUP_KEEP,
}
