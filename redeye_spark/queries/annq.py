"""ANN similarity queries: brute-force cosine top-k, IVF (in-memory
and persisted partition-pruned index), embedding vector stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..functions.logparse import FORMAT_COMMON  # noqa: F401
from ..operators import enrich as enrich_op  # noqa: F401
from ..operators import parse_op, route as route_op, tokenize_op  # noqa: F401
from ..operators import aggregate as agg_op  # noqa: F401
from ._shared import (  # noqa: F401
    _OFFS, _STATUS, _frags, _oracle_base, _parsed, _spark_lines, _spread,
    _utc, _PARSE_COLS,
)



def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 3 vectors (exact ANN
    baseline). Returns ranks only — cross-engine float hashing of the
    cosine itself is not stable at the last ulp."""
    from ..operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    top = similarity.brute_force_topk(embs, queries, k=5)
    return top.select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))


SQL_SIMILARITY_TOPK = """
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 3
) WHERE rank <= 5
"""


def _ivf_fixed_centroids(nlist: int = 8, dim: int = 64, seed: int = 7):
    """Deterministic centroids for the driver-checked IVF query: seeded
    Gaussian directions, normalized. Fixing the centroids (instead of
    k-means-fitting them) lets the DuckDB oracle embed the SAME values as
    literals and replicate the FULL IVF semantics — assignment, probing,
    pruned ranking — in SQL. Production callers use fit_centroids()."""
    import numpy as np

    rng = np.random.default_rng(seed)
    c = rng.normal(size=(nlist, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


_IVF_NPROBE = 3


def _ivf_inputs(spark: SparkSession, sf_dir: str):
    """Shared by the in-memory and persisted-index IVF queries — they
    MUST select identical query vectors to share one oracle."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    return embs, queries


def _ivf_project(top: DataFrame) -> DataFrame:
    return top.select(
        "query_id", "vec_id", F.col("rank").cast("long").alias("rank")
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 3 vectors with fixed centroids: the
    oracle mirrors list assignment + nprobe probing + in-list ranking
    exactly, so this verifies the whole IVF plan (assign -> prune ->
    masked local top-k -> global merge), not just output shape."""
    from ..operators import similarity

    embs, queries = _ivf_inputs(spark, sf_dir)
    top = similarity.ivf_topk(
        embs, queries, k=5, nprobe=_IVF_NPROBE, centroids=_ivf_fixed_centroids()
    )
    return _ivf_project(top)


_IVF_INDEX_CACHE: dict[tuple, str] = {}


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME IVF query through a PERSISTED index (build_ivf_index
    with the fixed centroids -> parquet partitioned by list_id ->
    ivf_topk_indexed): sharing q_ivf_topk's oracle hash-pins the
    build/load/partition-pruned-probe path to identical semantics —
    centroids round-trip float64-exact, and the probe filter prunes
    stored partitions instead of post-filtering a scan (plan-gated in
    TestIvfIndex). NOTE: constructing this query BUILDS the index (a
    write job) on first call per (session, sf_dir) — memoized so
    repeated sweeps reuse one directory — and it is therefore listed in
    the plan-gate's eager-query skip list."""
    import atexit
    import shutil
    import tempfile

    from ..operators import similarity

    embs, queries = _ivf_inputs(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _IVF_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="redeye_ivf_idx_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        similarity.build_ivf_index(embs, path, centroids=_ivf_fixed_centroids())
        _IVF_INDEX_CACHE[key] = path
    top = similarity.ivf_topk_indexed(
        spark, path, queries, k=5, nprobe=_IVF_NPROBE
    )
    return _ivf_project(top)


def _ivf_oracle_sql() -> str:
    cents = _ivf_fixed_centroids()
    rows = ", ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(float(v)) for v in c))
        for i, c in enumerate(cents)
    )
    return f"""
WITH cents(list_id, cvec) AS (VALUES {rows}),
assign AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.list_id FROM cents c
          ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.list_id
          LIMIT 1) AS list_id
  FROM embeddings e
),
probes AS (
  SELECT q.vec_id AS query_id, c.list_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.cvec) DESC, c.list_id
         ) AS pr
  FROM embeddings q, cents c WHERE q.vec_id < 3
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT p.query_id, a.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY list_cosine_similarity(q.embedding, a.embedding) DESC, a.vec_id
         ) AS rank
  FROM (SELECT query_id, list_id FROM probes WHERE pr <= {_IVF_NPROBE}) p
  JOIN assign a ON a.list_id = p.list_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) WHERE rank <= 5
"""


SQL_IVF_TOPK = _ivf_oracle_sql()


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math FULLY JVM-side via higher-order functions — zero
    Python, zero explode-shuffle: per-embedding L2 norm through
    F.aggregate's sequential fold and a self-reversed dot product
    through F.zip_with + F.reverse. Every lambda casts to DOUBLE before
    multiplying so both engines run the identical IEEE sequence; the
    DuckDB oracle replays the same left fold with list_reduce over a
    0-prepended term list (its bare reduce seeds with element 1, which
    would skip squaring it)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    dot_rev = F.aggregate(
        F.zip_with(
            "embedding",
            F.reverse("embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(dot_rev, 6).alias("dot_reversed"),
    )


SQL_EMBEDDING_STATS = """
WITH t AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sq,
         list_transform(embedding,
                        (x, i) -> CAST(x AS DOUBLE)
                                  * CAST(embedding[len(embedding) - i + 1] AS DOUBLE)) AS pr
  FROM embeddings
)
SELECT vec_id,
       round(sqrt(list_reduce(list_prepend(0.0, sq), (a, b) -> a + b)), 6) AS l2_norm,
       round(list_reduce(list_prepend(0.0, pr), (a, b) -> a + b), 6) AS dot_reversed
FROM t
"""



def q_label_centroid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label per-dimension EXACT centroid aggregation cells
    (posexplode -> partial agg on (label, pos)): components floored
    onto a 1e-6 grid once per value, then integer-summed — mergeable
    across shards and bit-identical under any partitioning. The mean
    is sum_q / n_vecs / 1e6, recovered downstream; keeping the query
    output integer makes the oracle equality exact rather than
    float-rounded."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.centroid_cells(emb).select(
        "label", "pos", "sum_q", "n_vecs"
    )


SQL_LABEL_CENTROID_CELLS = """
WITH ex AS (
  SELECT label,
         unnest(list_transform(embedding, (x, i) -> i - 1)) AS pos,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS xq
  FROM embeddings
)
SELECT label, pos, CAST(sum(xq) AS BIGINT) AS sum_q, count(*) AS n_vecs
FROM ex GROUP BY 1, 2
"""



def q_embedding_cov_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer covariance moment cells of the embedding corpus
    (upper triangle): codegen-built per-vector pair cells -> one
    partial-aggregated (i, j) shuffle of O(d^2) rows. The DuckDB twin
    rebuilds the identical integer sums, so the second-moment
    aggregation is hash-verified end to end (the eigensolve consuming
    these cells is pytest-pinned against numpy instead — not
    SQL-expressible)."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.covariance_cells(emb).select(
        "i", "j", "sum_xy_q", "sum_x_q", "sum_y_q", "n"
    )


SQL_EMBEDDING_COV_CELLS = """
WITH ex AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
cells AS (
  SELECT t.ii AS i, u.jj AS j, ex.q[t.ii + 1] AS x, ex.q[u.jj + 1] AS y
  FROM ex
  CROSS JOIN unnest(range(len(ex.q))) AS t(ii)
  CROSS JOIN unnest(range(len(ex.q))) AS u(jj)
  WHERE u.jj >= t.ii
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(sum(x * y) AS BIGINT) AS sum_xy_q,
       CAST(sum(x) AS BIGINT) AS sum_x_q,
       CAST(sum(y) AS BIGINT) AS sum_y_q,
       count(*) AS n
FROM cells GROUP BY 1, 2
"""


def q_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 PCA projection, verified through its INVARIANTS (r5
    verdict #3: the eigensolve's sign/order freedom blocks a value-
    level SQL twin, but what the distributed projection must SATISFY is
    exactly checkable). Output is a 7-row (invariant, value) report:

      * n_vectors / dim / scatter_q — data-dependent anchors. scatter_q
        is the exact integer total scatter sum_i (n*sum(x_q^2) -
        (sum x_q)^2) on the 1e-6 quantized grid, aggregated
        DISTRIBUTED from the covariance diagonal cells as
        DECIMAL(38,0); DuckDB rebuilds it in HUGEINT. Any drift in the
        quantize/center pipeline flips it.
      * bessel_violations — #vectors where ||proj||^2 exceeds the
        centered norm^2 (Bessel's inequality; must be 0 for any
        orthonormal partial basis — catches unnormalized components
        and broken dot products), computed per row in codegen.
      * energy_mismatch — 1 unless the DISTRIBUTED projected energy
        sum||proj||^2 matches the eigensolve's prediction
        n * sum(top-8 eigenvalues) within 1e-3 relative (quantization
        slack is ~1e-6; a missed centering or wrong eigen-order is
        O(1)). Ties the executor-side arithmetic to the driver-side
        model.
      * pc_norm_violations / ortho_violations — basis orthonormality
        at 1e-9 (driver-side numpy on the bounded d x k matrix).

    All violation counts oracle to literal 0 — but they are computed
    from the data, so the hash row only matches when the invariant
    actually holds; the anchors keep the result data-dependent."""
    import numpy as np

    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    proj, _, model = similarity.pca_project(emb, k=8, return_model=True)
    comps = model["components"]
    k = comps.shape[1]
    gram = comps.T @ comps
    pc_norm_viol = int(np.sum(np.abs(np.diag(gram) - 1.0) > 1e-9))
    ortho_viol = int(np.sum(np.abs(gram - np.eye(k)) > 1e-9)) - pc_norm_viol
    pred_energy = model["n"] * float(sum(model["eigvals"]))

    mu = F.array(*[F.lit(float(x)) for x in model["mean"]])
    centered_sq = F.aggregate(
        F.zip_with("embedding", mu, lambda x, m: x.cast("double") - m),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    proj_sq = F.aggregate(
        "pca", F.lit(0.0), lambda acc, x: acc + x * x
    )
    en = proj.select(proj_sq.alias("_pe"), centered_sq.alias("_ce"))
    rep_en = en.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(F.col("_pe") > F.col("_ce") * (1.0 + 1e-9) + 1e-9, 1)
            .otherwise(0)
        ).alias("_bessel"),
        F.sum("_pe").alias("_tot_pe"),
    ).select(
        F.explode(
            F.create_map(
                F.lit("n_vectors"), F.col("_n").cast("string"),
                F.lit("bessel_violations"), F.col("_bessel").cast("string"),
                F.lit("energy_mismatch"),
                F.when(
                    F.abs(F.col("_tot_pe") - F.lit(pred_energy))
                    <= F.lit(max(abs(pred_energy), 1e-12) * 1e-3),
                    F.lit(0),
                ).otherwise(F.lit(1)).cast("string"),
            )
        ).alias("invariant", "value_q")
    )

    _d38 = "decimal(38,0)"
    cells = similarity.covariance_cells(emb)
    rep_scatter = (
        cells.filter(F.col("i") == F.col("j"))
        .agg(
            F.sum(
                F.col("n").cast(_d38) * F.col("sum_xy_q").cast(_d38)
                - F.col("sum_x_q").cast(_d38) * F.col("sum_x_q").cast(_d38)
            ).alias("_sc")
        )
        .select(
            F.lit("scatter_q").alias("invariant"),
            F.col("_sc").cast("string").alias("value_q"),
        )
    )
    rep_model = proj.sparkSession.createDataFrame(
        [
            ("dim", str(model["d"])),
            ("pc_norm_violations", str(pc_norm_viol)),
            ("ortho_violations", str(ortho_viol)),
        ],
        "invariant string, value_q string",
    )
    return rep_en.unionByName(rep_scatter).unionByName(rep_model)


SQL_PCA_PROJECTION = """
WITH ex AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
flat AS (
  SELECT unnest(list_transform(q, (x, i) -> i - 1)) AS pos, unnest(q) AS xq
  FROM ex
),
dims AS (
  SELECT pos,
         sum(CAST(xq AS HUGEINT) * CAST(xq AS HUGEINT)) AS ssq,
         sum(CAST(xq AS HUGEINT)) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM flat GROUP BY 1
)
SELECT 'n_vectors' AS invariant, CAST(count(*) AS VARCHAR) AS value_q FROM embeddings
UNION ALL SELECT 'dim', CAST(min(len(embedding)) AS VARCHAR) FROM embeddings
UNION ALL SELECT 'scatter_q', CAST(sum(n * ssq - s * s) AS VARCHAR) FROM dims
UNION ALL SELECT 'bessel_violations', '0'
UNION ALL SELECT 'energy_mismatch', '0'
UNION ALL SELECT 'pc_norm_violations', '0'
UNION ALL SELECT 'ortho_violations', '0'
"""


def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized top-5 for the first 3 vectors: one exact
    max(|x|) calibration scalar, codes = floor(x*127/absmax), ranking
    by the exact INTEGER code dot product — the oracle replays the
    whole quantized search bit-for-bit (operators/quantize.py)."""
    from ..operators import quantize

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    top = quantize.sq_topk(embs, queries, k=5)
    return top.select(
        "query_id", "vec_id", "dot",
        F.col("rank").cast("long").alias("rank"),
    )


def _sq_codes_cte(levels: int, name: str) -> str:
    """DuckDB CTE quantizing every embedding at the given grade with
    the same two IEEE float64 ops as the Spark kernel."""
    return f"""
{name} AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor((CAST(x AS DOUBLE) * {levels}.0) / am.m) AS BIGINT)
         ) AS c
  FROM embeddings, am
)"""


_SQ_AM = """
am AS (
  SELECT CAST(max(abs(t.x)) AS DOUBLE) AS m
  FROM (SELECT unnest(embedding) AS x FROM embeddings) t
)"""


def _sq_rank_cte(codes: str, name: str) -> str:
    """Integer dot + row_number ranking of the first-3-query search."""
    return f"""
{name} AS (
  SELECT query_id, vec_id, dot, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(len(q.c)), i -> q.c[i+1] * c.c[i+1])),
             (a, b) -> a + b) AS dot,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(len(q.c)), i -> q.c[i+1] * c.c[i+1])),
               (a, b) -> a + b) DESC, c.vec_id ASC
           ) AS rank
    FROM {codes} q JOIN {codes} c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 3
  ) WHERE rank <= 5
)"""


SQL_SQ8_TOPK = f"""
WITH {_SQ_AM}, {_sq_codes_cte(127, "codes")}, {_sq_rank_cte("codes", "r")}
SELECT query_id, vec_id, CAST(dot AS BIGINT) AS dot,
       CAST(rank AS BIGINT) AS rank
FROM r
"""


def q_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-loss report: per-query top-5 overlap of the int8
    search against an int16 reference — the recall number every SQ
    deployment publishes, exact-integer on both engines."""
    from ..operators import quantize

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    return quantize.sq_recall(embs, queries, k=5)


SQL_SQ8_RECALL = f"""
WITH {_SQ_AM}, {_sq_codes_cte(127, "c8")}, {_sq_codes_cte(32767, "c16")},
{_sq_rank_cte("c8", "r8")}, {_sq_rank_cte("c16", "r16")},
n AS (
  SELECT r8.query_id, CAST(count(*) AS BIGINT) AS n_common
  FROM r8 JOIN r16 ON r16.query_id = r8.query_id AND r16.vec_id = r8.vec_id
  GROUP BY r8.query_id
),
q AS (SELECT DISTINCT query_id FROM r8)
SELECT q.query_id,
       COALESCE(n.n_common, 0) AS n_common,
       round(CAST(COALESCE(n.n_common, 0) AS DOUBLE) / 5.0, 4) AS recall
FROM q LEFT JOIN n ON n.query_id = q.query_id
"""


QUERIES = {
    "similarity_topk": q_similarity_topk,
    "sq8_topk": q_sq8_topk,
    "sq8_recall": q_sq8_recall,
    "ivf_topk": q_ivf_topk,
    "ivf_topk_indexed": q_ivf_topk_indexed,
    "embedding_stats": q_embedding_stats,
    "label_centroid_cells": q_label_centroid_cells,
    "embedding_cov_cells": q_embedding_cov_cells,
    "pca_projection": q_pca_projection,
}

ORACLES = {
    "similarity_topk": SQL_SIMILARITY_TOPK,
    "sq8_topk": SQL_SQ8_TOPK,
    "sq8_recall": SQL_SQ8_RECALL,
    "ivf_topk": SQL_IVF_TOPK,
    "ivf_topk_indexed": SQL_IVF_TOPK,
    "embedding_stats": SQL_EMBEDDING_STATS,
    "label_centroid_cells": SQL_LABEL_CENTROID_CELLS,
    "embedding_cov_cells": SQL_EMBEDDING_COV_CELLS,
    "pca_projection": SQL_PCA_PROJECTION,
}
