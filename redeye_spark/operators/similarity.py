"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k: queries broadcast as a numpy
    matrix into one mapInPandas pass (BLAS matmul per Arrow batch), then
    local-topk -> global-topk merge. The classic distributed pattern:
    each partition emits at most n_queries*k rows, so the final shuffle
    is tiny regardless of corpus size.
  * ivf_topk — IVF-style ANN: k-means centroids fitted on a seeded
    driver-side sample, corpus partitioned by nearest centroid, queries
    probe only `nprobe` nearest lists. The per-query probe set is a tiny
    (n_queries x nlist) boolean matrix shipped in the UDF closure and
    applied as a vectorized numpy mask inside the SAME local-topk pass —
    no per-row Python, no extra join. At 100 TB the global
    `list_id IN (...)` prune is a partition-pruned scan when the corpus
    is written partitioned/bucketed by list_id, and the mask costs one
    fancy-index per Arrow batch.

Embedding-cosine near-duplicate detection at scale lives in
operators/dedup.cosine_lsh_pairs (random-hyperplane LSH).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _topk_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("vec_id", id_type, False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _local_topk_fn(
    qids: np.ndarray,
    qmat: np.ndarray,
    k: int,
    id_col: str,
    vec_col: str,
    include_self: bool,
    allow: np.ndarray | None = None,  # (n_queries, nlist) probe mask
    list_col: str = "list_id",
):
    """Per-Arrow-batch exact top-k kernel shared by brute-force and IVF.

    With `allow`, a row contributes to query q only when the row's
    inverted list is probed by q — exact IVF semantics, applied as one
    vectorized boolean gather (allow[:, batch_list_ids])."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            mat = _normalize(np.vstack(b[vec_col].to_numpy()).astype(np.float64))
            sims = qmat @ mat.T  # (n_queries, batch)
            if allow is not None:
                ok = allow[:, b[list_col].to_numpy(dtype=np.int64)]
                sims = np.where(ok, sims, -np.inf)
            if not include_self:
                same = qids[:, None] == b[id_col].to_numpy()[None, :]
                sims = np.where(same, -np.inf, sims)
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids, kk),
                "vec_id": b[id_col].to_numpy()[part.ravel()],
                "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[np.isfinite(out["cosine"])]

    return fn


def _global_topk(local: DataFrame, k: int) -> DataFrame:
    """Tiny global merge: partitions x queries x k rows through one window."""
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    queries: [(query_id, vector)] — small, shipped in the UDF closure
    (the broadcast-side of this 'join'). Returns
    (query_id, vec_id, cosine, rank) with exactly k rows per query.
    """
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    id_type = corpus.schema[id_col].dataType
    local = corpus.select(id_col, vec_col).mapInPandas(
        _local_topk_fn(qids, qmat, k, id_col, vec_col, include_self),
        schema=_topk_schema(id_type),
    )
    return _global_topk(local, k)


def fit_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Seeded mini k-means on an unbiased driver-side sample (Lloyd
    iterations in numpy). The sample is a seeded df.sample() — NOT a
    limit(), which takes first-rows in scan order and biases centroids
    toward whatever files happen to sort first. Cost at scale: one
    column-free count() (reads no data columns on columnar sources —
    split enumeration + footers) to size the fraction, plus the sample
    scan; only ~sample_rows vectors ever reach the driver."""
    n = corpus.count()
    frac = min(1.0, (sample_rows * 1.2) / max(n, 1))
    # no .limit() after sample(): CollectLimit keeps first-rows in scan
    # order, which would systematically discard the last-scanned files'
    # rows; the fraction alone bounds the driver-side size (~1.2x target)
    sample_df = corpus.select(vec_col).sample(fraction=frac, seed=seed)
    rows = [r[0] for r in sample_df.collect() if r[0] is not None]
    if len(rows) < nlist:
        # tiny corpus or unlucky draw: sample() has no lower bound, and
        # np.vstack([]) dies with an opaque shape error — take the exact
        # rows instead (bounded: the corpus itself is < ~nlist/frac rows)
        rows = [r[0] for r in corpus.select(vec_col).filter(F.col(vec_col).isNotNull()).limit(max(sample_rows, nlist)).collect()]
    if not rows:
        raise ValueError("fit_centroids: corpus has no non-null vectors to sample")
    sample = np.vstack(rows).astype(np.float64)
    sample = _normalize(sample)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def assign_lists(
    corpus: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append list_id = nearest-centroid index (one vectorized map pass).
    At scale, write the result partitioned/bucketed by list_id so probes
    are partition-pruned scans."""
    if "list_id" in corpus.columns:
        # re-indexing a previously built corpus: the stale assignment
        # must not survive into a duplicate column (the write would die
        # on an ambiguous list_id; silently keeping it would be worse)
        corpus = corpus.drop("list_id")
    out_schema = T.StructType(corpus.schema.fields + [T.StructField("list_id", T.IntegerType(), False)])
    cents = centroids

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            mat = _normalize(np.vstack(b[vec_col].to_numpy()).astype(np.float64))
            b = b.reset_index(drop=True)
            b["list_id"] = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            yield b

    return corpus.mapInPandas(fn, schema=out_schema)


def _ivf_query(
    listed: DataFrame,
    centroids: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF query kernel over an already-listed corpus (rows carry
    list_id): probe-mask in numpy, `list_id IN (...)` prune, one
    local-topk pass, tiny global merge."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    # stable sort: ties probe the lowest list_id first (matches the SQL
    # oracle's ORDER BY ... DESC, list_id tiebreak)
    probe = np.argsort(-(qmat @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    allow = np.zeros((len(queries), len(centroids)), dtype=bool)
    allow[np.arange(len(queries))[:, None], probe] = True

    probed_lists = sorted({int(x) for x in probe.ravel()})
    pruned = listed.filter(F.col("list_id").isin(probed_lists))
    id_type = listed.schema[id_col].dataType
    local = pruned.select(id_col, vec_col, "list_id").mapInPandas(
        _local_topk_fn(qids, qmat, k, id_col, vec_col, include_self=False, allow=allow),
        schema=_topk_schema(id_type),
    )
    return _global_topk(local, k)


def ivf_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only the nprobe nearest inverted lists per
    query.

    Plan shape: one `list_id IN (union of probed lists)` prune (a
    pushdown-able scan filter — partition pruning when the listed corpus
    is stored partitioned by list_id, which build_ivf_index does), then
    ONE local-topk pass where the per-query probe matrix masks foreign
    lists numpy-side. No Python UDF, no candidate join, no post-filter.
    Recall is tested against brute_force_topk."""
    if centroids is None:
        centroids = fit_centroids(corpus, nlist=nlist, vec_col=vec_col, seed=seed)
    listed = assign_lists(corpus, centroids, vec_col)
    return _ivf_query(listed, centroids, queries, k, nprobe, id_col, vec_col)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> dict:
    """Materialize the IVF index: what makes ANN practical at scale is
    fitting/assigning ONCE and amortizing over every later query batch.

    Writes two tables under `path`:
      corpus/    the input rows + list_id, PARTITIONED BY list_id — so
                 an indexed query's `list_id IN (probed)` filter becomes
                 physical partition pruning (only nprobe/nlist of the
                 data is even opened; plan-gated in tests)
      centroids/ (list_id, centroid array<double>) — tiny, exact float64
                 round-trip, so a loaded index probes identically to the
                 in-memory one.

    Rebuild atomicity: corpus and centroids MUST match (probing with
    centroids that didn't produce the stored list_ids silently returns
    wrong neighbors), so both tables are written to a staging dir and
    swapped in with the same backup-rename discipline table maintenance
    uses — a crash mid-rebuild leaves either the old complete index or
    the old index parked at `<path>__prebuild` (recovered on the next
    build), never a mixed one.
    """
    import os
    import shutil

    cents = (
        centroids
        if centroids is not None
        else fit_centroids(corpus, nlist=nlist, vec_col=vec_col, seed=seed)
    )
    backup = f"{path}__prebuild"
    if not os.path.isdir(path) and os.path.isdir(backup):
        os.rename(backup, path)  # finish a crashed rebuild's rollback
    staging = f"{path}__building"
    shutil.rmtree(staging, ignore_errors=True)
    listed = assign_lists(corpus, cents, vec_col)
    listed.write.mode("overwrite").partitionBy("list_id").parquet(f"{staging}/corpus")
    spark = corpus.sparkSession
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(
        cent_rows, "list_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/centroids")
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.isdir(path):
        os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        if os.path.isdir(backup):
            os.rename(backup, path)
        raise
    shutil.rmtree(backup, ignore_errors=True)
    return {"path": path, "nlist": int(len(cents)), "dim": int(cents.shape[1])}


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    """Centroid matrix back from a built index, row i = list i."""
    rows = (
        spark.read.parquet(f"{path}/centroids")
        .orderBy("list_id")
        .collect()
    )
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query against a build_ivf_index output: identical semantics
    to ivf_topk with the same centroids, but the probe filter prunes
    PARTITIONS of the stored corpus instead of filtering a full scan —
    the read itself shrinks to the probed lists."""
    centroids = load_ivf_centroids(spark, path)
    listed = spark.read.parquet(f"{path}/corpus")
    return _ivf_query(listed, centroids, queries, k, nprobe, id_col, vec_col)


def centroid_cells(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """(label, pos, sum_q, n_vecs) — per-label per-dimension EXACT
    aggregation cells for class centroids: each component is floored
    onto a 1/quantize grid ONCE per value (floor, not round — no
    tie-breaking rule to disagree on), then summed as integers, so the
    result is bit-identical regardless of partitioning, merge order, or
    engine. The mean is sum_q / n_vecs / quantize, recoverable exactly
    downstream; keeping the cells integer-valued makes the aggregate
    mergeable across shards/days (sums add, counts add) the way a
    float mean is not.

    Plan: posexplode -> partial HashAggregate on (label, pos) — the
    shuffle carries labels x dims cells, not vectors."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "_x"),
    )
    xq = F.floor(F.col("_x").cast("double") * quantize).cast("long")
    return ex.groupBy("label", "pos").agg(
        F.sum(xq).alias("sum_q"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """(label, centroid: array<double>) — class centroids assembled from
    the exact centroid_cells (components in dimension order). The only
    floating-point step is the final per-cell division, identical for
    any execution order."""
    cells = centroid_cells(df, label_col, vec_col, quantize)
    mean = (F.col("sum_q").cast("double") / F.col("n_vecs") / quantize)
    return (
        cells.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", mean.alias("m")))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def covariance_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """(i, j, sum_xy_q, sum_x_q, sum_y_q, n) for j >= i — the exact
    integer moment cells of the corpus covariance matrix: every vector
    component is floored onto a 1/quantize grid once, and all cross
    products are integer sums, so the cells are bit-identical under any
    partitioning and mergeable across shards (the same property as
    centroid_cells, lifted to second moments).

    Plan: one explode of the d(d+1)/2 upper-triangle pairs per vector
    (built inside codegen via nested transform over index sequences),
    then a partial-aggregated groupBy on (i, j) — the shuffle carries
    O(d^2) cells, not vectors. For d=64 that is 2,080 cells; for
    BPE-sized d re-block into Arrow-batched mapInArrow instead.
    Covariance recovers as
    (sum_xy/n - sum_x*sum_y/n^2) / quantize^2, exactly derivable
    downstream from the integer cells."""
    from pyspark.sql import functions as FF

    d = FF.size(FF.col(vec_col))
    qlit = FF.lit(quantize)
    # per-vector upper-triangle cells: i in [0, d), j in [i, d)
    pairs = FF.flatten(
        FF.transform(
            FF.sequence(FF.lit(0), d - 1),
            lambda i: FF.transform(
                FF.sequence(i, d - 1),
                lambda j: FF.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        FF.floor(FF.get(FF.col(vec_col), i).cast("double") * qlit)
                        * FF.floor(FF.get(FF.col(vec_col), j).cast("double") * qlit)
                    ).cast("long").alias("xy"),
                    FF.floor(FF.get(FF.col(vec_col), i).cast("double") * qlit)
                    .cast("long").alias("x"),
                    FF.floor(FF.get(FF.col(vec_col), j).cast("double") * qlit)
                    .cast("long").alias("y"),
                ),
            ),
        )
    )
    ex = df.select(FF.explode(pairs).alias("c"))
    return ex.groupBy(
        FF.col("c.i").alias("i"), FF.col("c.j").alias("j")
    ).agg(
        FF.sum("c.xy").alias("sum_xy_q"),
        FF.sum("c.x").alias("sum_x_q"),
        FF.sum("c.y").alias("sum_y_q"),
        FF.count(FF.lit(1)).alias("n"),
    )


def pca_project(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    out_col: str = "pca",
    quantize: int = 1_000_000,
    return_model: bool = False,
):
    """Project vectors onto their top-k principal components.

    Two-phase: (1) the EXACT covariance_cells aggregate collects to the
    driver (bounded: d(d+1)/2 rows), the dense covariance matrix is
    rebuilt and eigendecomposed with numpy (d x d, driver-side by
    design — eigensolving is not a data-parallel problem at dimension
    d); (2) the k eigenvectors ride the plan as array literals and the
    projection is a per-row zip_with dot product inside codegen — no
    Python in the distributed path, no second shuffle.

    Returns (projected_df, explained_variance_ratio: list[float]); with
    return_model=True additionally returns a dict of the fitted model
    internals (eigvals/components/mean/n/d) so invariant-based oracles
    can predict what the distributed projection must satisfy."""
    import numpy as np
    from pyspark.sql import functions as FF

    cells = covariance_cells(df, vec_col, quantize).collect()
    if not cells:
        raise ValueError("pca_project: empty input")
    d = max(c["j"] for c in cells) + 1
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    n = cells[0]["n"]
    cov = np.zeros((d, d))
    for c in cells:
        v = (c["sum_xy_q"] / n - (c["sum_x_q"] / n) * (c["sum_y_q"] / n)) / quantize**2
        cov[c["i"], c["j"]] = v
        cov[c["j"], c["i"]] = v
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]                  # d x k
    evr = [float(x) for x in (w[order] / max(w.sum(), 1e-300))]
    mean = np.array([0.0] * d)
    # mean from the diagonal cells' first moments
    for c in cells:
        if c["i"] == c["j"]:
            mean[c["i"]] = c["sum_x_q"] / n / quantize
    proj_cols = []
    for kk in range(k):
        comp = FF.array(*[FF.lit(float(x)) for x in comps[:, kk]])
        mu = FF.array(*[FF.lit(float(x)) for x in mean])
        centered = FF.zip_with(
            FF.col(vec_col), mu, lambda x, m: x.cast("double") - m
        )
        dot = FF.aggregate(
            FF.zip_with(centered, comp, lambda a, b: a * b),
            FF.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_cols.append(dot)
    out = df.withColumn(out_col, FF.array(*proj_cols))
    if return_model:
        model = {
            "eigvals": [float(x) for x in w[order]],
            "components": comps,  # d x k numpy array, columns unit-norm
            "mean": mean,         # length-d numpy array (quantized grid)
            "n": int(n),
            "d": int(d),
        }
        return out, evr, model
    return out, evr
