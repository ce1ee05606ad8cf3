"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k: queries broadcast as a numpy
    matrix into one mapInPandas pass (BLAS matmul per Arrow batch), then
    local-topk -> global-topk merge. The classic distributed pattern:
    each partition emits at most n_queries*k rows, so the final shuffle
    is tiny regardless of corpus size.
  * ivf_topk — IVF-style ANN: k-means centroids fitted on a driver-side
    sample (seeded), corpus partitioned by nearest centroid, queries
    probe only `nprobe` nearest lists. At 100 TB the centroid assignment
    is one map pass and the probe prunes ~(1 - nprobe/nlist) of the
    corpus from the scan.

Embedding-cosine near-duplicate detection reuses brute_force_topk with
the corpus as its own query set (see tests).
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
    (query_id, vec_id, cosine) with exactly k rows per query.
    """
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    id_type = corpus.schema[id_col].dataType

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            mat = _normalize(np.vstack(b[vec_col].to_numpy()).astype(np.float64))
            sims = qmat @ mat.T  # (n_queries, batch)
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

    local = corpus.select(id_col, vec_col).mapInPandas(local_topk, schema=_topk_schema(id_type))
    # Global merge: tiny shuffle (partitions x queries x k rows).
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def fit_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (Lloyd iterations in
    numpy). At 100 TB the sample is a bounded-size sketch of the corpus;
    fitting never touches the full data."""
    sample = np.vstack(
        [r[0] for r in corpus.select(vec_col).limit(sample_rows).collect()]
    ).astype(np.float64)
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
    query. Recall is tested against brute_force_topk."""
    if centroids is None:
        centroids = fit_centroids(corpus, nlist=nlist, vec_col=vec_col, seed=seed)
    listed = assign_lists(corpus, centroids, vec_col)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probed_lists = sorted({int(x) for x in probe.ravel()})
    pruned = listed.filter(F.col("list_id").isin(probed_lists))
    # Per-query list filter: keep (query, row) only when the row's list is
    # probed by that query — enforced after the cheap global prune.
    pairs_ok = {(int(q[0]), int(l)) for qi, q in enumerate(queries) for l in probe[qi]}
    result = brute_force_topk(pruned, queries, k=k * 2, id_col=id_col, vec_col=vec_col)
    listed_ids = listed.select(F.col(id_col).alias("vec_id"), "list_id")
    allowed = F.udf(lambda q, l: (q, l) in pairs_ok, T.BooleanType())  # tiny post-filter
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        result.join(listed_ids, on="vec_id")
        .filter(allowed(F.col("query_id"), F.col("list_id")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
