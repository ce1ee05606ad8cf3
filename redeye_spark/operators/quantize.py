"""Scalar-quantized similarity search (SQ8) — the 100 TB ANN workhorse.

At production scale the embedding corpus is stored quantized: int8
codes are 4x smaller than float32 (scan 25 TB instead of 100), integer
dot products SIMD-vectorize, and recall loss is measured, not guessed.
This module implements symmetric global-scale scalar quantization:

    code_i = floor(x_i * L / absmax)            (L = 127 for int8)

with absmax = max(|x|) over the corpus (one exact, mergeable max
aggregate — the calibration pass). Reconstruction is x̂ = code * s with
a single global s = absmax/L, so ranking by the EXACT INTEGER dot
Σ code_a·code_b is identical to ranking by the reconstructed inner
product — the quantized search is fully integer and therefore
bit-reproducible on any engine (the DuckDB oracle replays it exactly).

Scale shape mirrors similarity.brute_force_topk: queries ship in the
UDF closure as a quantized numpy matrix, each Arrow batch emits at
most n_queries*k local winners via one int64 matmul, and the global
merge is a window over partitions x queries x k rows. The calibration
aggregate collects ONE scalar. `sq_recall` measures quantization loss
as top-k overlap against a higher-precision quantization (int16 by
default) — both sides exact-integer, so the recall number itself is
engine-independent (no float ulp can flip a boundary).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def sq_absmax(corpus: DataFrame, vec_col: str = "embedding") -> float:
    """Calibration: exact corpus-wide max(|x|) — max-of-max is mergeable
    and float-exact (no summation), so partials combine map-side and
    one scalar reaches the driver."""
    row = corpus.select(
        F.max(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: F.abs(x)),
                F.lit(0.0).cast("float"),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("m")
    ).first()
    m = float(row["m"]) if row["m"] is not None else 0.0
    if m <= 0.0:
        raise ValueError("corpus absmax is 0 — nothing to quantize")
    return m


def _codes(mat: np.ndarray, absmax: float, levels: int) -> np.ndarray:
    """floor(x*L/absmax) in float64 — the same two IEEE ops (multiply,
    divide) the SQL oracle performs, so codes agree bit-for-bit."""
    return np.floor((mat.astype(np.float64) * float(levels)) / absmax).astype(
        np.int64
    )


def _sq_local_topk(qids, qcodes, k, id_col, vec_col, absmax, levels):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            codes = _codes(np.vstack(b[vec_col].to_numpy()), absmax, levels)
            dots = qcodes @ codes.T  # int64, exact
            same = qids[:, None] == b[id_col].to_numpy()[None, :]
            # mask sentinel must negate safely under int64 (argpartition
            # sorts -dots): |true dot| <= levels^2 * dim << 2^62
            neg = -(1 << 62)
            dots = np.where(same, neg, dots)
            # k+1 local winners: a batch holding a query's own row must
            # still surface k true candidates after the self-drop
            kk = min(k + 1, dots.shape[1])
            part = np.argpartition(-dots, kk - 1, axis=1)[:, :kk]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, kk),
                    "vec_id": b[id_col].to_numpy()[part.ravel()],
                    "dot": np.take_along_axis(dots, part, axis=1).ravel(),
                }
            )
            yield out[out["dot"] != neg]

    return fn


def sq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    levels: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    absmax: float | None = None,
) -> DataFrame:
    """Quantized top-k: (query_id, vec_id, dot, rank) — `dot` is the
    exact integer code dot product (ties broken by vec_id asc). Query
    vectors are quantized with the SAME corpus absmax (symmetric SQ)."""
    if absmax is None:
        absmax = sq_absmax(corpus, vec_col)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qcodes = _codes(np.array([q[1] for q in queries]), absmax, levels)
    id_type = corpus.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("vec_id", id_type, False),
            T.StructField("dot", T.LongType(), False),
        ]
    )
    local = corpus.select(id_col, vec_col).mapInPandas(
        _sq_local_topk(qids, qcodes, k, id_col, vec_col, absmax, levels),
        schema=schema,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot", "rank")
    )


def sq_recall(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    levels_lo: int = 127,
    levels_hi: int = 32767,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantization-loss report: per query, the top-k overlap between
    the int8-grade search and an int16-grade reference —
    (query_id, n_common, recall). Two corpus scans (one per precision),
    each emitting only queries*k rows; the overlap join is tiny."""
    absmax = sq_absmax(corpus, vec_col)
    lo = sq_topk(corpus, queries, k, levels_lo, id_col, vec_col, absmax)
    hi = sq_topk(corpus, queries, k, levels_hi, id_col, vec_col, absmax)
    both = lo.select("query_id", "vec_id").join(
        hi.select("query_id", "vec_id"), ["query_id", "vec_id"]
    )
    n = both.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_common"))
    # left-join from the query-id set so a 0-overlap query still reports
    qids_df = lo.select("query_id").distinct()
    return qids_df.join(n, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
        F.round(F.coalesce(F.col("n_common"), F.lit(0)) / F.lit(k), 4).alias(
            "recall"
        ),
    )
