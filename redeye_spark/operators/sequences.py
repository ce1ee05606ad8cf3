"""Token-sequence operators for training-data pipelines: length stats
and greedy sequence packing (concatenate short sequences up to a token
budget — the standard pre-training batching transform).

Packing is per-partition greedy (first-fit in arrival order): globally
optimal bin packing needs a shuffle-heavy sort and buys ~1-2% density;
the per-partition version is one mapInPandas pass, embarrassingly
parallel, deterministic given the input partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType(), False),
        T.StructField("doc_ids", T.ArrayType(T.StringType()), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
    ]
)


def length_histogram(df: DataFrame, bucket: int = 16) -> DataFrame:
    """Token-length histogram: floor(n_tok/bucket)*bucket -> count."""
    return (
        df.groupBy((F.floor(F.col("n_tok") / bucket) * bucket).cast("long").alias("len_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("n_tok").cast("long")).alias("total_tok"))
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    sep_token: int = 10,  # '\n'
) -> DataFrame:
    """Greedy first-fit packing of token sequences into <=max_tokens
    packs, separated by sep_token. Sequences longer than max_tokens form
    single-document packs (never truncated here — truncation is a
    separate policy decision)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        cur_ids: list = []
        cur_toks: list = []
        cur_len = 0
        pack_n = 0

        def flush():
            nonlocal cur_ids, cur_toks, cur_len, pack_n
            if not cur_ids:
                return None
            toks = np.concatenate(cur_toks).astype(np.int32)
            row = {
                "pack_id": f"p{pid}-{pack_n}",
                "doc_ids": list(cur_ids),
                "tokens": toks.tolist(),
                "n_tok": int(len(toks)),
                "n_docs": len(cur_ids),
            }
            pack_n += 1
            cur_ids, cur_toks, cur_len = [], [], 0
            return row

        rows = []
        for b in batches:
            for doc_id, toks in zip(b["doc_id"], b["tokens"]):
                arr = np.asarray(toks, dtype=np.int32)
                need = len(arr) + (1 if cur_ids else 0)
                if cur_ids and cur_len + need > max_tokens:
                    r = flush()
                    if r:
                        rows.append(r)
                if cur_ids:
                    cur_toks.append(np.array([sep_token], dtype=np.int32))
                    cur_len += 1
                cur_ids.append(doc_id)
                cur_toks.append(arr)
                cur_len += len(arr)
                if cur_len >= max_tokens:
                    r = flush()
                    if r:
                        rows.append(r)
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])
                rows = []
        r = flush()
        if r:
            rows.append(r)
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])

    return df.select("doc_id", "tokens").mapInPandas(fn, schema=PACKED_SCHEMA)


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine).

    Small-corpus exact path: the normalized matrix is shipped to every
    partition (closure broadcast) and each Arrow batch does one matmul
    against it. At scale, replace the broadcast with LSH bucketing on
    random hyperplane signatures (same output contract); the guard below
    makes the scale limit explicit rather than silent.
    """
    rows = corpus.select(id_col, vec_col).collect()
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"{len(rows)} rows exceed the exact-path broadcast budget; "
            "use LSH bucketing (dedup.minhash-style) at this scale"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1
    mat = mat / norms

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            bm = np.vstack(b[vec_col].to_numpy()).astype(np.float64)
            bn = np.linalg.norm(bm, axis=1, keepdims=True)
            bn[bn == 0] = 1
            bm = bm / bn
            sims = bm @ mat.T  # (batch, corpus)
            bids = b[id_col].to_numpy(dtype=np.int64)
            ii, jj = np.nonzero((sims >= threshold) & (bids[:, None] < ids[None, :]))
            if len(ii):
                yield pd.DataFrame(
                    {"id_a": bids[ii], "id_b": ids[jj], "cosine": np.round(sims[ii, jj], 6)}
                )

    return corpus.mapInPandas(fn, schema=schema)
