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


def chunk_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    block: int = 2048,
    stride: int | None = None,
    out_col: str = "chunk",
    idx_col: str = "chunk_idx",
) -> DataFrame:
    """Split each token sequence into fixed-size training blocks
    (optionally overlapping — the context-window chunking transform).

    Chunk i covers tokens [i*stride, i*stride + block); chunks are
    emitted until one reaches the end of the sequence, so the final
    chunk may be short but no chunk is ever fully contained in its
    predecessor. Sequences shorter than `block` yield one chunk; empty
    sequences yield none.

    Pure whole-stage-codegen: explode(sequence(0, n_chunks-1)) + slice —
    no shuffle, no Python. The explode's row amplification is
    ~n_tok/stride per document, exactly the output size, so the
    transform is scan-shaped at any corpus size and Catalyst can still
    push document-level filters below it.
    """
    if stride is None:
        stride = block
    if block <= 0 or stride <= 0:
        raise ValueError(f"block and stride must be positive, got {block}, {stride}")
    if stride > block:
        raise ValueError(f"stride {stride} > block {block} would drop tokens")
    clash = {idx_col, out_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"output column(s) {sorted(clash)} already exist on the input — "
            "pass different idx_col/out_col names"
        )
    n = F.size(F.col(tokens_col))
    n_chunks = (
        F.lit(1) + F.ceil((F.greatest(n - block, F.lit(0))) / F.lit(stride))
    ).cast("int")
    i = F.col(idx_col)
    return (
        df.filter(n > 0)
        .withColumn(idx_col, F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(out_col, F.slice(F.col(tokens_col), i * stride + 1, block))
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training epochs: every row gets
    shuffle_key = md5(epoch || id) and the frame is range-partitioned +
    sorted by it — a reproducible, seedable total order computed with a
    scale-correct sort (range exchange, no single-reducer window). A new
    epoch re-keys, giving a fresh permutation from the same data."""
    keyed = df.withColumn(
        "shuffle_key", F.md5(F.concat(F.lit(f"e{epoch}:"), F.col(id_col).cast("string")))
    )
    if num_partitions:
        return keyed.repartitionByRange(num_partitions, "shuffle_key").sortWithinPartitions(
            "shuffle_key"
        )
    return keyed.orderBy("shuffle_key")


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_band: int = 8,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine).

    Fully distributed — random-hyperplane LSH bucketing + exact in-bucket
    cosine (see dedup.cosine_lsh_pairs); no driver-side collect at any
    corpus size. The band parameters trade shuffle volume for recall at
    the chosen threshold: the defaults suit near-dup thresholds >= 0.9;
    for looser thresholds pass narrower, more numerous bands
    (e.g. bits_per_band=4, bands=64 for ~0.45)."""
    from .dedup import cosine_lsh_pairs

    return cosine_lsh_pairs(
        corpus,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        bits_per_band=bits_per_band,
        bands=bands,
        seed=seed,
    )
