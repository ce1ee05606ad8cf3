"""DSIR-style importance weighting via hashed n-gram features.

Data Selection for Language Models via Importance Resampling (Xie et
al., 2023, public) scores each raw document by how much its hashed
n-gram distribution looks like a target corpus: features are word
unigrams hashed into B buckets, the corpus-level target/raw bucket
distributions are estimated once, and the per-document importance is

    score(d) = sum_g count_d(g) * [ln p_target(g) - ln p_raw(g)]

with add-1 smoothing. The reference engine has no analog (redeye is a
line filter); this is a first-class training-data-curation operator.

Exactness: the single float step (the per-bucket log-ratio) is
quantized onto a 1e-6 integer grid ONCE per bucket — per-document
scores are then exact int64 dot products, bit-identical under any
partitioning / merge order / engine (the same discipline as
clustering.py). Hashing is md5-prefix (sampling.hash_bucket), the one
hash every SQL engine reproduces.

Scale shape (100 TB posture): explode words -> partial-aggregated
groupBy — the shuffles carry (doc, bucket) count cells and the
256-row ratio table, never documents. The ratio table and its 1-row
totals broadcast; scoring is one broadcast-join + partial-agg pass.
In production the ratio table is fit once (possibly on a sample) and
reused — bucket_ratios output is mergeable (counts add).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_bucket
from .text import words

N_BUCKETS = 256
LR_QUANTIZE = 1_000_000


def hashed_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, cnt) — per-document hashed unigram counts (the
    feature-hashing step). Explode feeds a same-stage partial
    HashAggregate; the shuffle carries doc x bucket cells."""
    wb = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("_w")
    ).select(F.col(id_col), hash_bucket(F.col("_w"), "dsir").alias("bucket"))
    return wb.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def bucket_ratios(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, n_target, n_raw) — corpus-level word-occurrence counts
    per hash bucket, overall and under the `target` predicate (e.g.
    lang == 'en'). Integer cells: mergeable across shards/days, exact
    under any partitioning. Buckets no word hashes to are simply
    absent (consistently so in the scoring join)."""
    wb = df.select(
        target.alias("_tgt"), F.explode(words(F.col(text_col))).alias("_w")
    ).select("_tgt", hash_bucket(F.col("_w"), "dsir").alias("bucket"))
    return wb.groupBy("bucket").agg(
        F.sum(F.col("_tgt").cast("long")).alias("n_target"),
        F.count(F.lit(1)).alias("n_raw"),
    )


def log_ratio_table(ratios: DataFrame) -> DataFrame:
    """(bucket, lr_q) — the quantized smoothed log-likelihood ratio
    per bucket: round(1e6 * [ln((n_t+1)/(T+B)) - ln((n_r+1)/(R+B))]).
    The totals are a 1-row broadcast (the benign keyless shape); after
    this projection no float ever re-enters the computation."""
    tot = ratios.agg(
        F.sum("n_target").alias("_t_tot"), F.sum("n_raw").alias("_r_tot")
    )
    lr = (
        F.log((F.col("n_target") + 1) / (F.col("_t_tot") + F.lit(float(N_BUCKETS))))
        - F.log((F.col("n_raw") + 1) / (F.col("_r_tot") + F.lit(float(N_BUCKETS))))
    )
    return ratios.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(lr * LR_QUANTIZE, 0).cast("long").alias("lr_q"),
    )


def dsir_scores(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score_q) — per-document DSIR importance on the 1e-6 grid
    (true score = score_q / 1e6). Exact int64 dot product of the
    document's hashed counts with the quantized log-ratio table; the
    ratio table broadcasts (256 rows)."""
    # ONE explode+hash pass: the corpus-level ratio counts are derived
    # from the per-document cells (n_raw = sum of cell counts, n_target
    # = sum over target docs — exact integers either way), instead of a
    # second full explode+md5 pass over the word stream. The cells'
    # exchange then feeds both the ratio aggregate and the scoring
    # join (AQE ReusedExchange), so the word stream is hashed once.
    # _tgt rides the grouping keys (it is constant per doc, so the
    # groups are unchanged).
    wb = df.select(
        F.col(id_col), target.alias("_tgt"),
        F.explode(words(F.col(text_col))).alias("_w"),
    ).select(
        F.col(id_col), "_tgt", hash_bucket(F.col("_w"), "dsir").alias("bucket")
    )
    cells = wb.groupBy(id_col, "_tgt", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ratios = cells.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), F.col("cnt")).otherwise(F.lit(0).cast("long")))
        .alias("n_target"),
        F.sum("cnt").alias("n_raw"),
    )
    lr = log_ratio_table(ratios)
    return (
        cells.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("lr_q")).alias("score_q"))
    )


def dsir_top_docs(
    df: DataFrame,
    target: Column,
    n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-n selection by importance (score desc, id asc
    tiebreak) — the resampling step's greedy variant; plans as
    TakeOrderedAndProject (no global sort materialization)."""
    return (
        dsir_scores(df, target, text_col, id_col)
        .orderBy(F.col("score_q").desc(), F.col(id_col))
        .limit(n)
    )
