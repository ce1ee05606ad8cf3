"""Feature-hashed linear classifier inference — fastText-style quality
scoring at corpus scale.

Production curation pipelines score every document with a cheap linear
classifier over a hashed bag-of-words (fastText / logistic regression
with the hashing trick): no vocabulary table ships to executors, just
a dim-sized weight vector, and scoring is a projection + one partial
aggregate. This module implements INFERENCE with integer weights so
the score is exact (bit-reproducible on any engine — the oracle
replays it); training happens offline, the weights are model
parameters passed in.

Feature hash (portable arithmetic, identical in Spark SQL and DuckDB):

    bucket(w) = (byte_sum(w) * 2654435761 + length(w)) mod dim

Scale shape: tokens explode into a same-stage codegen projection
(bucket -> weight via an array-literal lookup, no join), feeding a
partial aggregate keyed by doc id — the shuffle carries one row per
document, never the token stream. The weight vector is a plan literal
(dim ints), the hashing-trick equivalent of a broadcast dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KNUTH = 2654435761


def default_weights(dim: int = 64) -> list[int]:
    """Deterministic stand-in model: w[b] = (b*37) % 17 - 8 (zero-mean
    integer weights). Real deployments pass their trained, quantized
    vector."""
    return [(b * 37) % 17 - 8 for b in range(dim)]


def bucket_expr(tok, dim: int):
    """bucket(token) column expression — pure codegen integer math."""
    byte_sum = F.aggregate(
        F.transform(F.split(tok, ""), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return F.pmod(byte_sum * F.lit(KNUTH) + F.length(tok).cast("long"),
                  F.lit(dim).cast("long"))


def feature_hash_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    weights: list[int] | None = None,
) -> DataFrame:
    """(id_col, score, label) — exact integer hashed-BoW linear score
    per document; label = score > 0 (the decision threshold is an
    integer comparison, so no float crosses the engine boundary)."""
    if weights is None:
        weights = default_weights(dim)
    if len(weights) != dim:
        raise ValueError(f"weights must have length dim={dim}, got {len(weights)}")
    if any(w != int(w) for w in weights):
        raise ValueError("weights must be integers (exact inference contract)")
    wlit = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).filter(F.length("_tok") > 0)
    scored = toks.select(
        id_col,
        F.element_at(wlit, (bucket_expr(F.col("_tok"), dim) + 1).cast("int"))
        .alias("_w"),
    )
    return scored.groupBy(id_col).agg(F.sum("_w").alias("score")).select(
        id_col,
        F.col("score").cast("long").alias("score"),
        (F.col("score") > 0).alias("label"),
    )


def label_rates(
    scores: DataFrame,
    dims: DataFrame,
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """(by, n_docs, n_pos, pos_rate) — classifier acceptance rate per
    group: broadcast-enrich the (id, label) frame with the grouping
    column, then one partial-aggregated count. The division happens
    once per GROUP in the final projection (exact integer counts
    underneath)."""
    j = scores.join(dims.select(id_col, by), id_col)
    return (
        j.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("label").cast("long")).alias("n_pos"),
        )
        .select(
            by,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(F.col("n_pos") / F.col("n_docs"), 4).alias("pos_rate"),
        )
    )
