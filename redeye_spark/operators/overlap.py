"""Pairwise corpus-overlap between sources: exact Jaccard similarity
of the per-source word-n-gram vocabularies.

A mixture pipeline needs this BEFORE blending sources: two "different"
crawls with 0.9 vocabulary Jaccard are the same corpus twice (dedup
them first, or the mixture weights silently double-count), and a
benchmark source whose n-grams heavily overlap a training source is a
contamination signal at corpus granularity (the document-level
complement is operators/dedup.py decontaminate).

Scale shape: one distinct-(source, gram) aggregation (the shuffle
carries distinct grams per source — vocabulary-sized, not
corpus-sized), then a per-gram collect_set(source) whose size is
bounded by the NUMBER OF SOURCES (a mixture has tens, not millions),
pair expansion inside codegen from that bounded set, and a final
pair-keyed count. The per-source vocabulary sizes re-aggregate from
the same distinct frame and broadcast (sources-sized) onto the pair
counts. No self-join on grams (the classic all-pairs trap: a gram in
every source would fan s^2 rows per gram BEFORE aggregation — the
set-then-expand shape caps that fan at the same s^2 but AFTER the
distinct collapse, once per gram, map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def source_gram_overlap(
    df: DataFrame,
    text_col: str,
    source_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_common, jaccard) for every
    ordered pair source_a < source_b sharing at least one word-n-gram.
    n_a/n_b are the distinct-n-gram vocabulary sizes, n_common the
    intersection size, jaccard = common / (n_a + n_b - common) rounded
    to 6 dp (one exact-int division — deterministic)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    wins = F.filter(
        F.transform(idx, lambda i: F.slice(words, i, n)),
        lambda g: F.size(g) == n,
    )
    grams = df.select(
        F.col(source_col).alias("_src"),
        F.explode(F.transform(wins, lambda w: F.concat_ws(" ", w))).alias("_gram"),
    )
    vocab = grams.distinct()
    # per-gram source set (bounded by the source count), expanded to
    # ordered pairs inside codegen: for each source at index i, pair it
    # with every LATER source in the sorted set
    per_gram = vocab.groupBy("_gram").agg(
        F.sort_array(F.collect_set("_src")).alias("_srcs")
    )
    pairs = per_gram.select(
        F.explode(
            F.flatten(
                F.transform(
                    "_srcs",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("_srcs"), i + F.lit(2),
                            F.greatest(F.size(F.col("_srcs")), F.lit(1)),
                        ),
                        lambda y: F.struct(
                            x.alias("source_a"), y.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("_p")
    ).select("_p.source_a", "_p.source_b")
    common = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    sizes = vocab.groupBy("_src").agg(F.count(F.lit(1)).alias("_nv"))
    va = sizes.select(F.col("_src").alias("source_a"), F.col("_nv").alias("n_a"))
    vb = sizes.select(F.col("_src").alias("source_b"), F.col("_nv").alias("n_b"))
    out = (
        common.join(F.broadcast(va), "source_a")
        .join(F.broadcast(vb), "source_b")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return out.select(
        "source_a", "source_b", "n_a", "n_b", "n_common",
        F.round(jac, 6).alias("jaccard"),
    )
