"""Char-trigram language-model perplexity scoring (CCNet-style).

The classic web-corpus quality gate (Wenzek et al. 2020, public: CCNet
filters by LM perplexity against a clean target corpus) — the reference
engine has no analog. Here the LM is a character-trigram model with
add-1 smoothing fit on a target slice of the corpus:

    p(c | ab) = (T(abc) + 1) / (B(ab) + V)

with T = trigram counts, B = trigram-PREFIX counts (derived from T, so
normalization is exact by construction), V a fixed vocab constant. A
document's negative log-likelihood is the count-weighted sum over its
trigrams; unseen trigrams/prefixes fall out of the same formula via
left-join + 0 (p = 1/V floor).

Exactness: the single float step (per distinct trigram, ln(T+1) -
ln(B+V) of INTEGER arguments) is quantized onto a 1e-6 grid before any
per-document arithmetic — doc scores are exact int64 dot products,
bit-identical under any partitioning (the discipline of importance.py;
same empirical libm-parity caveat as the DSIR/bm25 log, validated by
the oracle sweep).

Scale shape (100 TB): fitting is one explode -> partial-agg pass whose
shuffle carries distinct trigrams (V^3-bounded, ~10-100k real);
B derives from the T table, not a second corpus pass. Scoring shuffles
(doc, trigram) cells against the LM table — joins are key-partitioned
and AQE broadcasts the LM side when it fits; documents never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

V_VOCAB = 128
LP_QUANTIZE = 1_000_000


def char_trigrams(col: Column) -> Column:
    """array<string> of all 3-char windows (empty for len < 3)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - 2, F.lit(1)))
    tris = F.transform(idx, lambda i: F.substring(col, i, F.lit(3)))
    return F.filter(tris, lambda t: F.length(t) == 3)


def trigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(tri, t_cnt): the LM fit artifact — integer, shard-mergeable.
    Explode feeds a same-stage partial HashAggregate; the shuffle
    carries distinct trigrams."""
    tris = df.select(F.explode(char_trigrams(F.col(text_col))).alias("tri"))
    return tris.groupBy("tri").agg(F.count(F.lit(1)).alias("t_cnt"))


def prefix_counts(tri_counts: DataFrame) -> DataFrame:
    """(pre, b_cnt) derived from the trigram table (B(ab) = sum_c
    T(abc)) — exact normalization, no second corpus pass."""
    return tri_counts.groupBy(
        F.substring("tri", 1, 2).alias("pre")
    ).agg(F.sum("t_cnt").alias("b_cnt"))


def _logp_q(t_cnt: Column, b_cnt: Column) -> Column:
    """Quantized add-1 log-prob: round(1e6 * [ln(T+1) - ln(B+V)]) of
    integer arguments; after this no float re-enters the plan."""
    lp = F.log(t_cnt + F.lit(1).cast("long")) - F.log(
        b_cnt + F.lit(int(V_VOCAB)).cast("long")
    )
    return F.round(lp * LP_QUANTIZE, 0).cast("long")


def perplexity_scores(
    df: DataFrame,
    lm_tri: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tri, nll_q): exact negative log-likelihood on the 1e-6
    grid (true NLL = nll_q / 1e6; per-char NLL compares as
    nll_q <=> threshold * n_tri — integer, division-free). Documents
    with no trigrams score (0, 0)."""
    feats = (
        df.select(F.col(id_col), F.explode_outer(char_trigrams(F.col(text_col))).alias("tri"))
        .groupBy(id_col, "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lm_b = prefix_counts(lm_tri)
    scored = (
        feats.join(lm_tri, "tri", "left")
        .withColumn("pre", F.substring("tri", 1, 2))
        .join(lm_b, "pre", "left")
        .select(
            F.col(id_col),
            F.col("cnt"),
            F.col("tri"),
            _logp_q(
                F.coalesce(F.col("t_cnt"), F.lit(0)),
                F.coalesce(F.col("b_cnt"), F.lit(0)),
            ).alias("lp_q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum(F.when(F.col("tri").isNull(), 0).otherwise(F.col("cnt"))).alias("n_tri"),
        (-F.sum(
            F.when(F.col("tri").isNull(), F.lit(0).cast("long"))
            .otherwise(F.col("cnt") * F.col("lp_q"))
        )).alias("nll_q"),
    )


def perplexity_filter(
    scores: DataFrame,
    max_nll_per_tri: float | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ids whose mean per-trigram NLL clears the gate — compared
    as integers, division-free. Trigram-less docs are dropped (no
    evidence either way).

    With max_nll_per_tri (nats): absolute gate nll_q <= thresh_q*n_tri.
    With None: corpus-mean-relative gate (scale-free — discriminates at
    every corpus size): nll_q * T_n <= n_tri * T_nll where (T_n, T_nll)
    are corpus totals — a 1-row broadcast. The cross-multiply is exact
    int64 here; at 10^12-doc scale pre-divide the corpus mean onto the
    grid driver-side instead (one rounding, then the absolute gate)."""
    evid = scores.filter(F.col("n_tri") > 0)
    if max_nll_per_tri is not None:
        thresh_q = int(round(max_nll_per_tri * LP_QUANTIZE))
        return evid.filter(
            F.col("nll_q") <= F.lit(thresh_q) * F.col("n_tri")
        ).select(id_col)
    tot = evid.agg(
        F.sum("n_tri").alias("_t_n"), F.sum("nll_q").alias("_t_nll")
    )
    return (
        evid.crossJoin(F.broadcast(tot))
        .filter(F.col("nll_q") * F.col("_t_n") <= F.col("n_tri") * F.col("_t_nll"))
        .select(id_col)
    )
