"""Distributed byte-pair-encoding (BPE) trainer over token arrays.

The pipeline's payload is pre-tokenized sequences (BASELINE.json
input_hint: tokens:array<int32>); a training-data stack also needs to
FIT tokenizers on raw byte/token streams (Sennrich et al. 2016,
public). The reference engine has no analog (redeye is a line filter,
src/bin/redeye.rs:82-89) — this is a first-class token-curation
operator in the same iterative-driver-state shape as
operators/clustering.py:

  * per merge round the cluster does ONE shuffle: adjacent-pair
    explode feeding a same-stage partial HashAggregate (the shuffle
    carries distinct (a, b) pair keys — vocab^2-bounded, tiny next to
    the token stream);
  * the argmax pair comes to the driver as ONE row (count desc, then
    (a, b) ascending — fully deterministic tie-break);
  * applying the merge is a ZERO-shuffle per-row fold (higher-order
    F.aggregate, JVM-side, no Python): greedy leftmost non-overlapping
    replacement, the standard BPE scan order (overlaps only arise when
    a == b, e.g. 'aaaa' + (a,a) -> XX, not aXa).

Everything is integer arithmetic end-to-end, so a SQL oracle can
replay the ENTIRE training run: the greedy scan is reproduced
relationally via match-islands (consecutive matching positions) and
even-parity selection within each island — bit-identical to the fold.

Scale notes (100 TB): driver state is one (a, b, new_id) triple per
round; sequences never leave executors; re-encoding lineage depth
equals the round count (cache the input once per fit in production).
Per-row fold cost is O(n_tok) steps (array concat per step — fine for
log-line/context-window lengths; for book-length docs chunk first
with sequences.chunk_tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def adjacent_pairs(tokens: Column) -> Column:
    """array<struct<a,b>> of every adjacent token pair (overlapping,
    in order). Rows shorter than 2 yield an empty array."""
    n = F.size(tokens)
    left = F.slice(tokens, 1, F.greatest(n - 1, F.lit(0)))
    right = F.slice(tokens, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(left, right, lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(a, b, cnt) — corpus-wide adjacent-pair frequencies. The explode
    feeds a same-stage partial HashAggregate; the shuffle carries
    distinct pair keys only."""
    pairs = df.select(F.explode(adjacent_pairs(F.col(tokens_col))).alias("p"))
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def merge_pair(tokens: Column, a: int, b: int, new_id: int) -> Column:
    """Greedy leftmost non-overlapping replacement of (a, b) -> new_id:
    one JVM-side fold per row, zero shuffle, zero Python. Carries a
    one-token lookbehind: prev==a and cur==b emits new_id and clears
    prev (so 'aaa' + (a,a) -> (X, a), the canonical BPE scan)."""
    a_l, b_l, n_l = F.lit(int(a)), F.lit(int(b)), F.lit(int(new_id)).cast("int")
    init = F.struct(
        F.array().cast("array<int>").alias("out"),
        F.lit(None).cast("int").alias("prev"),
    )

    def step(acc, x):
        out, prev = acc["out"], acc["prev"]
        return (
            F.when(prev.isNull(), F.struct(out.alias("out"), x.alias("prev")))
            .when(
                (prev == a_l) & (x == b_l),
                F.struct(
                    F.concat(out, F.array(n_l)).alias("out"),
                    F.lit(None).cast("int").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(F.concat(out, F.array(prev)).alias("out"), x.alias("prev"))
            )
        )

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(tokens.cast("array<int>"), init, step, finish)


def bpe_fit(
    df: DataFrame,
    rounds: int = 3,
    first_new_id: int = 256,
    tokens_col: str = "tokens",
) -> list[tuple[int, int, int, int]]:
    """Run `rounds` BPE merge rounds; return [(a, b, new_id, cnt)] in
    merge order. Per round: one pair-count shuffle + a 1-row driver
    collect (argmax by cnt desc, a asc, b asc), then a zero-shuffle
    re-encode folded into the lineage. Ids allocate upward from
    first_new_id (must exceed the input vocab)."""
    cur = df.select(F.col(tokens_col).alias("_t"))
    merges: list[tuple[int, int, int, int]] = []
    for r in range(rounds):
        top = (
            pair_counts(cur, "_t")
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()  # bounded: exactly one (a, b, cnt) row
        )
        if not top:
            break  # corpus has no adjacent pairs left (degenerate input)
        a, b, cnt = int(top[0]["a"]), int(top[0]["b"]), int(top[0]["cnt"])
        new_id = first_new_id + r
        merges.append((a, b, new_id, cnt))
        cur = cur.select(merge_pair(F.col("_t"), a, b, new_id).alias("_t"))
    return merges


def apply_merges(
    df: DataFrame,
    merges: list[tuple[int, int, int, int]],
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> DataFrame:
    """Re-encode a corpus under a fitted merge list (in order) — the
    inference path: pure per-row folds, zero shuffle, safe over the
    full corpus at any scale."""
    col = F.col(tokens_col)
    for a, b, new_id, _ in merges:
        col = merge_pair(col, a, b, new_id)
    return df.withColumn(out_col or tokens_col, col)
