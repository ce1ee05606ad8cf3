"""Token-sequence n-gram operators over the pipeline's input shape
(doc_id, tokens:array<int>, n_tok, source) — BASELINE.json input_hint.

The reference consumes lines; a training-data pipeline ALSO needs
statistics over the token arrays themselves (vocabulary coverage,
n-gram frequencies, unigram distributions) before any detokenize. All
ops here are pure JVM plans: higher-order array functions build the
n-grams inside whole-stage codegen, and the only shuffle is the final
partial->final aggregation, which collapses map-side because n-gram key
cardinality (bytes: <= 256^n with heavy skew toward a few thousand real
grams) is tiny next to row count. No Python, no UDF, no explode of
anything wider than the gram stream itself.

Scale notes (100 TB): explode(token n-grams) is a row multiplier of
~n_tok per doc, but it feeds straight into a partial HashAggregate in
the same codegen stage, so the shuffle carries only distinct grams per
task — bytes, not the corpus. For unigram stats the same holds with a
256-key dictionary. vocab_coverage broadcasts the vocab (an array
literal for byte vocabs; swap to a broadcast join for real BPE vocabs
>100k entries, same call shape)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ngram_column(tokens: Column, n: int) -> Column:
    """array<array<int>> of all length-n windows of a token array.
    Rows shorter than n yield an empty array (not a partial gram)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # sequence(1, 0) DESCENDS in Spark (it never yields an empty range),
    # so clamp the upper bound to 1 and drop the partial gram a too-short
    # row produces via a size filter — type-preserving and branch-free
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.slice(tokens, i, n))
    return F.filter(grams, lambda g: F.size(g) == n)


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    tokens_col: str = "tokens",
    min_count: int = 1,
) -> DataFrame:
    """(gram:array<int>, n_occurrences) — corpus-wide n-gram frequency.
    min_count prunes the long tail AFTER the aggregate (it's a HAVING,
    pushed to the final agg, not a separate job)."""
    grams = df.select(
        F.explode(ngram_column(F.col(tokens_col), n)).alias("gram")
    )
    out = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_occurrences"))
    if min_count > 1:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out


def byte_ngram_counts(
    df: DataFrame,
    n: int = 2,
    line_col: str = "line",
    min_count: int = 1,
) -> DataFrame:
    """(gram:array<int>, n_occurrences) — byte-token n-gram frequencies
    computed straight from LINE STRINGS, result-identical to
    ``ngram_counts(tokenize_lines(df), n)``: the tokenizer is one int32
    token per UTF-8 byte, so the n-grams of the token array ARE the
    n-byte windows of the string.

    Why a separate entry point (guide §2.3/§4.2): the tokenize ->
    explode path ships the per-byte ``list<int32>`` token column across
    the Python->JVM boundary (~5x the line bytes, materialized
    element-at-a-time) and then explodes ~n_tok rows per doc into the
    partial aggregate. Here the SAME Python hop that would have
    tokenized instead counts the n-byte windows per Arrow batch in
    numpy and emits one (gram, partial_count) row per DISTINCT gram per
    task — both the Python boundary and the exchange carry
    key-cardinality-sized data (<= 256^n keys, ~thousands real) instead
    of the token stream. The final groupBy sums the partials; a sum of
    per-batch exact counts is the exact corpus count.

    n is capped at 8 so a gram packs into one uint64 key. Null lines
    tokenize as the literal string 'None' (astype(str)), exactly like
    tokens_list_array."""
    if not (1 <= n <= 8):
        raise ValueError("n must be in 1..8 (gram must pack into uint64)")

    def fn(batches):
        import numpy as np
        import pyarrow as _pa

        from ..functions.tokens import _ranges, _string_buffers

        _pa.set_cpu_count(1)
        acc_keys: list = []
        acc_cnts: list = []
        for b in batches:
            if b.num_rows == 0:
                continue
            arr = b.column(0)
            if isinstance(arr, _pa.ChunkedArray):
                arr = arr.combine_chunks()
            if arr.null_count:
                import pandas as _pd

                arr = _pa.array(
                    _pd.Series(arr.to_pandas()).astype(str), type=_pa.string()
                )
            offs, buf = _string_buffers(arr)
            n_win = np.diff(offs) - (n - 1)
            pos = n_win > 0
            if not pos.any():
                continue
            # global start index of every valid window — windows never
            # cross a line boundary by construction
            starts = np.repeat(offs[:-1][pos], n_win[pos]) + _ranges(n_win[pos])
            keys = np.zeros(len(starts), dtype=np.uint64)
            for k in range(n):
                keys = (keys << np.uint64(8)) | buf[starts + k].astype(np.uint64)
            u, c = np.unique(keys, return_counts=True)
            acc_keys.append(u)
            acc_cnts.append(c)
        if not acc_keys:
            return
        u, inv = np.unique(np.concatenate(acc_keys), return_inverse=True)
        sums = np.bincount(inv, weights=np.concatenate(acc_cnts)).astype(np.int64)
        # decode packed keys back into int32 gram arrays
        vals = np.empty((len(u), n), dtype=np.int32)
        for k in range(n):
            vals[:, n - 1 - k] = (
                (u >> np.uint64(8 * k)) & np.uint64(255)
            ).astype(np.int32)
        grams = _pa.ListArray.from_arrays(
            _pa.array(
                np.arange(0, (len(u) + 1) * n, n, dtype=np.int32), type=_pa.int32()
            ),
            _pa.array(vals.reshape(-1), type=_pa.int32()),
        )
        yield _pa.RecordBatch.from_arrays(
            [grams, _pa.array(sums, type=_pa.int64())], ["gram", "_pc"]
        )

    partial = df.select(line_col).mapInArrow(fn, schema="gram array<int>, _pc long")
    out = partial.groupBy("gram").agg(F.sum("_pc").alias("n_occurrences"))
    if min_count > 1:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out


def unigram_stats(
    df: DataFrame,
    tokens_col: str = "tokens",
    by: str | None = "source",
) -> DataFrame:
    """(by?, token, n_occurrences, n_docs) — unigram frequency and
    document frequency in ONE pass: explode once, count + count_distinct
    per token (and optional grouping column). The df side rides the same
    shuffle (Spark plans count_distinct as a two-phase expand over the
    already-shuffled keys)."""
    keys = ([by] if by else []) + ["token"]
    ex = df.select(
        *([by] if by else []),
        F.col("doc_id"),
        F.explode(tokens_col).alias("token"),
    )
    return ex.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab: list[int],
    tokens_col: str = "tokens",
) -> DataFrame:
    """Append (n_invocab, n_oov): occurrence counts of in-vocabulary vs
    out-of-vocabulary tokens per row. Pure projection — the vocab rides
    the plan as a sorted array literal and membership is a binary-ish
    array_contains inside codegen; zero shuffle, zero Python.

    For BPE-scale vocabs (>~100k ids) build a broadcast join on an
    exploded (token) key instead; byte and small-subword vocabs are
    cheaper as a literal."""
    vlit = F.array(*[F.lit(int(v)) for v in sorted(set(vocab))])
    inv = F.size(
        F.filter(F.col(tokens_col), lambda t: F.array_contains(vlit, t))
    ).cast("long")
    return df.withColumn("n_invocab", inv).withColumn(
        "n_oov", (F.size(F.col(tokens_col)).cast("long") - F.col("n_invocab"))
    )


def token_entropy(
    df: DataFrame,
    tokens_col: str = "tokens",
    by: str = "source",
) -> DataFrame:
    """(by, n_tokens, entropy_bits) — Shannon entropy of the token
    distribution per group, with a DETERMINISTIC float reduction:
    H = log2(N) - (sum_t c_t*log2(c_t)) / N, where the sum folds over
    counts in ascending token order (sort_array + F.aggregate), so the
    IEEE result is identical for any partitioning or engine — a plain
    SUM() over doubles would not be.

    Counts are exact integers from one explode -> (group, token)
    partial-aggregated shuffle; the per-group fold touches <= |vocab|
    terms."""
    counts = df.select(
        F.col(by), F.explode(tokens_col).alias("_t")
    ).groupBy(by, "_t").agg(F.count(F.lit(1)).alias("_c"))
    per_group = counts.groupBy(by).agg(
        F.sort_array(F.collect_list(F.struct("_t", "_c"))).alias("_tc")
    )
    n = F.aggregate(
        "_tc", F.lit(0).cast("long"), lambda acc, s: acc + s["_c"]
    )
    s = F.aggregate(
        "_tc",
        F.lit(0.0),
        lambda acc, st: acc + st["_c"].cast("double") * F.log2(st["_c"].cast("double")),
    )
    return (
        per_group
        .withColumn("n_tokens", n)
        .withColumn("_s", s)
        .select(
            by,
            "n_tokens",
            F.round(
                F.log2(F.col("n_tokens").cast("double"))
                - F.col("_s") / F.col("n_tokens").cast("double"),
                4,
            ).alias("entropy_bits"),
        )
    )


def distribution_drift(
    df: DataFrame,
    tokens_col: str = "tokens",
    by: str = "source",
) -> DataFrame:
    """(by, n_tokens, kl_bits, js_bits) — per-group token-distribution
    drift vs the whole corpus: KL(group || corpus) and the bounded
    Jensen-Shannon divergence JS(group, corpus), both in bits.

    A mixture pipeline needs this to see WHICH source's token
    distribution is drifting from the blend it feeds the trainer (the
    distribution-shift complement of DSIR's per-document importance):
    KL ranks sources by divergence, JS bounds it in [0, 1] even when a
    source has tokens the rest of the corpus lacks.

    Determinism contract (same trick as token_entropy): all counts are
    exact longs from one explode -> (group, token) partial-aggregated
    shuffle; the float terms fold in ascending token order via
    F.aggregate, so the IEEE sum is bit-identical on any partitioning
    and reproducible in the DuckDB oracle. The missing-token side of JS
    (tokens the group never emits, where m = q/2 so the term collapses
    to q) is folded algebraically into `1.0 - sum(present q)` — the
    oracle uses the SAME regrouping, so the float path is identical.

    Scale shape: the only corpus-sized stage is the first explode ->
    partial agg (shuffle carries (group, token) cells, bounded by
    groups x vocab). The corpus-total side is a cells-sized re-agg
    broadcast back onto the cells; nothing touches Python and nothing
    collects beyond one total row.
    """
    cells = df.select(
        F.col(by), F.explode(tokens_col).alias("_t")
    ).groupBy(by, "_t").agg(F.count(F.lit(1)).alias("_c"))
    glob = cells.groupBy("_t").agg(F.sum("_c").alias("_cg"))
    # one bounded row: the corpus token total (exact long -> exact double)
    n_g = float(glob.agg(F.sum("_cg").alias("n")).collect()[0]["n"])
    per_group = (
        cells.join(F.broadcast(glob), "_t")
        .groupBy(by)
        .agg(
            F.sort_array(F.collect_list(F.struct("_t", "_c", "_cg"))).alias("_tc"),
            F.sum("_c").alias("n_tokens"),
        )
    )
    ns = F.col("n_tokens").cast("double")

    def _p(s):  # group-conditional probability of a present token
        return s["_c"].cast("double") / ns

    def _q(s):  # corpus probability of the same token
        return s["_cg"].cast("double") / F.lit(n_g)

    kl = F.aggregate(
        "_tc", F.lit(0.0), lambda a, s: a + _p(s) * F.log2(_p(s) / _q(s))
    )
    js_p = F.aggregate(
        "_tc", F.lit(0.0),
        lambda a, s: a + _p(s) * F.log2(_p(s) / ((_p(s) + _q(s)) / F.lit(2.0))),
    )
    js_q = F.aggregate(
        "_tc", F.lit(0.0),
        lambda a, s: a + _q(s) * F.log2(_q(s) / ((_p(s) + _q(s)) / F.lit(2.0))),
    )
    q_present = F.aggregate("_tc", F.lit(0.0), lambda a, s: a + _q(s))
    js = (js_p + js_q + (F.lit(1.0) - q_present)) / F.lit(2.0)
    # + 0.0 collapses IEEE -0.0 (a fold summing to -epsilon rounds to
    # -0.0, which formats differently from 0.0) — mirrored in the oracle
    return per_group.select(
        by,
        "n_tokens",
        (F.round(kl, 4) + F.lit(0.0)).alias("kl_bits"),
        (F.round(js, 4) + F.lit(0.0)).alias("js_bits"),
    )
