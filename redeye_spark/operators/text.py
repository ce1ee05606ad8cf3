"""Text-analysis operators for training-data curation, all expressed as
JVM-side Spark SQL expressions (whole-stage codegen — no Python in the
hot path; these run at scan speed at 100 TB).

  * token_count      — whitespace + BPE-ish subword estimate
  * quality metrics  — length / punctuation / stopword / repetition
  * language ID      — stopword-hit heuristic over small wordlists
  * fingerprint      — order-sensitive 64-bit rolling document hash
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "des"],
}


def ws_tokens(text: str | Column) -> Column:
    """Canonical whitespace tokenizer shared by simhash, word-n-grams,
    decontamination, and TF-IDF: split on \\s+, drop empty tokens (which
    \\s+ leaves at whitespace edges), NULL-safe (NULL text -> zero tokens,
    never a NULL array — size()/explode() on a NULL array silently drop
    rows, which is how NULL-text docs once vanished from simhash)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.coalesce(c, F.lit("")), r"\s+"), lambda t: t != F.lit("")
    )


def words(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count; empty string -> 0."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(words(col)))


def subword_estimate(col: Column) -> Column:
    """BPE-ish token estimate: word-pieces of <=4 chars (ceil(len/4) per
    word), the standard chars/4 heuristic but per-word."""
    return F.aggregate(
        words(col),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("int"),
    )


def _stopword_hits(col: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.transform(words(F.lower(col)), F.trim), arr))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append curation metrics (all codegen expressions)."""
    c = F.col(text_col)
    n_words = token_count(c)
    return (
        df.withColumn("n_chars_m", F.length(c))
        .withColumn("n_words", n_words)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, F.round(F.length(F.regexp_replace(c, r"\s+", "")) / n_words, 4)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                F.length(c) > 0,
                F.round(
                    (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) / F.length(c), 4
                ),
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, F.round(_stopword_hits(c, "en") / n_words, 4)),
        )
        .withColumn(
            "dup_word_ratio",
            F.when(
                n_words > 0,
                F.round((n_words - F.size(F.array_distinct(words(c)))) / n_words, 4),
            ),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score from the metrics (simple monotone
    blend; weights are curation policy, not ground truth)."""
    m = quality_metrics(df, text_col)
    score = (
        F.least(F.col("n_words") / 20.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.coalesce(F.col("punct_ratio"), F.lit(0.0)) * 4, F.lit(1.0))) * 0.2
        + F.least(F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) * 5, F.lit(1.0)) * 0.2
        + (1 - F.least(F.coalesce(F.col("dup_word_ratio"), F.lit(0.0)) * 2, F.lit(1.0))) * 0.2
    )
    return m.withColumn("quality", F.round(score, 4))


def lang_scores(col: Column) -> list[Column]:
    return [_stopword_hits(col, lang).alias(f"hits_{lang}") for lang in STOPWORDS]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword hits, 'und' when no
    list scores > 0. Ties break by fixed language order (en,es,fr,de)."""
    c = F.col(text_col)
    hits = [(lang, _stopword_hits(c, lang)) for lang in STOPWORDS]
    best = F.greatest(*[h for _, h in hits])
    guess = F.lit("und")
    for lang, h in reversed(hits):  # reversed => earlier langs win ties
        guess = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return df.withColumn("lang_guess", guess)


# Conservative patterns that mean the same thing in Java regex (Spark)
# and RE2 (DuckDB): plain character classes + \b, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "text_redacted") -> DataFrame:
    """Scrub common PII shapes (emails, IPv4s) with typed placeholders —
    the standard pre-training curation pass. Pure chained regexp_replace:
    whole-stage codegen, scan speed at 100 TB."""
    c = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{name}>")
    return df.withColumn(out_col, c)


def fingerprint(col: Column) -> Column:
    """Order-sensitive 64-bit document fingerprint: xxhash of each word
    chained with its position (aggregate fold — rolling-hash analog that
    codegen executes without Python)."""
    normalized = F.transform(words(F.lower(col)), F.trim)
    return F.aggregate(
        normalized,
        F.lit(0).cast("long"),
        lambda acc, w: F.xxhash64(acc, w),
    )


def document_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))


def top_tfidf_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF (id, term, score,
    rank): tf = in-doc occurrences (lowercased whitespace tokens),
    idf = ln((N+1)/(df+1)) + 1, ties broken by term asc so the cut is
    total-ordered and reproducible.

    Scale shape: one explode -> two hash aggregates (tf keyed by
    (doc, term), df keyed by term — both partial-aggregated map-side) ->
    idf joined back on term (dimension-sized: the vocabulary, which AQE
    broadcasts) -> per-doc top-k window. The window partitions by doc
    id, so no single reducer sees more than one doc's terms."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(doc_freq, on="term").withColumn(
        "score",
        F.round(
            F.col("tf") * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def normalize_text(col: Column) -> Column:
    """Canonical dedup-normalization: lowercase, strip everything except
    word chars and whitespace, collapse whitespace runs, trim. The
    standard pre-pass before exact/near dedup so trivially-reformatted
    copies (case, punctuation, spacing) collapse to one key. Pure
    codegen expressions — replicated verbatim by the DuckDB oracle, and
    runs at scan speed at any corpus size."""
    c = F.lower(F.coalesce(col, F.lit("")))
    c = F.regexp_replace(c, r"[^\w\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition signals (the Gopher-style quality rule:
    heavily self-repeating documents are low-value training data):
    per-doc word-bigram count and the fraction of DUPLICATE bigrams
    (1 - distinct/total). All higher-order JVM expressions — transform
    over a sequence builds the bigram array, array_distinct measures
    repetition; zero Python, zero shuffle, scan-speed at 100 TB."""
    ws = ws_tokens(text_col)
    n = F.size(ws)
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)),
    )).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams)
    dup_ratio = F.when(
        nb > 0, F.round((nb - F.size(F.array_distinct(bigrams))) / nb, 4)
    ).otherwise(F.lit(None).cast("double"))
    return df.select(
        "*",
        nb.cast("long").alias("n_bigrams"),
        dup_ratio.alias("dup_bigram_ratio"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) — top-k documents by Okapi BM25 against a bag of
    query terms (lowercase whole-word match over \\s+ tokens).

    Two jobs: (1) ONE corpus pass computes N, avgdl, and every term's
    document frequency as a single row of conditional aggregates
    (collected — it is one bounded row, len(query_terms) ints); (2) the
    per-document score is then a pure codegen projection — idf and
    avgdl are folded in as literals, tf comes from size(filter(words))
    per term — feeding TakeOrderedAndProject for the top-k. No join, no
    shuffle beyond the final k-row merge, and the expensive pass is
    partial-aggregated map-side.

    Scoring uses the standard smoothed idf
    ln((N - df + 0.5) / (df + 0.5) + 1) — nonnegative for any df — and
    deterministic doc_id tie-breaks. Terms are matched exactly
    (case-folded); stemming/analysis belongs upstream."""
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = [t.lower() for t in query_terms]
    ws = ws_tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), ws.alias("_ws")).withColumn(
        "_dl", F.size("_ws")
    )
    # pass 1: corpus stats (one row)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_dl").alias("total_len"),
        *[
            F.sum(
                F.when(F.array_contains("_ws", t), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n_docs = stats["n_docs"]
    if n_docs == 0:
        return df.sparkSession.createDataFrame([], f"{id_col} string, score double")
    import math

    # idf/avgdl enter the scoring expression as double LITERALS on both
    # engines (here and in the DuckDB oracle). Rounding them to 9
    # decimals first makes the constants bit-identical across libm
    # implementations — an unrounded ln() can differ in the last ulp on
    # another platform and flip round(score, 4) or a top-k boundary.
    avgdl = round(stats["total_len"] / n_docs, 9)
    idf = [
        round(
            math.log(
                (n_docs - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5) + 1.0
            ),
            9,
        )
        for i in range(len(terms))
    ]
    # pass 2: score as a fixed-order sum of per-term contributions so
    # the IEEE sequence is reproducible by any engine writing the same
    # expression shape
    def _eq_term(term):
        # one-arg closure ON PURPOSE: a `lambda w, t=t:` default would
        # make the lambda 2-ary and F.filter would feed the array INDEX
        # into the second slot
        return lambda w: w == F.lit(term)

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.size(F.filter("_ws", _eq_term(t))).cast("double")
        contrib = F.lit(idf[i]) * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * (F.col("_dl").cast("double") / F.lit(avgdl))))
        )
        score = score + contrib
    return (
        base.select(F.col(id_col), score.alias("_score"))
        .filter(F.col("_score") > 0.0)
        .orderBy(F.desc("_score"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_score", 4).alias("score"))
    )
