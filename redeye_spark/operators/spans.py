"""Span-level (line/paragraph) exact deduplication across a corpus.

The document-level dedup family (operators/dedup.py) removes whole
near-identical documents; web-scale training corpora ALSO need
sub-document dedup — boilerplate lines, repeated navigation text, and
quoted passages that recur across millions of otherwise-distinct pages
(the "line dedup" pass in C4/Dolma-style pipelines). This operator
keeps the globally FIRST occurrence of every span (ordered by
(doc_id, span index)) and rewrites each document without its
later-occurring spans; documents whose every span was seen before
disappear entirely.

Corpus documents here are single-line word streams, so the span unit is
a fixed run of `span_words` whitespace words rather than a newline
split — the machinery (segmentize -> global first-occurrence ->
ordered reassembly) is identical for any separator.

Scale shape (the reason this is not a window query): the natural
row_number() OVER (PARTITION BY span) = 1 plan serializes each span's
occurrence list onto one task — a degenerate span repeated in half the
corpus becomes one multi-billion-row partition. Instead the keeper per
span is min(struct(doc_id, idx)) — a partial-aggregatable min that
map-side-combines before the shuffle — and a join back on the span
marks survivors, so the hottest span costs one 16-byte struct per map
partition. All three shuffles (keeper agg, mark join, reassembly) hash
on keys the previous stage already produced; nothing touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def segmentize(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 5,
) -> DataFrame:
    """Explode text into (id, seg_idx, seg) rows of `span_words`-word
    spans (last span may be shorter). Pure JVM: split + sequence +
    slice + posexplode."""
    words = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.size(words) / F.lit(float(span_words))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(words, i * span_words + 1, span_words)),
    )
    return df.select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    )


def span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 5,
) -> DataFrame:
    """Corpus-wide exact span dedup, first occurrence wins.

    Returns (id_col, clean_text, n_kept, n_dropped) for every document
    that retains at least one span. `clean_text` is the surviving spans
    re-joined in original order.
    """
    segs = segmentize(df, text_col, id_col, span_words)
    keepers = segs.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("_keeper")
    )
    marked = segs.join(keepers, "seg").withColumn(
        "_keep",
        (F.col("_keeper")[id_col] == F.col(id_col))
        & (F.col("_keeper.seg_idx") == F.col("seg_idx")),
    )
    kept_struct = F.when(
        F.col("_keep"), F.struct(F.col("seg_idx"), F.col("seg"))
    )  # collect_list skips the NULLs for dropped spans
    return (
        marked.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(kept_struct)).alias("_kept"),
            F.sum(F.col("_keep").cast("int")).alias("n_kept"),
            F.sum((~F.col("_keep")).cast("int")).alias("n_dropped"),
        )
        .filter(F.col("n_kept") > 0)
        .select(
            id_col,
            F.concat_ws(
                " ", F.transform(F.col("_kept"), lambda s: s["seg"])
            ).alias("clean_text"),
            "n_kept",
            "n_dropped",
        )
    )


def dup_ngram_runs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Maximal cross-document duplicated word-n-gram runs — the
    sliding-window exact-substring dedup signal (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): every
    position whose n-word window also occurs in ANOTHER document is
    duplicated, and consecutive duplicated positions merge into one
    maximal run. span_dedup (above) removes TUMBLING spans; this finds
    duplication at every alignment, so a copied passage is reported as
    one run regardless of where it starts.

    Returns (id_col, run_start, n_grams, run_words): run_start is the
    0-based word index of the first duplicated window, n_grams the
    number of consecutive duplicated windows, run_words = n_grams+n-1
    the word length of the covered span.

    Scale shape: windows are keyed by a 128-bit digest (two independent
    xxhash64s), so the duplicate-detection shuffle carries 16-byte keys
    instead of n-word strings, and the distinct-doc count is a standard
    two-phase partial aggregate. The join back marks positions by
    digest (hash join on the same key the agg already shuffled on). The
    only window function partitions BY DOCUMENT (gaps-and-islands over
    that doc's duplicated positions) — per-doc-sized state, never a
    corpus-wide sort. Collision risk 2^-128-scale: acceptable for an
    exact-substring pass at any corpus size.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    from pyspark.sql import Window

    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    wins = F.filter(
        F.transform(idx, lambda i: F.slice(words, i, n)),
        lambda g: F.size(g) == n,
    )
    g = df.select(
        F.col(id_col),
        F.posexplode(F.transform(wins, lambda w: F.concat_ws(" ", w))).alias(
            "pos", "_gram"
        ),
    ).select(
        id_col,
        "pos",
        F.xxhash64("_gram").alias("_d1"),
        F.xxhash64("_gram", F.lit(1)).alias("_d2"),
    )
    dup = (
        g.groupBy("_d1", "_d2")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_d1", "_d2")
    )
    marked = g.join(dup, ["_d1", "_d2"]).select(id_col, "pos")
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy("pos")
    )
    islands = marked.withColumn("_isl", F.col("pos") - rn)
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("run_start"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            id_col,
            F.col("run_start").cast("long").alias("run_start"),
            "n_grams",
            (F.col("n_grams") + F.lit(n - 1)).alias("run_words"),
        )
    )
