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
