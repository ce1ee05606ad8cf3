"""Token-array statistics queries — the `tokens:array<int32>` payload
axis (BASELINE.json input_hint) analyzed BEFORE any detokenize/parse:
n-gram frequencies, per-source unigram/document-frequency stats, and
vocabulary coverage. All pure-JVM plans (higher-order array functions
inside codegen; the explode feeds a same-stage partial aggregate, so
the shuffle carries distinct gram keys, not the token stream).

Oracles rebuild the same statistics character-wise in DuckDB from the
deterministically derived log lines (the corpus is ASCII by
construction, so ord(char) == token byte exactly)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..operators import tokenize_op
from ._shared import _frags, _spark_lines, _utc


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (doc_id, tokens, n_tok, source): the pipeline's input
    shape, derived deterministically (tokens = UTF-8 bytes of the
    line; the corpus is ASCII so ord() mirrors it in the oracle)."""
    return tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir))


def _duck_lines() -> str:
    """DuckDB CTE producing (doc_id, source, line) — same derivation as
    _spark_lines, shared across the token oracles."""
    f = _frags("duck")
    return f"""
lines AS (
  SELECT {f['doc_id']} AS doc_id, event_type AS source, {f['line']} AS line
  FROM events
)"""


def q_token_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token-bigram frequencies (count >= 200): the
    explode -> partial-HashAggregate collapses map-side (distinct
    bigrams number in the low thousands vs millions of gram
    occurrences), so the shuffle is key-cardinality-sized at any sf."""
    from ..operators import ngrams

    _utc(spark)
    out = ngrams.ngram_counts(_raw(spark, sf_dir), n=2, min_count=200)
    return out.select(
        F.element_at("gram", 1).cast("long").alias("t1"),
        F.element_at("gram", 2).cast("long").alias("t2"),
        "n_occurrences",
    )


SQL_TOKEN_BIGRAMS = f"""
WITH {_duck_lines()},
grams AS (
  SELECT unnest(list_transform(range(length(line) - 1),
                i -> [ord(line[i+1]), ord(line[i+2])])) AS g
  FROM lines WHERE length(line) >= 2
)
SELECT CAST(g[1] AS BIGINT) AS t1, CAST(g[2] AS BIGINT) AS t2,
       count(*) AS n_occurrences
FROM grams GROUP BY 1, 2 HAVING count(*) >= 200
"""


def q_unigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, token) occurrence count AND document frequency in
    one aggregation pass (count_distinct rides the same shuffle)."""
    from ..operators import ngrams

    _utc(spark)
    return ngrams.unigram_stats(_raw(spark, sf_dir), by="source").select(
        "source", F.col("token").cast("long").alias("token"),
        "n_occurrences", "n_docs",
    )


SQL_UNIGRAM_STATS = f"""
WITH {_duck_lines()},
toks AS (
  SELECT doc_id, source,
         unnest(list_transform(range(length(line)), i -> ord(line[i+1]))) AS token
  FROM lines
)
SELECT source, CAST(token AS BIGINT) AS token,
       count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM toks GROUP BY 1, 2
"""


# Fixed byte vocabulary for the coverage query: lowercase + digits +
# the log-line punctuation. Uppercase bytes, '"', and most symbols are
# OOV, so coverage genuinely varies per line.
_VOCAB_STR = "abcdefghijklmnopqrstuvwxyz0123456789 ./-:[]"
_VOCAB = sorted(set(ord(c) for c in _VOCAB_STR))


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document in-vocabulary vs OOV token occurrence counts
    against a fixed byte vocabulary — zero-shuffle projection (vocab
    rides the plan as an array literal)."""
    from ..operators import ngrams

    _utc(spark)
    return ngrams.vocab_coverage(_raw(spark, sf_dir), _VOCAB).select(
        "doc_id", "n_invocab", "n_oov"
    )


SQL_VOCAB_COVERAGE = f"""
WITH {_duck_lines()},
t AS (
  SELECT doc_id,
         list_transform(range(length(line)), i -> ord(line[i+1])) AS toks
  FROM lines
)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> list_contains({_VOCAB}, x))) AS BIGINT) AS n_invocab,
       CAST(len(toks) - len(list_filter(toks, x -> list_contains({_VOCAB}, x))) AS BIGINT) AS n_oov
FROM t
"""


QUERIES = {
    "token_bigrams": q_token_bigrams,
    "unigram_stats": q_unigram_stats,
    "vocab_coverage": q_vocab_coverage,
}

ORACLES = {
    "token_bigrams": SQL_TOKEN_BIGRAMS,
    "unigram_stats": SQL_UNIGRAM_STATS,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
}
