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
    line; the corpus is ASCII so ord() mirrors it in the oracle).

    spread=True: the single-row-group events scan is unsplittable, so
    without the pre-tokenize exchange the line build + tokenize UDF +
    explode + partial aggregate of every token query ran in ONE task
    (5.2 s for token_bigrams at sf0.1); the exchange carries the 5
    narrow base columns and everything downstream parallelizes."""
    return tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir, spread=True))


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
    """Corpus-wide token-bigram frequencies (count >= 200), via the
    fused byte-window counter (ngrams.byte_ngram_counts): the Python
    hop that would have tokenized counts the 2-byte windows per Arrow
    batch and ships one partial count per DISTINCT gram per task, so
    both the Python boundary and the exchange are key-cardinality-sized
    at any sf — result-identical to the tokenize -> explode ->
    partial-agg path (tokens ARE the line's UTF-8 bytes)."""
    from ..operators import ngrams

    _utc(spark)
    out = ngrams.byte_ngram_counts(
        _spark_lines(spark, sf_dir, spread=True), n=2, min_count=200
    )
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



def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of the frequent token bigrams
    (count >= 200): PMI = log2(P(xy) / (P(x) P(y))) with P(xy) over
    the bigram-position universe and P(x) over the unigram universe.
    Counts and totals are exact integers (totals are two bounded
    scalars collected once); the only floating step is one
    fixed-shape ratio + log2 per output row, rounded to 4 dp, written
    with identical expression order in the oracle. The unigram side
    (<= 256 byte keys) broadcasts into both join probes."""
    from ..operators import ngrams

    _utc(spark)
    lines = _spark_lines(spark, sf_dir, spread=True)
    # n_tok == octet_length(line) (one token per UTF-8 byte), so the
    # totals never need the tokenize hop at all — a pure JVM aggregate
    tot = lines.agg(
        F.sum(F.octet_length("line")).alias("tu"),
        F.sum(F.greatest(F.octet_length("line") - 1, F.lit(0))).alias("tb"),
    ).collect()[0]
    tu, tb = float(tot["tu"]), float(tot["tb"])
    bi = ngrams.byte_ngram_counts(lines, n=2, min_count=200).select(
        F.element_at("gram", 1).cast("long").alias("t1"),
        F.element_at("gram", 2).cast("long").alias("t2"),
        F.col("n_occurrences").alias("c_xy"),
    )
    uni = ngrams.byte_ngram_counts(lines, n=1).select(
        F.element_at("gram", 1).cast("long").alias("t"),
        F.col("n_occurrences").alias("c"),
    )
    # two probes against the SAME unigram frame: re-alias each side so
    # the join conditions bind unambiguously (shared expression IDs
    # from a self-reused frame otherwise resolve to either copy)
    ux = uni.select(F.col("t").alias("tx"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("t").alias("ty"), F.col("c").alias("c_y"))
    joined = (
        bi.join(F.broadcast(ux), F.col("t1") == F.col("tx"))
        .join(F.broadcast(uy), F.col("t2") == F.col("ty"))
        .drop("tx", "ty")
    )
    pmi = F.log2(
        (F.col("c_xy").cast("double") * F.lit(tu) * F.lit(tu))
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double") * F.lit(tb))
    )
    return joined.select("t1", "t2", "c_xy", F.round(pmi, 4).alias("pmi"))


SQL_BIGRAM_PMI = f"""
WITH {_duck_lines()},
tot AS (
  SELECT CAST(sum(length(line)) AS DOUBLE) AS tu,
         CAST(sum(CASE WHEN length(line) >= 2 THEN length(line) - 1 ELSE 0 END) AS DOUBLE) AS tb
  FROM lines
),
grams AS (
  SELECT unnest(list_transform(range(length(line) - 1),
                i -> [ord(line[i+1]), ord(line[i+2])])) AS g
  FROM lines WHERE length(line) >= 2
),
bi AS (
  SELECT CAST(g[1] AS BIGINT) t1, CAST(g[2] AS BIGINT) t2, count(*) c_xy
  FROM grams GROUP BY 1, 2 HAVING count(*) >= 200
),
toks AS (
  SELECT unnest(list_transform(range(length(line)), i -> ord(line[i+1]))) AS t
  FROM lines
),
uni AS (SELECT CAST(t AS BIGINT) t, count(*) c FROM toks GROUP BY 1)
SELECT bi.t1, bi.t2, bi.c_xy,
       round(log2((CAST(bi.c_xy AS DOUBLE) * tot.tu * tot.tu)
                  / (CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE) * tot.tb)), 4) AS pmi
FROM bi
JOIN uni ux ON ux.t = bi.t1
JOIN uni uy ON uy.t = bi.t2
CROSS JOIN tot
"""



def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the byte-token distribution, with
    a deterministic float reduction: the c*log2(c) terms fold in
    ascending token order on BOTH engines, so the IEEE sum is
    bit-identical (a plain SUM() over doubles is summation-order
    nondeterministic)."""
    from ..operators import ngrams

    _utc(spark)
    return ngrams.token_entropy(_raw(spark, sf_dir), by="source").select(
        "source", "n_tokens", "entropy_bits"
    )


SQL_TOKEN_ENTROPY = f"""
WITH {_duck_lines()},
toks AS (
  SELECT source,
         unnest(list_transform(range(length(line)), i -> ord(line[i+1]))) AS t
  FROM lines
),
c AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2),
g AS (
  SELECT source,
         list(CAST(c AS DOUBLE) ORDER BY t) AS cs,
         CAST(sum(c) AS BIGINT) AS n
  FROM c GROUP BY source
)
SELECT source, n AS n_tokens,
       round(log2(CAST(n AS DOUBLE))
             - list_reduce(list_prepend(0.0, list_transform(cs, x -> x * log2(x))),
                           (a, b) -> a + b) / CAST(n AS DOUBLE), 4) AS entropy_bits
FROM g
"""


def q_zipf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency curve of the token vocabulary: top-50 tokens
    with rank and frequency ratio vs rank 1 — the standard corpus
    health plot. The unigram census is the one corpus-sized (explode ->
    partial-agg) pass; ranking windows over the CENSUS (vocab-sized,
    <= 256 byte tokens here), ties broken by token id."""
    from pyspark.sql import Window

    from ..operators import ngrams

    _utc(spark)
    counts = ngrams.byte_ngram_counts(
        _spark_lines(spark, sf_dir, spread=True), n=1
    ).select(
        F.element_at("gram", 1).cast("long").alias("token"),
        F.col("n_occurrences").alias("n"),
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    top = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 50
    )
    n1 = top.filter(F.col("rank") == 1).select(F.col("n").alias("_n1"))
    return top.crossJoin(F.broadcast(n1)).select(
        F.col("rank").cast("long").alias("rank"),
        "token",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("_n1"), 6).alias("ratio"),
    )


SQL_ZIPF_RANK = f"""
WITH {_duck_lines()},
toks AS (
  SELECT unnest(list_transform(range(length(line)), i -> ord(line[i+1]))) AS t
  FROM lines
),
c AS (SELECT t AS token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY t),
r AS (
  SELECT token, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank
  FROM c
),
top AS (SELECT * FROM r WHERE rank <= 50),
n1 AS (SELECT n AS n1 FROM top WHERE rank = 1)
SELECT CAST(rank AS BIGINT) AS rank, CAST(token AS BIGINT) AS token, n,
       round(CAST(n AS DOUBLE) / CAST(n1.n1 AS DOUBLE), 6) AS ratio
FROM top, n1
"""


QUERIES = {
    "token_bigrams": q_token_bigrams,
    "zipf_rank": q_zipf_rank,
    "unigram_stats": q_unigram_stats,
    "vocab_coverage": q_vocab_coverage,
    "bigram_pmi": q_bigram_pmi,
    "token_entropy": q_token_entropy,
}

ORACLES = {
    "token_bigrams": SQL_TOKEN_BIGRAMS,
    "zipf_rank": SQL_ZIPF_RANK,
    "unigram_stats": SQL_UNIGRAM_STATS,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "token_entropy": SQL_TOKEN_ENTROPY,
}
