"""LLM-training-data pipeline queries: text quality, language ID,
sampling/splits/mixing, TF-IDF, sequence packing/chunking, PII
redaction, epoch shuffle, curation capstone."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..functions.logparse import FORMAT_COMMON  # noqa: F401
from ..operators import enrich as enrich_op  # noqa: F401
from ..operators import parse_op, route as route_op, tokenize_op  # noqa: F401
from ..operators import aggregate as agg_op  # noqa: F401
from ._shared import (  # noqa: F401
    _OFFS, _STATUS, _frags, _oracle_base, _parsed, _spark_lines, _spread,
    _utc, _PARSE_COLS,
)



def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.quality_metrics(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "avg_word_len", "punct_ratio", "dup_word_ratio",
    )


SQL_TEXT_QUALITY = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
       CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
            THEN round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(ws), 4) END AS avg_word_len,
       CASE WHEN length(text) > 0
            THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4) END AS punct_ratio,
       CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
            THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4) END AS dup_word_ratio
FROM w
"""


def q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        text_op.token_count(F.col("text")).cast("long").alias("n_words"),
        text_op.subword_estimate(F.col("text")).cast("long").alias("n_subwords"),
    )


SQL_SUBWORD_TOKENS = r"""
WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
       CAST(list_aggregate(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS INT)), 'sum') AS BIGINT) AS n_subwords
FROM w
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.lang_id(docs).groupBy("lang_guess").agg(F.count(F.lit(1)).alias("n"))


def _stop_sql(lang: str) -> str:
    from ..operators.text import STOPWORDS

    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect(ws, [{words}]))"


SQL_LANG_ID = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents
),
h AS (
  SELECT doc_id, {_stop_sql('en')} AS h_en, {_stop_sql('es')} AS h_es,
         {_stop_sql('fr')} AS h_fr, {_stop_sql('de')} AS h_de
  FROM w
)
SELECT CASE WHEN greatest(h_en, h_es, h_fr, h_de) = 0 THEN 'und'
            WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
            WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
            WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
            ELSE 'de' END AS lang_guess,
       COUNT(*) AS n
FROM h GROUP BY 1
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation quality score (monotone blend of the rounded
    metrics) — the formula is replicated verbatim in SQL, so the driver
    hash-checks the full scoring path, not just the raw metrics."""
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.quality_score(docs).select("doc_id", "quality")


SQL_QUALITY_SCORE = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
m AS (
  SELECT doc_id,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
    CASE WHEN length(text) > 0
         THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4)
         ELSE NULL END AS punct_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round(len(list_intersect(list_transform(string_split_regex(trim(lower(text)), '\s+'), x -> trim(x)),
              ['the','and','of','to','in','is','that','for','with','was'])) * 1.0 / len(ws), 4)
         ELSE NULL END AS stopword_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4)
         ELSE NULL END AS dup_word_ratio
  FROM w
)
SELECT doc_id,
  round(
    least(n_words / 20.0, 1.0) * 0.4
    + (1 - least(coalesce(punct_ratio, 0.0) * 4, 1.0)) * 0.2
    + least(coalesce(stopword_ratio, 0.0) * 5, 1.0) * 0.2
    + (1 - least(coalesce(dup_word_ratio, 0.0) * 2, 1.0)) * 0.2,
  4) AS quality
FROM m
"""





# ---------------------------------------------------------------------------
# Sessionization + sequence-length stats (window fns / training-data prep)
# ---------------------------------------------------------------------------

def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the tokenized corpus (training-data
    length stats; n_tok == line byte length for ASCII lines)."""
    from ..operators import sequences as seq_op

    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir))
    return seq_op.length_histogram(raw, bucket=16)


SQL_LENGTH_HISTOGRAM = f"""
WITH {_oracle_base()}
SELECT CAST(floor(length(line) / 16) * 16 AS BIGINT) AS len_bucket,
       COUNT(*) AS n,
       CAST(SUM(length(line)) AS BIGINT) AS total_tok
FROM base GROUP BY 1
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing, checked through its partition-order-free
    INVARIANTS (pack boundaries legitimately depend on partition-local
    arrival order, so pack rows themselves can't be oracled):
      * token conservation — sum(n_tok) minus the one separator per
        extra doc equals the input token count exactly;
      * doc conservation — sum(n_docs) equals the input row count;
      * budget — no multi-doc pack exceeds max_tokens (single oversized
        docs are allowed through un-truncated by design).
    All three are DuckDB-expressible over the input (tokens are line
    bytes), so this runs the real packing operator end to end under a
    full value-hash check."""
    from ..operators import sequences as seq_op

    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir)).coalesce(4)
    packed = seq_op.pack_sequences(raw, max_tokens=2048)
    return packed.agg(
        F.sum(F.col("n_tok") - (F.col("n_docs") - 1)).cast("long").alias("total_tok_net"),
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.count(
            F.when((F.col("n_docs") > 1) & (F.col("n_tok") > 2048), 1)
        ).alias("oversize_multi"),
    )


SQL_PACK_SEQUENCES = f"""
WITH {_oracle_base()}
SELECT CAST(SUM(length(line)) AS BIGINT) AS total_tok_net,
       CAST(COUNT(*) AS BIGINT) AS total_docs,
       CAST(0 AS BIGINT) AS oversize_multi
FROM base
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the derived log corpus: every line carries an
    IPv4 (the remote host) and an appended synthetic email, so both
    placeholder substitutions are exercised; chained regexp_replace runs
    at scan speed. Patterns are Java-regex/RE2-common so the DuckDB
    oracle replays them verbatim."""
    from ..operators import text as text_op

    lines = _spread(spark, _spark_lines(spark, sf_dir).select(
        "doc_id",
        F.concat(F.col("line"), F.lit(" "), F.col("doc_id"), F.lit("@example.net")).alias("text"),
    ))
    return text_op.redact_pii(lines).select("doc_id", "text_redacted")


SQL_REDACT_PII = f"""
WITH {_oracle_base()}
SELECT doc_id,
       regexp_replace(
         regexp_replace(line || ' ' || doc_id || '@example.net',
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<email>', 'g'),
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<ipv4>', 'g'
       ) AS text_redacted
FROM expected
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: md5-keyed global order
    (range-partitioned sort at scale); the first 25 keys are checked —
    both engines compute the identical md5 permutation."""
    from ..operators import sequences as seq_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        seq_op.epoch_shuffle(docs, epoch=1)
        .select("doc_id", "shuffle_key")
        .limit(25)
    )


SQL_EPOCH_SHUFFLE = """
SELECT doc_id, md5('e1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
ORDER BY shuffle_key LIMIT 25
"""


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: assignment is a pure
    function of (seed, doc_id) via shared-rule md5 buckets — stable
    across runs, retries, cluster sizes, and input order, unlike
    rand()-based randomSplit. The oracle rebuilds every assignment from
    the same md5 hex digits."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.train_val_test_split(docs).select("doc_id", "split")


SQL_TRAIN_VAL_SPLIT = """
WITH b AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix assembly (sampling.mix_corpora): the
    documents table split into two pseudo-corpora by doc_id parity,
    mixed at 75% / 25% — each corpus's membership cut is an independent
    md5 bucket keyed by (corpus name, id), so the oracle rebuilds every
    draw from the same hex digits."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    web = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    code = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source")
    mixed = sampling.mix_corpora(
        [(web, "web", 0.75), (code, "code", 0.25)], id_col="doc_id"
    )
    return mixed.select("doc_id", "source", "corpus")


def _mix_bucket_sql(name: str) -> str:
    k = f"'mix42:' || '{name}|' || CAST(doc_id AS VARCHAR)"
    return (
        f"(strpos('0123456789abcdef', substr(md5({k}), 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(md5({k}), 2, 1)) - 1)"
    )


SQL_CORPUS_MIX = f"""
SELECT doc_id, source, 'web' AS corpus
FROM documents WHERE doc_id % 2 = 0 AND {_mix_bucket_sql('web')} < 192
UNION ALL
SELECT doc_id, source, 'code' AS corpus
FROM documents WHERE doc_id % 2 = 1 AND {_mix_bucket_sql('code')} < 64
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source 20% sample (bucket keyed by
    (source, doc_id), so draws are independent across strata but stable
    under retries — the property sampleBy()'s Bernoulli draw lacks)."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.stratified_sample(docs, fraction=0.2).select("doc_id", "source")


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, source
FROM documents
WHERE (strpos('0123456789abcdef', substr(md5('strat42:' || source || '|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
    + (strpos('0123456789abcdef', substr(md5('strat42:' || source || '|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 51
"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, ties broken by
    term so the cut is total-ordered). Scores are rounded BEFORE the
    rank window in both engines, so ordering can never diverge on float
    noise."""
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.top_tfidf_terms(docs, k=3)


SQL_TFIDF_TERMS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq USING (term), n
),
ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3
"""




def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document's whitespace tokens split
    into 64-token blocks with stride 48 (16-token overlap) — the
    fixed-length training-block transform. Pure codegen
    (explode(sequence) + slice, operators/sequences.py::chunk_tokens):
    no shuffle, no Python; amplification equals output size."""
    from ..operators import sequences
    from ..operators.text import ws_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", ws_tokens("text").alias("tokens")
    )
    out = sequences.chunk_tokens(docs, "tokens", block=64, stride=48)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("n_tok"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


SQL_CHUNK_TOKENS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS ws
  FROM documents
),
sized AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0)
SELECT doc_id,
       i AS chunk_idx,
       len(ws[i*48+1 : least(i*48+64, n)]) AS n_tok,
       array_to_string(ws[i*48+1 : least(i*48+64, n)], ' ') AS chunk_text
FROM sized,
     UNNEST(generate_series(0, CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS t(i)
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation capstone — the composition a training-data
    pipeline actually runs, all existing operators chained: quality
    scoring (codegen formula) -> threshold filter -> exact dedup
    (keep-lowest-id semi join) -> deterministic md5 split -> per-split
    stats. Aggregates stay integer (doc counts, word counts, quality in
    basis points: the score is rounded to 4dp, so x10000 is integral)
    so no float accumulation order can flap the hash."""
    from ..operators import dedup as dedup_op
    from ..operators import sampling
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = text_op.quality_score(docs)
    kept = scored.filter(F.col("quality") >= 0.5)
    # window-based dedup filter: ONE scan of the scored frame — the
    # aggregate + self-semi-join formulation re-executes the regex
    # quality metrics on both join branches
    deduped = dedup_op.exact_dedup_filter(kept)
    split_df = sampling.train_val_test_split(deduped)
    return split_df.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("long")).alias("total_words"),
        F.sum(F.round(F.col("quality") * 10000).cast("long")).alias("quality_bp"),
    )


SQL_CURATION_PIPELINE = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
m AS (
  SELECT doc_id, text,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
    CASE WHEN length(text) > 0
         THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4)
         ELSE NULL END AS punct_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round(len(list_intersect(list_transform(string_split_regex(trim(lower(text)), '\s+'), x -> trim(x)),
              ['the','and','of','to','in','is','that','for','with','was'])) * 1.0 / len(ws), 4)
         ELSE NULL END AS stopword_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4)
         ELSE NULL END AS dup_word_ratio
  FROM w
),
q AS (
  SELECT doc_id, text, n_words,
    round(
      least(n_words / 20.0, 1.0) * 0.4
      + (1 - least(coalesce(punct_ratio, 0.0) * 4, 1.0)) * 0.2
      + least(coalesce(stopword_ratio, 0.0) * 5, 1.0) * 0.2
      + (1 - least(coalesce(dup_word_ratio, 0.0) * 2, 1.0)) * 0.2,
    4) AS quality
  FROM m
),
kept AS (SELECT * FROM q WHERE quality >= 0.5),
keep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
dd AS (SELECT kept.* FROM kept JOIN keep USING (doc_id)),
sp AS (
  SELECT *,
         CASE WHEN (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204
              THEN 'train'
              WHEN (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
              THEN 'val'
              ELSE 'test' END AS split
  FROM dd
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(CAST(round(quality * 10000) AS BIGINT)) AS BIGINT) AS quality_bp
FROM sp GROUP BY split
"""


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style quality rule): per-doc
    word-bigram count and duplicate-bigram ratio — all higher-order JVM
    expressions (transform/sequence/array_distinct), zero Python, zero
    shuffle. Oracle rebuilds the bigram list with DuckDB list functions
    over the SAME whitespace tokenization."""
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.repetition_metrics(docs).select(
        "doc_id", "n_bigrams", "dup_bigram_ratio"
    )


SQL_REPETITION_METRICS = r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents
),
b AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
              ELSE list_transform(generate_series(1, len(ws) - 1),
                                  i -> ws[i] || ' ' || ws[i + 1]) END AS bg
  FROM w
)
SELECT doc_id,
       CAST(len(bg) AS BIGINT) AS n_bigrams,
       CASE WHEN len(bg) > 0
            THEN round((len(bg) - len(list_distinct(bg))) * 1.0 / len(bg), 4)
            END AS dup_bigram_ratio
FROM b
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change detection between two table versions (the incremental-
    refresh / CDC-validation primitive): NEW is a deterministic mutation
    of orders — keys %13==0 deleted, %7==0 repriced, %11==0 re-inserted
    under shifted keys — so DuckDB states the expected change set from
    the same arithmetic. The operator shuffles only (key, hash) digests,
    never whole rows."""
    from ..operators.diff import snapshot_diff

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = orders.filter("pmod(o_orderkey, 13) != 0").selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "CASE WHEN pmod(o_orderkey, 7) = 0 THEN o_totalprice + 1 "
        "ELSE o_totalprice END AS o_totalprice",
    ).unionByName(
        orders.filter("pmod(o_orderkey, 11) = 0").selectExpr(
            "o_orderkey + 1000000000 AS o_orderkey", "o_orderstatus",
            "o_totalprice",
        )
    )
    # check_unique=False: keys are unique by construction, and the probe
    # would make this registry entry eager (plan-gate stays lazy)
    return snapshot_diff(old, new, ["o_orderkey"], check_unique=False)


SQL_SNAPSHOT_DIFF = """
SELECT o_orderkey, 'delete' AS change FROM orders WHERE o_orderkey % 13 = 0
UNION ALL
SELECT o_orderkey, 'update' FROM orders
WHERE o_orderkey % 13 != 0 AND o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey + 1000000000, 'insert' FROM orders WHERE o_orderkey % 11 = 0
"""


QUERIES = {
    "text_quality": q_text_quality,
    "subword_tokens": q_subword_tokens,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "length_histogram": q_length_histogram,
    "pack_sequences": q_pack_sequences,
    "redact_pii": q_redact_pii,
    "epoch_shuffle": q_epoch_shuffle,
    "train_val_split": q_train_val_split,
    "corpus_mix": q_corpus_mix,
    "stratified_sample": q_stratified_sample,
    "tfidf_terms": q_tfidf_terms,
    "chunk_tokens": q_chunk_tokens,
    "curation_pipeline": q_curation_pipeline,
    "repetition_metrics": q_repetition_metrics,
    "snapshot_diff": q_snapshot_diff,
}

ORACLES = {
    "text_quality": SQL_TEXT_QUALITY,
    "subword_tokens": SQL_SUBWORD_TOKENS,
    "lang_id": SQL_LANG_ID,
    "quality_score": SQL_QUALITY_SCORE,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "redact_pii": SQL_REDACT_PII,
    "epoch_shuffle": SQL_EPOCH_SHUFFLE,
    "train_val_split": SQL_TRAIN_VAL_SPLIT,
    "corpus_mix": SQL_CORPUS_MIX,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "chunk_tokens": SQL_CHUNK_TOKENS,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "repetition_metrics": SQL_REPETITION_METRICS,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
}
