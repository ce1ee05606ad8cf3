"""DSIR importance-weighting queries over the documents table
(operators/importance.py). Target distribution: English documents
(lang = 'en'); raw distribution: the full corpus. All three outputs
are exact integers — the one float (the per-bucket log-ratio) is
quantized onto a 1e-6 grid before any per-document arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import importance
from ._shared import _spread

# Shared SQL fragments — word split and md5 bucket EXACTLY as the Spark
# side computes them (text.words / sampling.hash_bucket).
_WB = """
w AS (
  SELECT doc_id, lang = 'en' AS tgt,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
wb AS (
  SELECT doc_id, tgt,
         (strpos('0123456789abcdef', substr(md5('dsir42:' || word), 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5('dsir42:' || word), 2, 1)) - 1) AS bucket
  FROM w
),
ratios AS (
  SELECT bucket,
         CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
         CAST(count(*) AS BIGINT) AS n_raw
  FROM wb GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_target) AS BIGINT) AS t_tot,
         CAST(sum(n_raw) AS BIGINT) AS r_tot
  FROM ratios
),
lr AS (
  SELECT bucket,
         CAST(round((ln((n_target + 1) / (t_tot + 256.0))
                   - ln((n_raw + 1) / (r_tot + 256.0))) * 1000000) AS BIGINT) AS lr_q
  FROM ratios, tot
),
feat AS (
  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt FROM wb GROUP BY 1, 2
),
scores AS (
  SELECT f.doc_id, CAST(sum(f.cnt * l.lr_q) AS BIGINT) AS score_q
  FROM feat f JOIN lr l USING (bucket) GROUP BY 1
)
"""


def _target() -> F.Column:
    return F.col("lang") == "en"


def q_dsir_bucket_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level hashed-unigram distribution cells (bucket,
    n_target, n_raw): the fit artifact of DSIR — integer, mergeable
    across shards, computed in one explode -> partial-agg pass."""
    # _spread: the 1-row-group documents scan is unsplittable; without
    # the exchange the word explode + partial aggregation run on one
    # core. Hash-bucket counts are partitioning-invariant.
    docs = _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return importance.bucket_ratios(docs, _target()).select(
        "bucket", "n_target", "n_raw"
    )


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance scores on the 1e-6 grid — exact
    int64 dot product of hashed counts with the quantized log-ratio
    table (broadcast, 256 rows)."""
    # _spread: the 1-row-group documents scan is unsplittable; without
    # the exchange the word explode + partial aggregation run on one
    # core. Hash-bucket counts are partitioning-invariant.
    docs = _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return importance.dsir_scores(docs, _target())


def q_dsir_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance resampling (greedy top-100, id
    tiebreak) — plans as TakeOrderedAndProject."""
    # _spread: the 1-row-group documents scan is unsplittable; without
    # the exchange the word explode + partial aggregation run on one
    # core. Hash-bucket counts are partitioning-invariant.
    docs = _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return importance.dsir_top_docs(docs, _target(), n=100)


SQL_DSIR_BUCKET_RATIOS = f"""
WITH {_WB}
SELECT bucket, n_target, n_raw FROM ratios
"""

SQL_DSIR_SCORES = f"""
WITH {_WB}
SELECT doc_id, score_q FROM scores
"""

SQL_DSIR_TOP_DOCS = f"""
WITH {_WB}
SELECT doc_id, score_q FROM scores
ORDER BY score_q DESC, doc_id LIMIT 100
"""


QUERIES = {
    "dsir_bucket_ratios": q_dsir_bucket_ratios,
    "dsir_scores": q_dsir_scores,
    "dsir_top_docs": q_dsir_top_docs,
}

ORACLES = {
    "dsir_bucket_ratios": SQL_DSIR_BUCKET_RATIOS,
    "dsir_scores": SQL_DSIR_SCORES,
    "dsir_top_docs": SQL_DSIR_TOP_DOCS,
}
