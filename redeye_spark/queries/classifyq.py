"""Feature-hashed linear classifier queries (operators/classifier.py).

- hashed_classifier_scores: exact integer hashed-BoW score + decision
  per document (fastText-style inference with the hashing trick).
- classifier_source_rates: per-source acceptance rate of the decision.

Oracles replay the full hash -> bucket -> weight -> sum pipeline in
DuckDB from the same portable integer arithmetic (byte sums, Knuth
multiplier, mod-dim buckets, inline weight formula) — every comparison
that decides a row is an integer comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..operators import classifier
from ._shared import _utc

_DIM = 64


def q_hashed_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, label) over documents — explode feeds a
    same-stage partial sum, so the shuffle carries one row per doc."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = classifier.feature_hash_scores(docs, dim=_DIM)
    return out.select(
        "doc_id", "score", F.col("label").cast("long").alias("label")
    )


_DUCK_SCORES = f"""
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
b AS (
  SELECT doc_id,
    (list_reduce(
       list_prepend(CAST(0 AS BIGINT),
         list_transform(range(length(tok)), i -> CAST(ord(tok[i+1]) AS BIGINT))),
       (a, x) -> a + x) * {classifier.KNUTH} + length(tok)) % {_DIM} AS bkt
  FROM toks WHERE length(tok) > 0
),
s AS (
  SELECT doc_id, CAST(sum((bkt * 37) % 17 - 8) AS BIGINT) AS score
  FROM b GROUP BY doc_id
)"""


SQL_HASHED_CLASSIFIER_SCORES = f"""
WITH {_DUCK_SCORES}
SELECT doc_id, score,
       CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS BIGINT) AS label
FROM s
"""


def q_classifier_source_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source classifier acceptance rate — integer counts, one
    division per group in the final projection."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = classifier.feature_hash_scores(docs, dim=_DIM)
    return classifier.label_rates(scores, docs)


SQL_CLASSIFIER_SOURCE_RATES = f"""
WITH {_DUCK_SCORES}
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       round(CAST(sum(CASE WHEN s.score > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS pos_rate
FROM s JOIN documents d USING (doc_id)
GROUP BY d.source
"""


QUERIES = {
    "hashed_classifier_scores": q_hashed_classifier_scores,
    "classifier_source_rates": q_classifier_source_rates,
}

ORACLES = {
    "hashed_classifier_scores": SQL_HASHED_CLASSIFIER_SCORES,
    "classifier_source_rates": SQL_CLASSIFIER_SOURCE_RATES,
}
