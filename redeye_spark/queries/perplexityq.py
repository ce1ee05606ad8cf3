"""Perplexity-filter queries (operators/perplexity.py): fit a char-
trigram LM on the English slice of `documents`, score every document's
negative log-likelihood, and gate on mean per-trigram NLL — the CCNet
quality-filter pipeline end to end, integer-exact after one quantized
log step per distinct trigram."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import perplexity

# The gate is corpus-mean-relative (scale-free): the synthetic corpus'
# absolute NLL level shifts with SF (more target text -> lower NLL), so
# any fixed nats threshold is vacuous at one SF or another. Mean-
# relative keeps/drops non-empty sets at every SF — the repo's 'oracle
# actually discriminates' convention (same fix as important_parts).


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return perplexity.trigram_counts(docs.filter(F.col("lang") == "en"))


def q_lm_trigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tri, t_cnt): the fitted LM — integer cells, shard-mergeable."""
    return _lm(spark, sf_dir)


def q_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tri, nll_q): every document's exact quantized NLL
    under the English trigram LM."""
    return perplexity.perplexity_scores(_docs(spark, sf_dir), _lm(spark, sf_dir))


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id): documents at-or-below the corpus-mean per-trigram NLL
    — exact integer cross-multiply, division-free, scale-free."""
    scores = perplexity.perplexity_scores(_docs(spark, sf_dir), _lm(spark, sf_dir))
    return perplexity.perplexity_filter(scores)


# --- DuckDB oracles: identical arithmetic, dialect-local functions ---

_LM_CTE = f"""
tris AS (
  SELECT unnest(list_transform(range(1, length(text) - 1),
                i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
  FROM documents WHERE lang = 'en'
),
lm AS (
  SELECT tri, CAST(count(*) AS BIGINT) AS t_cnt FROM tris GROUP BY 1
),
lmb AS (
  SELECT substr(tri, 1, 2) AS pre, CAST(sum(t_cnt) AS BIGINT) AS b_cnt
  FROM lm GROUP BY 1
)"""

_SCORES_CTE = f"""{_LM_CTE},
feat AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) - 1),
                i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
  FROM documents
),
cells AS (
  SELECT doc_id, tri, CAST(count(*) AS BIGINT) AS cnt FROM feat GROUP BY 1, 2
),
lp AS (
  SELECT c.doc_id, c.cnt,
         CAST(round((ln(COALESCE(l.t_cnt, 0) + 1)
                   - ln(COALESCE(b.b_cnt, 0) + {perplexity.V_VOCAB}))
                    * {perplexity.LP_QUANTIZE}) AS BIGINT) AS lp_q
  FROM cells c
  LEFT JOIN lm l USING (tri)
  LEFT JOIN lmb b ON b.pre = substr(c.tri, 1, 2)
),
agg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tri,
         CAST(-sum(cnt * lp_q) AS BIGINT) AS nll_q
  FROM lp GROUP BY 1
),
scores AS (
  SELECT d.doc_id,
         COALESCE(a.n_tri, 0) AS n_tri,
         COALESCE(a.nll_q, 0) AS nll_q
  FROM documents d LEFT JOIN agg a USING (doc_id)
)"""

SQL_LM_TRIGRAM_COUNTS = f"""
WITH {_LM_CTE}
SELECT tri, t_cnt FROM lm
"""

SQL_PERPLEXITY_SCORES = f"""
WITH {_SCORES_CTE}
SELECT doc_id, n_tri, nll_q FROM scores
"""

SQL_PERPLEXITY_FILTER = f"""
WITH {_SCORES_CTE},
evid AS (SELECT * FROM scores WHERE n_tri > 0),
tot AS (
  SELECT CAST(sum(n_tri) AS BIGINT) AS t_n,
         CAST(sum(nll_q) AS BIGINT) AS t_nll
  FROM evid
)
SELECT e.doc_id FROM evid e, tot t
WHERE e.nll_q * t.t_n <= e.n_tri * t.t_nll
"""


QUERIES = {
    "lm_trigram_counts": q_lm_trigram_counts,
    "perplexity_scores": q_perplexity_scores,
    "perplexity_filter": q_perplexity_filter,
}

ORACLES = {
    "lm_trigram_counts": SQL_LM_TRIGRAM_COUNTS,
    "perplexity_scores": SQL_PERPLEXITY_SCORES,
    "perplexity_filter": SQL_PERPLEXITY_FILTER,
}
