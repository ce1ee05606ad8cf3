"""Budgeted data-selection query (operators/budget.py).

token_budget_select: rank documents by the hashed-classifier quality
score and keep them, best first, until 40% of the corpus token mass is
spent — the "data selection under a token budget" step that turns a
scored corpus into a training set. The oracle replays the selection
with a plain SQL window running total over the same (score desc,
doc_id) order; the Spark plan never runs a global single-partition
window (distributed prefix sum, see the operator docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..operators import budget as budget_op
from ..operators import classifier
from ._shared import _utc
from .classifyq import _DIM, _DUCK_SCORES


def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, n_tokens, cum_weight) — greedy quality-ordered
    selection under an integer token budget of 2/5 of the corpus.
    The budget constant is one bounded 1-row aggregate; selection is
    the bucketed prefix-sum plan (no corpus-wide window)."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    scored = classifier.feature_hash_scores(docs, dim=_DIM).select(
        "doc_id", "score"
    )
    frame = scored.join(toks, "doc_id")
    total = int(frame.agg(F.sum("n_tokens")).first()[0])
    b = (2 * total) // 5
    return budget_op.select_until_budget(
        frame, budget=b, weight_col="n_tokens", order_col="score",
        descending=True, bucket_width=4,
    )


SQL_TOKEN_BUDGET_SELECT = f"""
WITH {_DUCK_SCORES},
w AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
j AS (SELECT s.doc_id, s.score, w.n_tokens FROM s JOIN w USING (doc_id)),
t AS (SELECT (2 * CAST(sum(n_tokens) AS BIGINT)) // 5 AS b FROM j),
c AS (
  SELECT doc_id, score, n_tokens,
         CAST(sum(n_tokens) OVER (
           ORDER BY score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_weight
  FROM j
)
SELECT doc_id, score, n_tokens, cum_weight FROM c, t WHERE cum_weight <= t.b
"""


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile curriculum tiers over the classifier score with token
    mass per tier — exact integer rank boundaries (cum*den >= num*N),
    census-sized boundary pass, boundaries broadcast over the rows."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = classifier.feature_hash_scores(docs, dim=_DIM).select(
        "doc_id", "score"
    )
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    frame = scored.join(toks, "doc_id")
    return budget_op.quantile_buckets(frame, "score", "n_tokens")


SQL_CURRICULUM_BUCKETS = f"""
WITH {_DUCK_SCORES},
w AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
j AS (SELECT s.doc_id, s.score, w.n_tokens FROM s JOIN w USING (doc_id)),
cen AS (SELECT score AS sc, count(*) AS n FROM j GROUP BY score),
cum AS (
  SELECT sc,
         sum(n) OVER (ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS c
  FROM cen
),
tot AS (SELECT count(*) AS N FROM j),
bnd AS (
  SELECT min(CASE WHEN c * 4 >= 1 * N THEN sc END) AS b0,
         min(CASE WHEN c * 2 >= 1 * N THEN sc END) AS b1,
         min(CASE WHEN c * 4 >= 3 * N THEN sc END) AS b2
  FROM cum, tot
),
tg AS (
  SELECT j.score, j.n_tokens,
         CASE WHEN j.score <= bnd.b0 THEN 0
              WHEN j.score <= bnd.b1 THEN 1
              WHEN j.score <= bnd.b2 THEN 2
              ELSE 3 END AS bucket
  FROM j, bnd
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_weight,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score
FROM tg GROUP BY bucket
"""


QUERIES = {
    "token_budget_select": q_token_budget_select,
    "curriculum_buckets": q_curriculum_buckets,
}

ORACLES = {
    "token_budget_select": SQL_TOKEN_BUDGET_SELECT,
    "curriculum_buckets": SQL_CURRICULUM_BUCKETS,
}
