"""Corpus-level divergence / overlap / exact-substring queries.

Three round-6 families over the token and document corpora:
- source_token_drift: per-source KL/JS divergence of the byte-token
  distribution vs the whole corpus (operators/ngrams.distribution_drift)
- dup_ngram_runs: maximal cross-document duplicated word-8-gram runs,
  the sliding-window exact-substring dedup signal
  (operators/spans.dup_ngram_runs)
- source_overlap: pairwise Jaccard of per-source word-3-gram
  vocabularies (operators/overlap.source_gram_overlap)

Oracles recompute each from first principles in DuckDB; every float
reduction folds in a pinned order with identical expression structure
on both engines (see distribution_drift's determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..operators import ngrams, overlap, spans
from ._shared import _utc
from .tokensq import _duck_lines, _raw


def q_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift vs the corpus blend: exact
    count cells, one broadcast of the (<=256-row) corpus distribution,
    deterministic ordered float folds (ngrams.distribution_drift)."""
    _utc(spark)
    return ngrams.distribution_drift(_raw(spark, sf_dir), by="source").select(
        "source", "n_tokens", "kl_bits", "js_bits"
    )


SQL_SOURCE_TOKEN_DRIFT = f"""
WITH {_duck_lines()},
toks AS (
  SELECT source,
         unnest(list_transform(range(length(line)), i -> ord(line[i+1]))) AS t
  FROM lines
),
c AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2),
g AS (SELECT t, CAST(sum(c) AS BIGINT) AS cg FROM c GROUP BY t),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS ng FROM c),
ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens FROM c GROUP BY source),
j AS (
  SELECT c.source, c.t,
         CAST(c.c AS DOUBLE) / CAST(ns.n_tokens AS DOUBLE) AS p,
         CAST(g.cg AS DOUBLE) / tot.ng AS q
  FROM c JOIN g ON g.t = c.t JOIN ns ON ns.source = c.source CROSS JOIN tot
),
terms AS (
  SELECT source, t,
         p * log2(p / q) AS tkl,
         p * log2(p / ((p + q) / 2.0)) AS tp,
         q * log2(q / ((p + q) / 2.0)) AS tq,
         q AS tqs
  FROM j
),
a AS (
  SELECT source,
         list(tkl ORDER BY t) AS lk, list(tp ORDER BY t) AS lp,
         list(tq ORDER BY t) AS lq, list(tqs ORDER BY t) AS ls
  FROM terms GROUP BY source
)
SELECT a.source, ns.n_tokens,
  round(list_reduce(list_prepend(0.0, lk), (x, y) -> x + y), 4) + 0.0 AS kl_bits,
  round((list_reduce(list_prepend(0.0, lp), (x, y) -> x + y)
         + list_reduce(list_prepend(0.0, lq), (x, y) -> x + y)
         + (1.0 - list_reduce(list_prepend(0.0, ls), (x, y) -> x + y))) / 2.0,
        4) + 0.0 AS js_bits
FROM a JOIN ns ON ns.source = a.source
"""


def q_dup_ngram_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated word-8-gram runs across the document corpus
    (digest-keyed dup detection + per-doc gaps-and-islands)."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return spans.dup_ngram_runs(docs, "text", "doc_id", n=8)


SQL_DUP_NGRAM_RUNS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         array_to_string(words[pos+1:pos+8], ' ') AS gram
  FROM w, UNNEST(range(len(words) - 7)) AS t(pos)
  WHERE len(words) >= 8
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
d AS (SELECT g.doc_id, g.pos FROM g JOIN dup ON dup.gram = g.gram),
i AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM d
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS run_start,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) + 7 AS BIGINT) AS run_words
FROM i GROUP BY doc_id, isl
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise word-3-gram vocabulary Jaccard between document
    sources (set-then-expand, never a gram self-join)."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return overlap.source_gram_overlap(docs, "text", "source", n=3)


SQL_SOURCE_OVERLAP = """
WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
g0 AS (
  SELECT source, array_to_string(words[pos+1:pos+3], ' ') AS gram
  FROM w, UNNEST(range(len(words) - 2)) AS t(pos)
  WHERE len(words) >= 3
),
g AS (SELECT DISTINCT source, gram FROM g0),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
),
v AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM g GROUP BY source)
SELECT source_a, source_b, va.nv AS n_a, vb.nv AS n_b, n_common,
       round(CAST(n_common AS DOUBLE)
             / CAST(va.nv + vb.nv - n_common AS DOUBLE), 6) AS jaccard
FROM p
JOIN v va ON va.source = p.source_a
JOIN v vb ON vb.source = p.source_b
"""


QUERIES = {
    "source_token_drift": q_source_token_drift,
    "dup_ngram_runs": q_dup_ngram_runs,
    "source_overlap": q_source_overlap,
}

ORACLES = {
    "source_token_drift": SQL_SOURCE_TOKEN_DRIFT,
    "dup_ngram_runs": SQL_DUP_NGRAM_RUNS,
    "source_overlap": SQL_SOURCE_OVERLAP,
}
