"""Search and per-group sampling queries: Okapi BM25 top-k retrieval
over the documents corpus and deterministic N-per-stratum selection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

_BM25_TERMS = ["vector", "hash", "stream"]
_BM25_K = 20


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 (k1=1.2, b=0.75) for a 3-term query.
    One bounded corpus-stats pass (N, avgdl, per-term df as one
    collected row), then a pure codegen scoring projection into
    TakeOrderedAndProject — no join, no wide shuffle. The oracle
    replays the identical expression shape (same literal order, same
    parenthesization) so the IEEE double sequence matches."""
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.bm25_topk(docs, _BM25_TERMS, k=_BM25_K).select(
        "doc_id", "score"
    )


def _bm25_oracle() -> str:
    terms = _BM25_TERMS
    tf = {
        t: f"CAST(len(list_filter(ws, x -> x = '{t}')) AS DOUBLE)" for t in terms
    }
    dfs = ", ".join(
        f"sum(CASE WHEN list_contains(ws, '{t}') THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(terms)
    )
    # round(ln(...), 9) / round(avgdl, 9) mirror bm25_topk's literal
    # rounding: both engines then score from bit-identical constants
    # regardless of libm's last-ulp behavior (ADVICE r5).
    idf = {
        t: (
            f"round(ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0), 9)"
        )
        for i, t in enumerate(terms)
    }
    contribs = " + ".join(
        f"({idf[t]}) * ({tf[t]} * (1.2 + 1.0) / "
        f"({tf[t]} + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / round(s.avgdl, 9)))))"
        for t in terms
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
),
d AS (SELECT doc_id, ws, len(ws) AS dl FROM w),
s AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {dfs}
  FROM d
),
scored AS (
  SELECT d.doc_id, (0.0 + {contribs}) AS raw
  FROM d, s
)
SELECT doc_id, round(raw, 4) AS score
FROM scored WHERE raw > 0.0
ORDER BY raw DESC, doc_id LIMIT {_BM25_K}
"""


SQL_BM25_SEARCH = _bm25_oracle()


def q_take_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-documents-per-source sample (md5-ranked inside
    each stratum — a reproducible random permutation, unlike
    ORDER BY rand())."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.take_per_group(docs, n=5, strata_col="source").select(
        "doc_id", "source"
    )


SQL_TAKE_PER_SOURCE = """
SELECT doc_id, source
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY source
  ORDER BY md5('take42:' || source || '|' || CAST(doc_id AS VARCHAR))
) <= 5
"""


QUERIES = {
    "bm25_search": q_bm25_search,
    "take_per_source": q_take_per_source,
}

ORACLES = {
    "bm25_search": SQL_BM25_SEARCH,
    "take_per_source": SQL_TAKE_PER_SOURCE,
}
