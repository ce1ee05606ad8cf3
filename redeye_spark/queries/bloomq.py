"""Bloom-filter queries (operators/bloom.py): build a filter over a
deterministic "benchmark id" member set (doc_id % 7 == 0), probe the
whole corpus through it, and prove shard-merge equivalence. Because
positions are md5-nibble arithmetic, even the FALSE POSITIVES are a
deterministic function of the hash family — the oracle pins them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import bloom

_MEMBER_PRED = "doc_id % 7 = 0"


def _pos_list_sql() -> str:
    """DuckDB list of the k=3 positions for a documents.doc_id row."""
    return "[" + ", ".join(
        bloom.position_sql("doc_id", j) for j in range(bloom.N_HASHES)
    ) + "]"


_CELLS_CTE = f"""
members AS (SELECT doc_id FROM documents WHERE {_MEMBER_PRED}),
pos AS (SELECT unnest({_pos_list_sql()}) AS pos FROM members),
cells AS (
  SELECT CAST(pos // {bloom.WORD_BITS} AS INTEGER) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << (pos % {bloom.WORD_BITS})) AS bits
  FROM pos GROUP BY 1
)"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).filter(F.expr(_MEMBER_PRED))


def q_bloom_filter_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word_idx, bits): the packed filter over the member set — the
    persistable, mergeable decontamination artifact."""
    return bloom.bloom_cells(_members(spark, sf_dir), "doc_id")


def q_bloom_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-merge equivalence as a query: build per-shard filters on a
    doc_id%2 split, bit_or-union the cells — must equal the whole-corpus
    filter (the oracle computes the latter directly)."""
    m = _members(spark, sf_dir)
    shard_a = bloom.bloom_cells(m.filter(F.col("doc_id") % 2 == 0), "doc_id")
    shard_b = bloom.bloom_cells(m.filter(F.col("doc_id") % 2 == 1), "doc_id")
    return (
        shard_a.unionByName(shard_b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def q_bloom_probe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_hits, n_true): every document probed through
    the filter as a zero-shuffle codegen projection (the filter words
    are a bounded driver collect folded in as literals). n_hits >=
    n_true, and the gap — the false positives — hash-matches too."""
    docs = _docs(spark, sf_dir)
    words = bloom.collect_words(
        bloom.bloom_cells(_members(spark, sf_dir), "doc_id")
    )
    probed = bloom.bloom_probe(docs, words, "doc_id")
    return probed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("bloom_hit").cast("long")).alias("n_hits"),
        F.sum(F.expr(_MEMBER_PRED).cast("long")).alias("n_true"),
    )


SQL_BLOOM_FILTER_CELLS = f"""
WITH {_CELLS_CTE}
SELECT word_idx, bits FROM cells
"""

SQL_BLOOM_MERGE = SQL_BLOOM_FILTER_CELLS  # merge must equal whole-corpus build

SQL_BLOOM_PROBE_STATS = f"""
WITH {_CELLS_CTE},
lk AS (
  SELECT doc_id, source, unnest({_pos_list_sql()}) AS pos
  FROM documents
),
chk AS (
  SELECT l.doc_id, l.source,
         bool_and((COALESCE(c.bits, 0)
                   & (CAST(1 AS BIGINT) << (l.pos % {bloom.WORD_BITS}))) <> 0) AS hit
  FROM lk l
  LEFT JOIN cells c ON c.word_idx = l.pos // {bloom.WORD_BITS}
  GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_true
FROM chk GROUP BY 1
"""


def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue for size-1 parts THROUGH the Bloom-pruned join:
    the runtime-filter pattern end to end. The oracle is the PLAIN
    join — hash equality proves the pruned plan changes nothing but
    the exchanged row mass (no false negatives; false positives die in
    the join)."""
    from ._shared import _utc

    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_size") == 1)
        .select("p_partkey", "p_brand")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)")
           - F.col("l_discount").cast("decimal(18,2)"))
    )
    j = bloom.bloom_pruned_join(li, dim, "l_partkey", "p_partkey")
    return (
        j.groupBy("p_brand")
        .agg(
            F.sum(rev).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "p_brand",
            F.col("_rev").cast("double").alias("revenue"),
            F.col("n_items").cast("long").alias("n_items"),
        )
    )


SQL_BLOOM_PRUNED_REVENUE = """
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size = 1
GROUP BY p_brand
"""


QUERIES = {
    "bloom_filter_cells": q_bloom_filter_cells,
    "bloom_merge": q_bloom_merge,
    "bloom_probe_stats": q_bloom_probe_stats,
    "bloom_pruned_revenue": q_bloom_pruned_revenue,
}

ORACLES = {
    "bloom_filter_cells": SQL_BLOOM_FILTER_CELLS,
    "bloom_merge": SQL_BLOOM_MERGE,
    "bloom_probe_stats": SQL_BLOOM_PROBE_STATS,
    "bloom_pruned_revenue": SQL_BLOOM_PRUNED_REVENUE,
}
