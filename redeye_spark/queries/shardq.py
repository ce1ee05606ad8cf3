"""Rendezvous-sharding queries (operators/sharding.py).

- shard_assign_counts: HRW placement census for 8 shards.
- shard_churn: the 8 -> 10 resize report; `moved_between_old` must be
  0 (the consistent-hashing guarantee), and the oracle recomputes every
  per-(doc, shard) weight to pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..operators import sharding
from ._shared import _utc

_N8, _N10 = 8, 10


def _duck_weights(n: int, name: str) -> str:
    """DuckDB CTE (doc_id, shard) replaying the HRW argmax for n
    shards: the same mod-guarded integer weight arithmetic, first-max
    tie-break (list_position returns the first occurrence)."""
    return f"""
{name} AS (
  SELECT doc_id,
         CAST(list_position(ws, list_aggregate(ws, 'max')) - 1 AS BIGINT)
           AS shard
  FROM (
    SELECT doc_id,
           list_transform(
             list_transform(range({n}),
               s -> [(((doc_id % {sharding.M31}) * {sharding.A}
                       + (s + 1) * {sharding.B}) % {sharding.M31}), s]),
             p -> (p[1] * p[1] + p[2]) % {sharding.W}) AS ws
    FROM documents
  )
)"""


def q_shard_assign_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRW placement census: assignment is a zero-shuffle codegen
    projection; the only exchange carries one row per shard."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        sharding.hrw_assign(docs, "doc_id", _N8)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("shard", F.col("n_docs").cast("long").alias("n_docs"))
    )


SQL_SHARD_ASSIGN_COUNTS = f"""
WITH {_duck_weights(_N8, "a")}
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs FROM a GROUP BY shard
"""


def q_shard_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 -> 10 resize churn report; moved_between_old == 0 is the HRW
    minimal-churn invariant, proven corpus-wide by the oracle hash."""
    _utc(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sharding.shard_churn(docs, "doc_id", _N8, _N10).select(
        "status", F.col("n").cast("long").alias("n")
    )


SQL_SHARD_CHURN = f"""
WITH {_duck_weights(_N8, "a8")}, {_duck_weights(_N10, "a10")}
SELECT CASE WHEN a8.shard = a10.shard THEN 'stayed'
            WHEN a10.shard >= {_N8} THEN 'moved_to_new'
            ELSE 'moved_between_old' END AS status,
       CAST(count(*) AS BIGINT) AS n
FROM a8 JOIN a10 USING (doc_id)
GROUP BY 1
"""


QUERIES = {
    "shard_assign_counts": q_shard_assign_counts,
    "shard_churn": q_shard_churn,
}

ORACLES = {
    "shard_assign_counts": SQL_SHARD_ASSIGN_COUNTS,
    "shard_churn": SQL_SHARD_CHURN,
}
