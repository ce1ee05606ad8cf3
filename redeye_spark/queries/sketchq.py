"""Count-min sketch queries (operators/sketches.py CMS section) over
event user activity: build the sketch, estimate per-user event counts
(including the deterministic collision overestimates), and prove
shard-add mergeability. The md5-bucket hash family is engine-portable,
so DuckDB replays every cell and every MIN-estimate exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import sketches


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_cms_cells_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(row, bucket, cnt): the user-activity sketch — <= depth x width
    integer cells, shard-addable."""
    return sketches.cms_cells(_events(spark, sf_dir), "user_id")


def q_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-add equivalence as a query: sketches built on an
    event_id%2 split, cell-summed — must equal the whole-corpus build
    (the oracle computes the latter directly)."""
    ev = _events(spark, sf_dir)
    a = sketches.cms_cells(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = sketches.cms_cells(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def q_cms_user_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, est, true_cnt): the sketch's point estimate next to
    ground truth for every distinct user — est >= true_cnt always, and
    the collision-driven gap is hash-pinned."""
    ev = _events(spark, sf_dir)
    cells = sketches.cms_cells(ev, "user_id")
    est = sketches.cms_estimate(ev, cells, "user_id")
    true_cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    return est.join(true_cnt, "user_id").select("user_id", "est", "true_cnt")


def _hits_sql(source: str) -> str:
    """UNION ALL expansion of the depth hash rows over `source`
    (a relation exposing user_id)."""
    return "\nUNION ALL\n".join(
        f"SELECT user_id, {j} AS row, "
        f"{sketches.cms_bucket_sql('user_id', j)} AS bucket FROM {source}"
        for j in range(sketches.CMS_DEPTH)
    )


_CELLS_CTE = f"""
hits AS (
  {_hits_sql('events')}
),
cells AS (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM hits GROUP BY 1, 2
)"""

SQL_CMS_CELLS_USERS = f"""
WITH {_CELLS_CTE}
SELECT row, bucket, cnt FROM cells
"""

SQL_CMS_MERGE = SQL_CMS_CELLS_USERS  # shard-add must equal whole build

SQL_CMS_USER_ESTIMATES = f"""
WITH {_CELLS_CTE},
users AS (SELECT DISTINCT user_id FROM events),
probes AS (
  {_hits_sql('users')}
),
est AS (
  SELECT p.user_id, MIN(COALESCE(c.cnt, 0)) AS est
  FROM probes p
  LEFT JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
  GROUP BY 1
)
SELECT e.user_id, e.est, t.true_cnt
FROM est e
JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY 1) t USING (user_id)
"""


QUERIES = {
    "cms_cells_users": q_cms_cells_users,
    "cms_merge": q_cms_merge,
    "cms_user_estimates": q_cms_user_estimates,
}

ORACLES = {
    "cms_cells_users": SQL_CMS_CELLS_USERS,
    "cms_merge": SQL_CMS_MERGE,
    "cms_user_estimates": SQL_CMS_USER_ESTIMATES,
}
