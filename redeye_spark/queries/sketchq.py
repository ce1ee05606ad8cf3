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




# ---------------------------------------------------------------------------
# Quantile histogram queries: cells / shard-merge / quantile reads over
# the event value grid (cents = floor(value*100), the house quantize-
# once step; bin width 500 -> ~bins = range/500, corpus-size-free).
# ---------------------------------------------------------------------------

_HIST_WIDTH = 500


def _cents(df: DataFrame):
    return F.floor(F.col("value") * F.lit(100)).cast("long")


def q_hist_cells_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, cnt): the equi-width histogram sketch of the event value
    grid — one projection + partial agg, shuffle carries cells only."""
    ev = _events(spark, sf_dir)
    return sketches.hist_cells(ev, _cents(ev), _HIST_WIDTH)


def q_hist_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-add equivalence: cells built on an event_id%2 split,
    summed — must equal the whole-corpus build (the oracle computes
    the latter directly)."""
    ev = _events(spark, sf_dir)
    a = sketches.hist_cells(ev.filter(F.col("event_id") % 2 == 0), _cents(ev), _HIST_WIDTH)
    b = sketches.hist_cells(ev.filter(F.col("event_id") % 2 == 1), _cents(ev), _HIST_WIDTH)
    return sketches.hist_merge(a, b)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q, bin, lo, hi, est): p50/p90/p99 lower-quantile bins read from
    the cells — the window runs over the bins-sized cells frame, never
    the corpus."""
    ev = _events(spark, sf_dir)
    cells = sketches.hist_cells(ev, _cents(ev), _HIST_WIDTH)
    return sketches.hist_quantiles(cells, _HIST_WIDTH, (0.5, 0.9, 0.99))


_HIST_BIN_SQL = (
    "(c - ((c % 500 + 500) % 500)) / 500"
)

_HIST_CELLS_CTE = """
cents AS (SELECT CAST(floor(value * 100) AS BIGINT) AS c FROM events),
cells AS (
  SELECT CAST((c - ((c % 500 + 500) % 500)) / 500 AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM cents GROUP BY 1
)"""

SQL_HIST_CELLS_VALUE = f"""
WITH {_HIST_CELLS_CTE}
SELECT bin, cnt FROM cells
"""

SQL_HIST_MERGE = SQL_HIST_CELLS_VALUE  # shard-add must equal whole build

SQL_HIST_QUANTILES = f"""
WITH {_HIST_CELLS_CTE},
cum AS (
  SELECT bin,
         CAST(sum(cnt) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM cells
),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
hit AS (
  SELECT qs.q, min(cum.bin) AS bin
  FROM qs JOIN cum ON cum.cum >= CAST(ceil(qs.q * CAST(cum.n AS DOUBLE)) AS BIGINT)
  GROUP BY qs.q
)
SELECT q, bin, CAST(bin * 500 AS BIGINT) AS lo,
       CAST(bin * 500 + 499 AS BIGINT) AS hi,
       (CAST(bin * 500 AS DOUBLE) + CAST(bin * 500 + 499 AS DOUBLE)) / 2.0 AS est
FROM hit
"""

QUERIES = {
    "cms_cells_users": q_cms_cells_users,
    "cms_merge": q_cms_merge,
    "cms_user_estimates": q_cms_user_estimates,
    "hist_cells_value": q_hist_cells_value,
    "hist_merge": q_hist_merge,
    "hist_quantiles": q_hist_quantiles,
}

ORACLES = {
    "cms_cells_users": SQL_CMS_CELLS_USERS,
    "cms_merge": SQL_CMS_MERGE,
    "cms_user_estimates": SQL_CMS_USER_ESTIMATES,
    "hist_cells_value": SQL_HIST_CELLS_VALUE,
    "hist_merge": SQL_HIST_MERGE,
    "hist_quantiles": SQL_HIST_QUANTILES,
}
