"""URL-analysis and rolling-distinct queries: API-version traffic
split, referer domain counts (combined format), and exact trailing
7-day unique users."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..functions.logparse import FORMAT_COMBINED
from ._shared import _frags, _parsed, _utc


def q_api_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Requests per (API version path segment, method) — built-in
    split/filter path segmentation over the parsed request URI, zero
    Python, one aggregate shuffle."""
    from ..operators import urls

    parsed = _parsed(spark, sf_dir).filter(F.col("requested_uri").isNotNull())
    return (
        parsed.select(
            urls.path_segment(F.col("requested_uri"), 2).alias("api_version"),
            "method",
        )
        .groupBy("api_version", "method")
        .agg(F.count(F.lit(1)).alias("n_requests"))
    )


SQL_API_VERSIONS = f"""
WITH ok AS (
  SELECT CAST(event_id % 3 AS BIGINT) AS v,
         {_frags('duck')['method']} AS method
  FROM events
  WHERE {_frags('duck')['badk']} = 'ok'
)
SELECT 'v' || CAST(v AS VARCHAR) AS api_version, method,
       count(*) AS n_requests
FROM ok GROUP BY 1, 2
"""


def q_referer_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referer host counts over the COMBINED-format parse — Spark's
    built-in parse_url inside codegen; '-' referers parse to NULL
    upstream and are excluded."""
    from ..operators import urls

    parsed = _parsed(spark, sf_dir, fmt=FORMAT_COMBINED)
    dom = urls.referer_domain(F.col("referer"))
    return (
        parsed.select(dom.alias("domain"))
        .filter(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_requests"))
    )


SQL_REFERER_DOMAINS = f"""
WITH ok AS (
  SELECT CAST(event_id % 4 AS INT) AS r
  FROM events
  WHERE {_frags('duck')['badk_combined']} = 'ok'
)
SELECT CASE r WHEN 1 THEN 'www.example.com' ELSE 'search.example.org' END AS domain,
       count(*) AS n_requests
FROM ok WHERE r IN (1, 2) GROUP BY 1
"""


def q_rolling_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 7-day unique users per day — the windowed
    COUNT(DISTINCT) Spark has no native form for, planned as
    distinct (day, user) pairs exploded to their 7 contribution days
    (amplifies the DEDUPLICATED pairs, never the event stream)."""
    from ..operators import aggregate as agg_op

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = agg_op.rolling_distinct(ev, "ts", "user_id", window_days=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_unique"
    )


SQL_ROLLING_UNIQUE_USERS = """
WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
mx AS (SELECT max(d) AS m FROM p),
f AS (
  SELECT CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                                     CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS day,
         user_id
  FROM p
)
SELECT strftime(f.day, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS n_unique
FROM f, mx WHERE f.day <= mx.m GROUP BY 1
"""


QUERIES = {
    "api_versions": q_api_versions,
    "referer_domains": q_referer_domains,
    "rolling_unique_users": q_rolling_unique_users,
}

ORACLES = {
    "api_versions": SQL_API_VERSIONS,
    "referer_domains": SQL_REFERER_DOMAINS,
    "rolling_unique_users": SQL_ROLLING_UNIQUE_USERS,
}
