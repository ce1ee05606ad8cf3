"""Behavioral-analytics queries over the events table (funnel,
retention, burst detection) plus network enrichment (longest-prefix
match) and weighted sampling — round-5 target-only operators.

The funnel/retention queries thin the corpus with `event_id % 17 < 2`
(events are dense enough at every sf that EVERY user completes every
stage otherwise — the thinned corpus spreads users across stages and
cohort days, so the oracle actually discriminates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ._shared import _frags, _oracle_base, _parsed, _utc  # noqa: F401

_FUNNEL_STAGES = ["view", "click", "purchase"]


def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordered 3-stage funnel (view -> click -> purchase):
    cumulative users reaching at least each stage. ONE shuffle
    (groupBy user building a time-sorted array) + a JVM fold — no
    k-1 self-join cascade (the oracle IS that cascade, as ground
    truth from the other direction)."""
    from ..operators import funnel as funnel_op

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") % 17 < 2
    )
    return funnel_op.funnel_counts(ev, _FUNNEL_STAGES).select(
        "stage", "stage_name", "n_users"
    )


SQL_FUNNEL_COUNTS = """
WITH ev AS (SELECT * FROM events WHERE event_id % 17 < 2),
t1 AS (SELECT user_id, min(ts) ts1 FROM ev WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(e.ts) ts2 FROM ev e JOIN t1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
t3 AS (SELECT e.user_id, min(e.ts) ts3 FROM ev e JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1)
SELECT * FROM (
  SELECT 1 AS stage, 'view' AS stage_name, (SELECT count(*) FROM t1) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM t2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM t3)
) WHERE n_users > 0
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users first seen on cohort_day active again
    day_offset days later (distinct users; offset 0 = cohort size)."""
    from ..operators import funnel as funnel_op

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") % 17 < 2
    )
    return funnel_op.retention_cohorts(ev, max_offset=30).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_users",
    )


SQL_RETENTION_COHORTS = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) d FROM events WHERE event_id % 17 < 2),
f AS (SELECT user_id, min(d) cohort_day FROM ev GROUP BY 1)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       (ev.d - f.cohort_day) AS day_offset,
       count(DISTINCT ev.user_id) AS n_users
FROM ev JOIN f USING (user_id)
WHERE (ev.d - f.cohort_day) <= 30
GROUP BY 1, 2
"""


def q_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user error-burst summary: trailing 24 h RANGE window with
    >= 4 errors marks a burst event; exact integer epoch-second frame
    in both engines."""
    from ..operators import funnel as funnel_op

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_op.error_bursts(ev, k=4, window_s=86400).select(
        "user_id", "n_burst_events", "max_burst"
    )


SQL_ERROR_BURSTS = """
WITH e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
c AS (SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                            RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS cnt
      FROM e)
SELECT user_id, count(*) AS n_burst_events, CAST(max(cnt) AS BIGINT) AS max_burst
FROM c WHERE cnt >= 4 GROUP BY 1
"""


# CIDR rule table for the LPM query: every parsed host is 10.u.e.m with
# u = user_id % 200, e = event_id % 250, m = (event_id*7) % 250, so the
# /8 is a catch-all, the /16s cover u < 8, and three /24s carve
# specific (u, e) subnets out of both.
_LPM_RULES = (
    [("10.0.0.0/8", "corp")]
    + [(f"10.{u}.0.0/16", f"net-{u}") for u in range(8)]
    + [
        ("10.3.5.0/24", "rack-a"),
        ("10.3.99.0/24", "rack-b"),
        ("10.120.7.0/24", "rack-c"),
    ]
)


def q_lpm_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Requests per network label, where the label is the
    longest-prefix CIDR match of the parsed remote host — one broadcast
    hash join per distinct prefix length (/24 then /16 then /8),
    coalesced in specificity order; zero shuffles before the final
    count. Exercises P3 parse -> ipv4_to_long -> lpm_join end to end."""
    from ..operators import enrich as enrich_op

    parsed = _parsed(spark, sf_dir).filter(F.col("remote_host").isNotNull())
    labeled = enrich_op.lpm_join(parsed, _LPM_RULES, "remote_host")
    return labeled.groupBy("net_label").agg(F.count(F.lit(1)).alias("n_requests"))


SQL_LPM_ENRICH = f"""
WITH hosts AS (
  SELECT CAST(user_id % 200 AS BIGINT) AS u,
         CAST(event_id % 250 AS BIGINT) AS e
  FROM events
  WHERE {_frags('duck')['badk']} = 'ok'
)
SELECT CASE WHEN u = 3 AND e = 5 THEN 'rack-a'
            WHEN u = 3 AND e = 99 THEN 'rack-b'
            WHEN u = 120 AND e = 7 THEN 'rack-c'
            WHEN u < 8 THEN 'net-' || CAST(u AS VARCHAR)
            ELSE 'corp' END AS net_label,
       count(*) AS n_requests
FROM hosts GROUP BY 1
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic Bernoulli sample of the document
    corpus: acceptance rate = min(1, n_chars/400), realized as an exact
    integer bucket cut (least(256, n_chars*256 DIV 400)) so membership
    is bit-identical in any engine — longer documents are kept more
    often, short ones down-weighted, no rand() anywhere."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cut = F.expr("least(256, CAST(n_chars AS BIGINT) * 256 DIV 400)")
    return sampling.weighted_sample(docs, cut).select("doc_id", "n_chars")


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars
FROM documents
WHERE (strpos('0123456789abcdef', substr(md5('wsamp42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
    + (strpos('0123456789abcdef', substr(md5('wsamp42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
    < least(256, CAST(n_chars AS BIGINT) * 256 // 400)
"""



def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomaly detection with EXACT integer
    arithmetic: events whose value deviates > 2.5 population sigmas
    from the trailing 72 h window (>= 8 points). The z-test is cleared
    of division/sqrt — (n*x - S)^2 * 4 > 25 * (n*Q - S^2) on quantized
    cents — so the flag set is bit-identical in any engine."""
    from ..operators import timeseries as ts_op

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = ts_op.rolling_anomalies(
        ev, key_col="user_id", ts_col="ts", val_col="value",
        window_s=259200, threshold=2.5, min_window=8,
    )
    return out.select("event_id", "user_id", "n_window")


SQL_ROLLING_ANOMALY = """
WITH q AS (
  SELECT event_id, user_id,
         CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS xq,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
w AS (
  SELECT event_id, user_id, xq,
         COUNT(*)        OVER win AS n,
         SUM(xq)         OVER win AS s,
         SUM(xq * xq)    OVER win AS qq
  FROM q
  WINDOW win AS (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, n AS n_window
FROM w
WHERE n >= 8
  AND (n * xq - s) * (n * xq - s) * 4 > 25 * (n * qq - s * s)
"""



def q_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with forward fill (the
    time_bucket_gapfill shape) for a user subset: per-bucket value is
    the EXACT integer cent sum (agg_fn override — float AVG would be
    summation-order-dependent in its last bits), empty buckets carry
    the last aggregate forward and report n_events = 0."""
    from ..operators import timeseries as ts_op

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") % 10 == 0
    )
    out = ts_op.resample_ffill(
        ev, key_col="user_id", ts_col="ts", val_col="value",
        step_seconds=3600,
        agg_fn=lambda c: F.sum(F.round(c.cast("double") * 100).cast("long")),
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.col("value_ffill").cast("long").alias("cents_ffill"),
        "n_events",
    )


SQL_RESAMPLE_1H = """
WITH e AS (
  SELECT user_id,
         to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600) AS b,
         CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS xc
  FROM events WHERE user_id % 10 = 0
),
a AS (SELECT user_id, b, CAST(sum(xc) AS BIGINT) v, count(*) n FROM e GROUP BY 1, 2),
s AS (SELECT user_id, min(b) lo, max(b) hi FROM a GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b FROM s
)
SELECT g.user_id,
       strftime(g.b, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(last_value(a.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_ffill,
       coalesce(a.n, 0) AS n_events
FROM grid g LEFT JOIN a ON a.user_id = g.user_id AND a.b = g.b
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (first-order Markov
    matrix): LAG over (ts, event_id) inside each user, then a count per
    (prev_type, next_type) pair — the sequence-mining shape session
    analysis starts from. One window shuffle + one tiny aggregate."""
    from pyspark.sql.window import Window

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling of the events table — per column:
    null count and exact distinct count — in ONE aggregation pass (a
    single row of 2xN aggregates, unpivoted to (column, stat) rows by a
    stack projection; no per-column scans)."""
    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    one = ev.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)"
    )


SQL_PROFILE_EVENTS = """
SELECT 'event_id' AS column_name, CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, count(DISTINCT event_id) AS n_distinct FROM events
UNION ALL
SELECT 'ts', CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT ts) FROM events
UNION ALL
SELECT 'user_id', CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT user_id) FROM events
UNION ALL
SELECT 'event_type', CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT event_type) FROM events
UNION ALL
SELECT 'value', CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT value) FROM events
UNION ALL
SELECT 'props', CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT props) FROM events
"""


QUERIES = {
    "funnel_counts": q_funnel_counts,
    "retention_cohorts": q_retention_cohorts,
    "error_bursts": q_error_bursts,
    "lpm_enrich": q_lpm_enrich,
    "weighted_sample": q_weighted_sample,
    "rolling_anomaly": q_rolling_anomaly,
    "resample_1h": q_resample_1h,
    "event_transitions": q_event_transitions,
    "profile_events": q_profile_events,
}

ORACLES = {
    "funnel_counts": SQL_FUNNEL_COUNTS,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "error_bursts": SQL_ERROR_BURSTS,
    "lpm_enrich": SQL_LPM_ENRICH,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "rolling_anomaly": SQL_ROLLING_ANOMALY,
    "resample_1h": SQL_RESAMPLE_1H,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "profile_events": SQL_PROFILE_EVENTS,
}
