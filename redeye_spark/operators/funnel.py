"""Behavioral analytics over event streams: ordered funnels, retention
cohorts, and burst detection.

The reference is a log parser (parser.rs), so these are target-only ops:
the questions every telemetry pipeline asks once lines are parsed and
routed ("how far do users get?", "do they come back?", "who is erroring
in bursts?"). All three are single-shuffle DataFrame plans:

* funnel_stages — ONE groupBy(user) building a per-user time-sorted
  event array, then a JVM higher-order `aggregate` fold walks it once,
  advancing a stage counter when the NEXT stage's event appears strictly
  after the time the previous stage was reached (strict ordered-funnel
  semantics: view -> click -> purchase out of order does NOT count).
  No self-join cascade (the textbook k-stage funnel is k-1 joins; this
  is one Exchange regardless of k). The per-user array is bounded by
  events-per-user; for entity keys with millions of events, pre-filter
  to the funnel's event types (done here) — the array then holds only
  stage-relevant events.
* retention_cohorts — cohort = first-seen day per user (one partial-agg
  pass), then (cohort_day, day_offset) distinct-user counts. The join
  back to events is on user_id, the same key the cohort agg just
  shuffled on, so AQE plans it without a second Exchange of events.
* error_bursts — per-user sliding time-RANGE count over an integer
  epoch-second ordering column; rows whose trailing window holds >= k
  events of the watched type are burst members. RANGE frame, not ROWS:
  wall-clock bursts, robust to event-rate variation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, stage_reached) — highest 1-based stage each user reached
    in strict order; users with no stage-1 event are absent.

    The fold state is (stage_reached, ts_of_last_advance); an event
    advances the funnel iff it is the next stage's type AND strictly
    later than the previous advance. Ties at identical timestamps do
    not advance (both engines agree on strictness, so the contract is
    deterministic even under ts collisions)."""
    if not stages:
        raise ValueError("funnel_stages needs at least one stage")
    ev = df.filter(F.col(type_col).isin(stages)).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_tp"))).alias("_evs")
    )
    # stage names -> 1-based index map literal (tiny, codegen-side)
    stage_map = F.create_map(
        *[x for i, s in enumerate(stages) for x in (F.lit(s), F.lit(i + 1))]
    )
    # fold: state struct(stage int, ts timestamp); advance on next-stage
    # events strictly after the last advance
    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit("1900-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    step = lambda acc, e: F.when(  # noqa: E731
        (stage_map[e["_tp"]] == acc["stage"] + 1) & (e["_ts"] > acc["ts"]),
        F.struct(
            (acc["stage"] + 1).alias("stage"), e["_ts"].alias("ts")
        ),
    ).otherwise(acc)
    return (
        per_user.select(
            "user_id",
            F.aggregate("_evs", zero, step)["stage"].alias("stage_reached"),
        )
        .filter(F.col("stage_reached") > 0)
    )


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, stage_name, n_users) — cumulative funnel: users whose
    strict-ordered progress reached AT LEAST each stage. n_users is
    non-increasing in stage by construction."""
    reached = funnel_stages(df, stages, user_col, ts_col, type_col)
    ladder = F.sequence(F.lit(1), F.col("stage_reached"))
    return (
        reached.select(F.explode(ladder).alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "stage",
            F.element_at(
                F.array(*[F.lit(s) for s in stages]), F.col("stage")
            ).alias("stage_name"),
            "n_users",
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — classic retention triangle:
    users first seen on cohort_day who were active day_offset days
    later (offset 0 = the cohort's own size). Distinct users, so a user
    active twice on day d counts once."""
    ev = df.select(
        F.col(user_col).alias("user_id"),
        F.to_date(F.col(ts_col)).alias("_day"),
    )
    first = ev.groupBy("user_id").agg(F.min("_day").alias("cohort_day"))
    act = ev.join(first, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
    )
    if max_offset is not None:
        act = act.filter(F.col("day_offset") <= max_offset)
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )


def error_bursts(
    df: DataFrame,
    k: int = 3,
    window_s: int = 600,
    watch_type: str = "error",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, n_burst_events, max_burst) — per-user burst summary:
    an event is a burst member when the trailing `window_s`-second
    RANGE window (per user, watched type only) holds >= k events;
    max_burst is the largest such trailing count. Users with no burst
    events are absent.

    Integer epoch-second RANGE frame: exact, engine-portable, and the
    window never materializes the event list — Spark keeps a running
    frame over the sorted partition."""
    ev = df.filter(F.col(type_col) == watch_type).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("_ts"))
        .rangeBetween(-window_s, 0)
    )
    burst = ev.withColumn("_cnt", F.count(F.lit(1)).over(w)).filter(
        F.col("_cnt") >= k
    )
    return burst.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_burst_events"),
        F.max("_cnt").cast("long").alias("max_burst"),
    )
