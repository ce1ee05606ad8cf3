"""Sessionization: group a host's requests into sessions separated by
idle gaps.

Batch version is pure window functions (lag -> gap flag -> running sum),
fully Catalyst-planned: one shuffle on the session key, no Python.
Streaming version keeps per-key state with applyInPandasWithState
(custom stateful operator — the piece Structured Streaming lacks
built-in), with a processing-time timeout as the idle flush.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def sessionize(
    df: DataFrame,
    key: str = "remote_host",
    ts: str = "timestamp",
    gap_minutes: int = 30,
) -> DataFrame:
    """Append session_id = '<key>#<n>' per gap-separated burst.

    Window spec shuffles once on the key; at 10^12 rows a hot key makes
    one reducer own that key's full history — the standard fix is
    day-bucketed keys (sessions rarely straddle buckets) which keeps the
    same plan shape; plain keying is used here.
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess_n = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("session_n", sess_n).withColumn(
        "session_id", F.concat(F.col(key), F.lit("#"), F.col("session_n").cast("string"))
    )


def session_stats(df: DataFrame, key: str = "remote_host", ts: str = "timestamp",
                  gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates: request count + duration seconds."""
    s = sessionize(df.filter(F.col(ts).isNotNull()), key, ts, gap_minutes)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_requests"),
        (F.max(F.col(ts).cast("long")) - F.min(F.col(ts).cast("long"))).alias("duration_sec"),
    )


def session_window_stats(
    df: DataFrame,
    key: str = "remote_host",
    ts: str = "timestamp",
    gap_minutes: int = 30,
    gap: str | None = None,
) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE session_window operator
    (one SessionWindowing + aggregate, no window-function pass) — the
    built-in twin of session_stats above, and the variant that also
    runs unchanged under Structured Streaming with merging session
    state.

    Semantics differ from the lag-based sessionize at the boundary: a
    native session window spans [start, last_event + gap), so a gap of
    EXACTLY gap_minutes starts a new session (lag-based splits only on
    gap > gap_minutes). The oracle mirrors the >= split rule.

    Runs unchanged on a watermarked STREAMING frame — streaming.
    start_session_stream wraps exactly this function, so batch and
    stream share one definition of a session. `gap` (an interval
    string) overrides gap_minutes when given."""
    g = gap or f"{gap_minutes} minutes"
    return (
        df.filter(F.col(ts).isNotNull())
        .groupBy(F.session_window(F.col(ts), g).alias("sw"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            (F.max(F.col(ts).cast("long")) - F.min(F.col(ts).cast("long"))).alias(
                "duration_sec"
            ),
            F.min(F.col(ts)).alias("session_start"),
        )
        .select(key, "session_start", "n_requests", "duration_sec")
    )


SESSION_STATE_SCHEMA = "last_ts long, session_n long, n_requests long, first_ts long"
SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("session_id", T.StringType(), False),
        T.StructField("n_requests", T.LongType(), False),
        T.StructField("duration_sec", T.LongType(), False),
    ]
)


def session_update(key, pdfs, state, gap_minutes: int = 30):
    """applyInPandasWithState update fn (importable + picklable).

    Emits a row per CLOSED session (gap exceeded within the batch or
    state timeout fired). Usage:

        parsed.filter(col("timestamp").isNotNull())
          .groupBy(col("remote_host"))
          .applyInPandasWithState(
              partial(session_update, gap_minutes=30),
              outputStructType=SESSION_OUT_SCHEMA,
              stateStructType=SESSION_STATE_SCHEMA,
              outputMode="append",
              timeoutConf="ProcessingTimeTimeout")

    Vectorized: the batch's timestamps are sorted once and split into
    gap-separated segments with numpy diff/nonzero — per-event work never
    touches Python, only the O(#closed sessions) emission does.
    """
    import numpy as np
    import pandas as pd

    gap = gap_minutes * 60
    (k,) = key
    if state.hasTimedOut:
        last_ts, session_n, n_req, first_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [{"key": k, "session_id": f"{k}#{session_n}",
              "n_requests": n_req, "duration_sec": last_ts - first_ts}]
        )
        return

    if state.exists:
        last_ts, session_n, n_req, first_ts = state.get
    else:
        last_ts, session_n, n_req, first_ts = None, 0, 0, None

    chunks = [pdf["timestamp"].astype("int64").to_numpy() // 1_000_000_000
              for pdf in pdfs]
    ts = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)

    out = []
    if len(ts):
        # segment boundaries where the idle gap is exceeded
        brk = np.nonzero(np.diff(ts) > gap)[0]
        segs = list(zip(np.r_[0, brk + 1], np.r_[brk, len(ts) - 1]))

        if last_ts is not None and int(ts[0]) - last_ts <= gap:
            # first segment continues the carried-over open session
            s0, e0 = segs.pop(0)
            n_req += int(e0 - s0 + 1)
            last_ts = int(ts[e0])
        for s, e in segs:
            if last_ts is not None:  # close the currently open session
                out.append({"key": k, "session_id": f"{k}#{session_n}",
                            "n_requests": n_req, "duration_sec": last_ts - first_ts})
            session_n += 1
            n_req = int(e - s + 1)
            first_ts = int(ts[s])
            last_ts = int(ts[e])

    state.update((last_ts, session_n, n_req, first_ts))
    state.setTimeoutDuration(gap * 1000)
    if out:
        yield pd.DataFrame(out)
