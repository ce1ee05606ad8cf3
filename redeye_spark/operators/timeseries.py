"""Time-series regularization: resample an irregular event stream onto
a fixed per-key grid and forward-fill the gaps.

The shape analytics stores call `time_bucket_gapfill` / `resample`:
bucket-aggregate, densify to every step between each key's first and
last bucket, then carry the last observation forward. All JVM-side —
one partial-aggregated groupBy, one narrow `sequence`+explode to mint
the grid (rows grow by the gap count, never by a join blow-up), one
equi-join back, one per-key running `last(IGNORE NULLS)` window. Two
shuffles total (bucket agg + window on key; the grid join reuses the
window's key partitioning under AQE).

At 100 TB the failure mode to design against is a key whose span/step
ratio explodes the grid (one sensor with a 10-year span at 1-second
steps = 3x10^8 rows from a single `sequence` call). `max_buckets`
guards that: the span is clamped in the plan (greatest/least on the
bucket bounds), so a pathological key yields a truncated — never
OOM-ing — grid, and the clamp is visible in the output rather than a
silent executor death.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int = 3600,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Returns (key, bucket, value_ffill, n_events): one row per key per
    step between that key's first and last event bucket; empty buckets
    carry the most recent bucket's aggregate (AVG) forward and report
    n_events = 0. `bucket` is the bucket start as a timestamp."""
    step = f"INTERVAL {int(step_seconds)} SECONDS"
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("bigint")
        * step_seconds)
    agg = (df.select(F.col(key_col).alias("key"), bucket.alias("bucket"),
                     F.col(val_col).alias("v"))
           .groupBy("key", "bucket")
           .agg(F.avg("v").alias("v"), F.count(F.lit(1)).alias("n_events")))
    span = agg.groupBy("key").agg(F.min("bucket").alias("lo"),
                                  F.max("bucket").alias("hi"))
    capped_hi = F.least(
        "hi", F.col("lo") + F.expr(f"INTERVAL {int(step_seconds) * (max_buckets - 1)} SECONDS"))
    grid = (span.select("key", "lo", capped_hi.alias("hi_c"))
            .select("key", F.explode(
                F.expr(f"sequence(lo, hi_c, {step})")).alias("bucket")))
    w = (Window.partitionBy("key").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(agg, ["key", "bucket"], "left")
            .select("key", "bucket",
                    F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
                    F.coalesce("n_events", F.lit(0)).alias("n_events")))
