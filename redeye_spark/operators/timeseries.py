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
    agg_fn=None,
) -> DataFrame:
    """Returns (key, bucket, value_ffill, n_events): one row per key per
    step between that key's first and last event bucket; empty buckets
    carry the most recent bucket's aggregate forward and report
    n_events = 0. `bucket` is the bucket start as a timestamp.

    `agg_fn` maps the value Column to the per-bucket aggregate
    (default F.avg). Pass an integer-exact aggregate (e.g.
    sum of quantized cents) when the result must be bit-identical
    across engines/partitionings — float AVG depends on summation
    order in its last bits."""
    step = f"INTERVAL {int(step_seconds)} SECONDS"
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("bigint")
        * step_seconds)
    agg_of = agg_fn if agg_fn is not None else F.avg
    agg = (df.select(F.col(key_col).alias("key"), bucket.alias("bucket"),
                     F.col(val_col).alias("v"))
           .groupBy("key", "bucket")
           .agg(agg_of(F.col("v")).alias("v"), F.count(F.lit(1)).alias("n_events")))
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


def rolling_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    window_s: int = 21600,
    threshold: float = 3.0,
    min_window: int = 5,
    quantize: int = 100,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection with EXACT integer
    arithmetic: flag events whose value deviates from the trailing
    `window_s`-second window's mean by more than `threshold` population
    standard deviations.

    The z-test is algebraically cleared of divisions and square roots:
        (x - mu)^2 > t^2 * sigma^2
        <=> (n*x - S)^2 > t^2 * (n*Q - S^2)
    with S = sum(x), Q = sum(x^2) over the window, all computed on
    quantized integers (value * quantize, rounded once per row). Both
    sides of the inequality are BIGINT products of window sums, so the
    flag is bit-identical in any engine — no float accumulation order,
    no sqrt, no epsilon. threshold is folded in as an exact rational
    t2n/t2d (t^2 in lowest terms — thresholds like 2, 2.5, 3 give tiny
    denominators, preserving int64 headroom: the products are bounded
    by (n*max|x_q|)^2 * t2d).

    Scale: one Window per key over an integer epoch-second RANGE frame
    (running frame, no per-row list materialization). min_window
    suppresses flags until the window holds enough points for a
    meaningful deviation estimate."""
    from decimal import Decimal
    from fractions import Fraction

    t2 = Fraction(Decimal(str(threshold))) ** 2
    t2n, t2d = t2.numerator, t2.denominator
    xq = F.round(F.col(val_col).cast("double") * quantize).cast("long")
    base = df.withColumn("_xq", xq).withColumn(
        "_es", F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_es")
        .rangeBetween(-window_s, 0)
    )
    # window expressions must be projected before the filter (Spark
    # rejects window functions inside WHERE)
    wins = (
        base.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_s", F.sum("_xq").over(w))
        .withColumn("_q", F.sum(F.col("_xq") * F.col("_xq")).over(w))
    )
    dev = F.col("_n") * F.col("_xq") - F.col("_s")
    lhs = dev * dev * F.lit(t2d)
    rhs = F.lit(t2n) * (F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s"))
    return (
        wins.filter((F.col("_n") >= min_window) & (lhs > rhs))
        .drop("_xq", "_es", "_s", "_q")
        .withColumnRenamed("_n", "n_window")
    )
