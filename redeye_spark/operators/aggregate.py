"""Per-sink aggregate counts + explicit skew mitigation.

Counts per (time bucket, status_class, method, source) per sink
(FIXTURES §1.4). Spark's hash aggregate already does partial (map-side)
aggregation, which absorbs *row* skew; `salted_counts` additionally
splits hot GROUPS across reducers — required by north_rule's explicit
salted-key skew handling and genuinely needed when one (source, bucket)
group would otherwise land on a single reducer at 10^12-row scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

AGG_KEYS = ["status_class", "method", "source"]


def bucket_col(granularity: str = "hour") -> F.Column:
    return F.date_trunc(granularity, F.col("timestamp")).alias("bucket")


def sink_counts(tagged: DataFrame, granularity: str = "hour") -> DataFrame:
    """Straight hash aggregation: groupBy(sink, bucket, keys).count()."""
    return (
        tagged.groupBy(F.col("sink"), bucket_col(granularity), *[F.col(k) for k in AGG_KEYS])
        .agg(F.count(F.lit(1)).alias("n"))
    )


def salted_counts(
    tagged: DataFrame,
    granularity: str = "hour",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted count, result identical to sink_counts.

    Phase 1 groups on (salt, keys) — the salt derives from doc_id's hash
    so a hot (source, bucket) group fans across `salt_buckets` reducers.
    Phase 2 re-aggregates the (tiny) partial counts on the real keys.
    """
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salt_buckets)).alias("_salt")
    partial = (
        tagged.select(
            salt, F.col("sink"), bucket_col(granularity), *[F.col(k) for k in AGG_KEYS]
        )
        .groupBy("_salt", "sink", "bucket", *AGG_KEYS)
        .agg(F.count(F.lit(1)).alias("_partial_n"))
    )
    return partial.groupBy("sink", "bucket", *AGG_KEYS).agg(F.sum("_partial_n").alias("n"))


def hopping_counts(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Overlapping (hopping) time-window counts — the batch twin of the
    streaming windowed aggregation: each row lands in window/slide
    windows (e.g. two for 1h/30m), counted per (window, keys).

    `F.window` replicates each row window/slide times *inside the
    partial (map-side) aggregate*, so the shuffle carries only the
    already-combined (window, keys) partial counts — the amplification
    factor never crosses the exchange. That is the property that keeps
    hopping windows viable at 100 TB; materializing the replicated rows
    and then grouping would double (or worse) the shuffle volume.
    """
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
        )
    )
