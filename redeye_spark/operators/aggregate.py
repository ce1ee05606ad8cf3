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
