#!/usr/bin/env python
"""Hot-key as-of join bench: plain window plan vs bucket= time-bucketed
plan on a corpus where ONE key owns 50% of both sides (r4 verdict #6 —
the bucketed plan was priced as ~2x insurance on uniform data; this
shows the payoff side: on skew, plain serializes the hot key's whole
ordered history on one task, bucketed spreads it across
time-span/bucket tasks).

Synthetic corpus (no external data): left = n_left point-in-time
probes, right = n_right versioned records; key 'hot' takes every 2nd
row of both sides, the rest spread over 997 cold keys; event times
stride a ~30-day span so '1 hour' buckets split the hot key ~720 ways.

Usage: python BENCH/asof_skew_bench.py [n_left] [n_right]
Prints one JSON line with both wall times and a result-equality check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LEFT = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_RIGHT = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
SPAN_S = 30 * 86400  # ~30 days -> ~720 one-hour buckets for the hot key
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build(spark, n: int, side: str):
    from pyspark.sql import functions as F

    # every 2nd row -> 'hot'; deterministic pseudo-scatter of timestamps
    # across the span so buckets fill evenly on both sides
    return (
        spark.range(n)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id") % 997))
            .alias("key"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(F.col("id") * 2654435761, F.lit(SPAN_S))
            ).alias("ts"),
            (F.col("id") * 31 % 100000).alias(f"{side}_val"),
            F.col("id").alias(f"{side}_id"),
        )
        .repartition(CPUS)  # scatter input so only the JOIN is skewed
    )


def main() -> None:
    from pyspark.sql import functions as F

    from redeye_spark.operators.asof import asof_join
    from redeye_spark.session import get_spark

    spark = get_spark("asof-skew-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    left = build(spark, N_LEFT, "l").persist()
    right = build(spark, N_RIGHT, "r").persist()
    left.count(), right.count()  # materialize inputs outside the window

    def run(bucket):
        out = asof_join(left, right, "key", "key", "ts", "ts",
                        right_cols=["r_val", "r_id"], tie_col="r_id",
                        bucket=bucket)
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run("1 hour")  # warm-up: python workers + codegen (excluded)
    results = {}
    for label, bucket in (("plain", None), ("bucketed_1h", "1 hour")):
        results[label] = round(min(run(bucket) for _ in range(2)), 2)

    # equality: both plans must produce identical result sets
    def checksum(bucket):
        out = asof_join(left, right, "key", "key", "ts", "ts",
                        right_cols=["r_val", "r_id"], tie_col="r_id",
                        bucket=bucket)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(  # decimal(38,0): int64 sum of 4M hashes overflows ANSI
                F.xxhash64("key", "ts", "l_id", "r_val", "r_id")
                .cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return row["n"], str(row["h"])

    eq = checksum(None) == checksum("1 hour")
    print(json.dumps({
        "n_left": N_LEFT, "n_right": N_RIGHT,
        "hot_key_share": 0.5, "span_days": SPAN_S // 86400,
        "wall_sec": results,
        "speedup_bucketed_vs_plain": round(results["plain"] / results["bucketed_1h"], 2),
        "results_identical": eq,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
