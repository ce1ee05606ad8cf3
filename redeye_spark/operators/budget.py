"""Budgeted data selection — "take the best documents until the token
budget is spent".

Every pretraining run starts from a token budget, not a document
count: rank the corpus by a quality signal and keep documents in rank
order until cumulative tokens reach the budget. The naive Spark
formulation is a running total over a GLOBAL order — a window with no
partitionBy, which Spark executes on ONE task (the classic scale
killer). This module plans it as the textbook distributed prefix sum:

  1. bucket each row by a deterministic RANGE of the order key
     (value-based, not partition-based, so the result is independent
     of physical partitioning),
  2. per-bucket weight totals — one tiny partial-aggregated shuffle
     (buckets, not rows),
  3. exclusive running offsets across the ordered buckets — computed
     over the BUCKET table (bounded, corpus-size-free) and broadcast,
  4. within-bucket running totals — windows partitioned BY BUCKET
     (parallel across buckets) plus the bucket's offset.

A document is kept iff its global inclusive prefix sum stays within
budget — exact integer arithmetic end to end, so an oracle can replay
the selection with a plain SQL window sum.

The quality signal is intentionally an argument: compose with
text.quality_score, classifier.feature_hash_scores, or
perplexity filters upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def select_until_budget(
    df: DataFrame,
    budget: int,
    weight_col: str,
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
    bucket_width: int = 1,
) -> DataFrame:
    """(id_col, order_col, weight_col, cum_weight) — rows whose
    inclusive running total of `weight_col`, taken in (`order_col`,
    `id_col`) order, is <= budget. Weights must be non-negative
    integers (token counts); the selection boundary is an integer
    comparison.

    `bucket_width` buckets the ORDER KEY's value range (order keys are
    assumed integer-valued, e.g. quality scores); each bucket's window
    is bounded by that value range's row share, and the cross-bucket
    offset pass runs on the bucket census only.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    o = F.col(order_col).cast("long")
    # floor-division bucket of the order value; negated first for
    # descending order so bucket index always ASCENDS with rank order
    key = (-o) if descending else o
    bucket = F.floor(key / F.lit(bucket_width)).cast("long")
    w = F.col(weight_col).cast("long")
    rows = df.select(
        F.col(id_col),
        o.alias(order_col),
        w.alias(weight_col),
        bucket.alias("_bkt"),
        key.alias("_key"),
    )
    # bucket census: total weight per bucket, then exclusive running
    # offsets across the ordered (bounded) bucket table
    census = rows.groupBy("_bkt").agg(F.sum(weight_col).alias("_bw"))
    off_w = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = census.select(
        "_bkt",
        F.coalesce(F.sum("_bw").over(off_w), F.lit(0)).alias("_off"),
    )
    # early bucket prune: a bucket whose EXCLUSIVE offset already
    # exceeds the budget cannot contribute any row — the broadcast
    # semi-join prunes it before the per-bucket windows run
    live = offsets.filter(F.col("_off") <= F.lit(budget))
    in_w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_key").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        rows.join(F.broadcast(live), "_bkt")
        .withColumn("_cum", F.sum(weight_col).over(in_w) + F.col("_off"))
        .filter(F.col("_cum") <= F.lit(budget))
    )
    return out.select(
        id_col,
        order_col,
        weight_col,
        F.col("_cum").alias("cum_weight"),
    )
