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
    # offsets across the ordered (bounded) bucket table. The "bounded"
    # claim is guarded: a bucket_width too fine for the key range would
    # silently single-partition the offset walk at scale.
    from .aggregate import MAX_CENSUS_ROWS, assert_census_bounded

    census = rows.groupBy("_bkt").agg(F.sum(weight_col).alias("_bw"))
    assert_census_bounded(
        census, MAX_CENSUS_ROWS,
        "widen `bucket_width` so the bucket census stays small",
    )
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


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    fractions: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4)),
) -> DataFrame:
    """(bucket, n_docs, n_weight, min_score, max_score) — curriculum
    bucketing: split the corpus at exact score quantiles (bucket 0 =
    lowest scores ... len(fractions) = highest) and report each
    bucket's row and weight (token) mass — the "sort by difficulty,
    batch by tier" step of curriculum training schedules.

    Boundary for fraction q = num/den is the SMALLEST score whose
    cumulative doc count reaches ceil(q*N) — integer rank arithmetic
    (cum*den >= num*N), no float percentile. The score census is one
    partial-aggregated shuffle (distinct scores, not rows); the
    cumulative walk and boundary extraction run on the CENSUS
    (score-range-sized, corpus-size-free), and the boundaries broadcast
    back over the row stream as a 1-row frame."""
    for num, den in fractions:
        if not (0 < num < den):
            raise ValueError(f"fractions must be in (0,1): {num}/{den}")
    s = F.col(score_col).cast("long")
    w = F.col(weight_col).cast("long")
    rows = df.select(s.alias("_s"), w.alias("_w"))
    census = rows.groupBy("_s").agg(F.count(F.lit(1)).alias("_n"))
    # guard the census-bounded window (see select_until_budget)
    from .aggregate import MAX_CENSUS_ROWS, assert_census_bounded

    assert_census_bounded(
        census, MAX_CENSUS_ROWS,
        "coarsen the score grid so the distinct-score census stays small",
    )
    cum_w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    # re-alias the total leg: both legs descend from `census`, and a
    # self-join of shared expression IDs is ambiguous to the analyzer
    total = census.select(F.col("_n").alias("_tn")).agg(
        F.sum("_tn").alias("_tot")
    )
    cen = census.withColumn("_cum", F.sum("_n").over(cum_w)).crossJoin(
        F.broadcast(total)
    )
    # one boundary column per fraction, reduced over the census frame
    bounds = cen.agg(
        *[
            F.min(
                F.when(F.col("_cum") * den >= num * F.col("_tot"), F.col("_s"))
            ).alias(f"_b{i}")
            for i, (num, den) in enumerate(fractions)
        ]
    )
    tagged = rows.crossJoin(F.broadcast(bounds))
    bucket = F.lit(len(fractions)).cast("long")
    for i in range(len(fractions) - 1, -1, -1):
        bucket = F.when(F.col("_s") <= F.col(f"_b{i}"), i).otherwise(bucket)
    return (
        tagged.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_weight"),
            F.min("_s").alias("min_score"),
            F.max("_s").alias("max_score"),
        )
        .select(
            "bucket",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_weight").cast("long").alias("n_weight"),
            "min_score",
            "max_score",
        )
    )
