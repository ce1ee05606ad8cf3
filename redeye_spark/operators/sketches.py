"""Mergeable distinct-count sketches: approximate (Apache DataSketches
HLL via Spark's built-in hll_sketch_agg / hll_union_agg /
hll_sketch_estimate) and EXACT (dense-bitmap partials via
bitmap_construct_agg / bitmap_or_agg / bitmap_count).

The 100 TB distinct-count path: exact count(DISTINCT x) buffers every
value per group; the HLL sketch is O(2^lgK) bytes per group regardless
of cardinality, and — the part that matters operationally — sketches
MERGE. A daily pipeline persists one sketch row per (group, day) and
answers "distincts over any date range" by unioning sketches, never
rescanning the raw data. Both aggregates are JVM-side with map-side
partial aggregation; nothing here touches Python.

Accuracy: relative standard error ~= 1.04 / sqrt(2^lgK) (~1.6% at the
default lgK=12). Hashing is deterministic, but the ESTIMATE can move
by a fraction of a percent with partitioning/merge order (DataSketches
HLL unions transition sparse->dense representations at
order-dependent points), so downstream logic must treat these as
approximate counts, never join keys. Pytest pins them against exact
counts within an error band rather than DuckDB-hashing them (DuckDB's
approx_count_distinct is a different sketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def distinct_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) per group over value_col — the
    persistable partial. Store this per ingest chunk/partition and
    merge later; never re-aggregate raw data twice."""
    groups = group_cols or []
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll")
    return df.groupBy(*groups).agg(agg) if groups else df.agg(agg)


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "hll",
) -> DataFrame:
    """Union previously-built sketches per group and estimate: the
    incremental-refresh read path. allowDifferentLgConfigK lets chunks
    built under different precisions still merge (union downgrades to
    the coarser K)."""
    groups = group_cols or []
    est = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col), F.lit(True))
    ).alias("n_distinct")
    out = sketches.groupBy(*groups).agg(est) if groups else sketches.agg(est)
    return out


def distinct_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Direct one-shot estimate per group (sketch + estimate in one
    aggregate) — the drop-in for count(DISTINCT x) when ~1.6% error is
    acceptable and the group count is huge."""
    groups = group_cols or []
    est = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
    ).alias("n_distinct")
    return df.groupBy(*groups).agg(est) if groups else df.agg(est)


# ---------------------------------------------------------------------------
# Exact mergeable distinct counting over integer keys: dense bitmaps.
#
# The HLL path above trades ~1.6% error for O(4 KB)/group state. When the
# key domain is integers (user ids, order keys), Spark's bitmap family
# gives the same persist-partials-then-merge operational shape with EXACT
# answers: bitmap_bucket_number(v) selects a 32768-bit bucket,
# bitmap_bit_position(v) a bit inside it, bitmap_construct_agg ORs the
# bits, bitmap_or_agg merges previously-built bitmaps, bitmap_count pops
# them. State is 4 KB per TOUCHED bucket per group — proportional to the
# occupied key range, not the row count, and each (group, bucket) partial
# is independently shuffleable, so one giant group's bitmap build
# parallelizes across its buckets. Being exact, the result hash-matches
# count(DISTINCT x) in DuckDB — unlike the HLL estimates, these can be
# oracled, joined on, and diffed.
# ---------------------------------------------------------------------------


def bitmap_distinct_partials(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    chunk_col: str | None = None,
) -> DataFrame:
    """One 4 KB bitmap per (group, chunk, bucket) over value_col — the
    persistable EXACT partial. chunk_col models independent ingest
    batches (a daily pipeline stores one partial set per day); pass None
    for a single-build. value_col must be integral and > 0."""
    groups = list(group_cols or [])
    if chunk_col is not None:
        groups = groups + [chunk_col]
    v = F.col(value_col)
    return (
        df.select(*groups,
                  F.bitmap_bucket_number(v).alias("_bucket"),
                  F.bitmap_bit_position(v).alias("_pos"))
        .groupBy(*groups, "_bucket")
        .agg(F.bitmap_construct_agg(F.col("_pos")).alias("bitmap"))
    )


def bitmap_merge_distinct(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    bitmap_col: str = "bitmap",
    bucket_col: str = "_bucket",
) -> DataFrame:
    """Merge bitmap partials (across chunks/days) and count: OR per
    (group, bucket) first — each bucket merge is an independent 4 KB
    task — then sum popcounts per group. Exact at any scale; the merge
    never revisits raw rows."""
    groups = list(group_cols or [])
    per_bucket = (
        partials.groupBy(*groups, bucket_col)
        .agg(F.bitmap_count(F.bitmap_or_agg(F.col(bitmap_col))).alias("_n"))
    )
    agg = F.sum("_n").alias("n_distinct")
    out = per_bucket.groupBy(*groups).agg(agg) if groups else per_bucket.agg(agg)
    return out


def bitmap_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-shot exact distinct via the bitmap path — the drop-in for
    count(DISTINCT x) whose shuffle carries 4 KB bitmaps instead of
    every raw value (wins when values-per-group >> occupied buckets)."""
    partials = bitmap_distinct_partials(df, value_col, group_cols)
    return bitmap_merge_distinct(partials, group_cols)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter counting (Cormode & Muthu-
# krishnan 2005, public). Where HLL answers "how many distinct", CMS
# answers "how often does THIS value occur" in O(depth x width) ints per
# group regardless of key cardinality: depth independent hash rows, each
# value incrementing one bucket per row; the point estimate is the MIN
# over its depth cells (always >= truth; overestimates come only from
# collisions). Cells are plain integer counts, so partials ADD across
# shards/days, and — unlike the HLL estimate — every cell and every
# estimate is a deterministic function of the md5 hash family: a SQL
# oracle pins the sketch AND its collision overestimates exactly.
#
# Scale shape: build = explode(depth positions) feeding a same-stage
# partial agg (shuffle carries <= depth x width cells per task);
# estimation probes join the <= 1024-row cell table (broadcast).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(value: Column, row: int, seed: int = 42) -> Column:
    """Bucket 0..CMS_WIDTH-1 for hash row `row`: first 2 md5 nibbles of
    the row-salted value (the engine-portable discipline of
    sampling.hash_bucket)."""
    key = F.concat(F.lit(f"cms{seed}:{row}:"), value.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")


def cms_bucket_sql(value_expr: str, row: int, seed: int = 42) -> str:
    """The identical bucket arithmetic in portable SQL."""
    h = f"md5('cms{seed}:{row}:' || CAST({value_expr} AS VARCHAR))"
    return (
        f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


def cms_cells(df: DataFrame, value_col: str, seed: int = 42) -> DataFrame:
    """(row, bucket, cnt) — the sketch as <= depth x width integer
    cells. Mergeable: cells from different shards/chunks ADD."""
    v = F.col(value_col)
    hits = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"), cms_bucket(v, j, seed).alias("bucket")
                )
                for j in range(CMS_DEPTH)
            ])
        ).alias("h")
    )
    return (
        hits.select(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame, cells: DataFrame, value_col: str, seed: int = 42
) -> DataFrame:
    """(value_col, est) — point estimates for each DISTINCT probe value:
    min over the depth cells (missing cell -> 0). The cell table
    broadcasts; the probe side never shuffles rows, only its distinct
    values."""
    v = F.col(value_col)
    lookups = probes.select(value_col).distinct().select(
        value_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"), cms_bucket(v, j, seed).alias("bucket")
                )
                for j in range(CMS_DEPTH)
            ])
        ).alias("h"),
    ).select(value_col, F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
    return (
        lookups.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Mergeable quantile histogram: the fixed-grid equi-width histogram
# sketch. Where CMS answers point frequencies, this answers ORDER
# statistics (p50/p90/p99) from <= |bins| integer cells per group.
# Values land on the integer grid once (the house quantize-once
# discipline), bins are a pure integer floor-division of that grid, so
# cells ADD across shards/days and — unlike t-digest/KLL, whose
# centroids depend on insertion order — the sketch AND every quantile
# read from it are deterministic: a SQL oracle pins both exactly.
#
# Scale shape: build = one projection feeding a same-stage partial agg
# (shuffle carries <= |bins| cells per task, never values); quantile
# reads run a window over the CELLS frame only (bins-sized, bounded by
# value-range/width, not by corpus size).
# ---------------------------------------------------------------------------


def hist_cells(df: DataFrame, value: Column, width: int) -> DataFrame:
    """(bin, cnt) — equi-width histogram cells over an integer-grid
    value. bin = floor(value / width) via pure int64 arithmetic
    (pmod-corrected division: exact, negative-safe, engine-portable)."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    w = F.lit(width).cast("long")
    v = value.cast("long")
    bin_ = ((v - ((v % w + w) % w)) / w).cast("long")
    return (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*cells: DataFrame) -> DataFrame:
    """Shard cells ADD: union + re-aggregate (bins-sized shuffle)."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, cells)
    return u.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))


def hist_quantiles(
    cells: DataFrame, width: int, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    max_census_rows: int | None = None,
) -> DataFrame:
    """(q, bin, lo, hi, est) — lower-quantile bins from the cells: the
    smallest bin whose cumulative count reaches ceil(q*N). lo/hi are
    the bin's exact integer grid edges; est is its midpoint (the one
    float step, identical expression order in the oracle).

    The window sorts the CELLS frame (bins-sized) — acceptable at any
    corpus scale because cell cardinality is value-range/width, not
    row count. That claim is GUARDED: a `width` too fine for the data
    would silently single-partition the walk at scale, so the cells
    census is asserted under `max_census_rows` (default
    aggregate.MAX_CENSUS_ROWS) before the window runs."""
    from pyspark.sql import Window

    from .aggregate import MAX_CENSUS_ROWS, assert_census_bounded

    assert_census_bounded(
        cells, max_census_rows or MAX_CENSUS_ROWS,
        "widen the histogram `width` so the bin census stays small",
    )
    cum_w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot_w = Window.partitionBy()
    c = cells.select(
        "bin", "cnt",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(tot_w).alias("n"),
    )
    x = c.select(
        "bin", "cum", "n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("target", F.ceil(F.col("q") * F.col("n").cast("double")))
    hit = x.filter(F.col("cum") >= F.col("target"))
    out = hit.groupBy("q").agg(F.min("bin").alias("bin"))
    w = F.lit(width).cast("long")
    lo = F.col("bin") * w
    hi = lo + w - F.lit(1).cast("long")
    return out.select(
        "q",
        "bin",
        lo.alias("lo"),
        hi.alias("hi"),
        ((lo.cast("double") + hi.cast("double")) / F.lit(2.0)).alias("est"),
    )
