"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

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

from pyspark.sql import DataFrame, functions as F


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
