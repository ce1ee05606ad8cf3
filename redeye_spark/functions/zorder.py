"""Z-order (Morton) interleaving for multi-dimensional file clustering.

`compact_table(cluster_by=...)` range-partitions and sorts a rewrite on
its cluster key so parquet footer min/max prune files for scans on that
key — but a single sort key only skips on ONE dimension. Z-ordering
interleaves the bits of several dimensions into one value whose sort
order preserves locality in EVERY input dimension, so one clustered
rewrite serves selective scans on any of them (the same trick behind
Delta OPTIMIZE ZORDER BY / Iceberg's zorder sort order).

Pure JVM bit arithmetic (shift/and/or expressions, whole-stage codegen)
— the z-value column is computed at scan speed; the caller materializes
it with `with_zorder` and passes it to `compact_table(cluster_by=
["_z"])`. bits=16 per dimension keeps 2-3 dimensions inside a long with
room to spare (16*3 = 48 bits).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low `bits` of each column into one long.

    Inputs must be non-negative integers; values are masked to `bits`
    (callers bucket/scale real columns into [0, 2^bits) first — rank or
    range-bucket for skewed/continuous dimensions). Bit b of column i
    lands at position b * n_cols + i, so iterating z-order visits the
    dimensions' bits round-robin from least significant upward.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_value needs at least one column")
    if bits < 1 or bits * n > 63:
        raise ValueError(f"bits * n_cols must fit a signed long, got {bits}*{n}")
    terms: list[Column] = []
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    # Column.__or__ is LOGICAL or (boolean); bit positions are disjoint
    # so bitwiseOR == integer addition here, but keep the bit semantics
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zorder")


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "_z"
) -> DataFrame:
    """df + a z-value column over `cols` — feed `out_col` to
    compact_table(cluster_by=[out_col]) for multi-dim file skipping."""
    return df.withColumn(out_col, zorder_value(cols, bits))


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The IDENTICAL interleave as portable ANSI arithmetic
    (floor-div/mod/multiply — no bit operators), so a DuckDB oracle can
    replicate zorder_value bit-for-bit."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                f"((CAST({c} AS BIGINT) // {1 << b}) % 2) * {1 << (b * n + i)}"
            )
    return "(" + " + ".join(terms) + ")"
