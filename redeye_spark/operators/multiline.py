"""Multiline log assembly: fold continuation lines (stack-trace frames,
wrapped messages — anything matching `cont_re`) into their preceding
anchor line, the Logstash multiline-codec semantic the fixed-format
parsers assume has already happened upstream.

Spark-first shape (no Python, no iteration):

  1. anchor_id = running last(id WHERE not continuation) over a window
     PARTITION BY group ORDER BY id — every line learns which anchor
     owns it (same running-last trick as operators/asof.py).
  2. groupBy(group, anchor_id) -> collect_list(struct(id, line)) ->
     array_sort -> transform -> array_join: the block reassembled in
     line order, entirely in JVM expressions.

Scale: the window is scoped by `group_col` (the file / source / shard a
line belongs to) — multiline semantics only make sense within one
ordered stream anyway, and that scoping is exactly what keeps the sort
partition-sized instead of global. A single pathological file still
serializes on one reducer; that is inherent to ordered assembly.

Caveat (documented, inherent to any distributed multiline): lines
before the first anchor of a group have no owner; they are emitted as
one orphan block with anchor_id NULL so nothing is silently dropped —
route it to dead-letter like the parser's error taxonomy does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_CONT_RE = r"^\s"


def assemble_multiline(
    df: DataFrame,
    group_col: str,
    id_col: str,
    line_col: str = "line",
    cont_re: str = DEFAULT_CONT_RE,
    sep: str = "\n",
) -> DataFrame:
    """Collapse continuation lines into (group, anchor_id, n_lines,
    assembled) blocks. `id_col` must sort in arrival order within a
    group — a file offset or numeric line number. It is deliberately
    required (no default): this repo's string doc ids ("ev-10" < "ev-9")
    sort lexicographically and would interleave blocks silently."""
    is_anchor = ~F.col(line_col).rlike(cont_re)
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    owned = df.withColumn(
        "_anchor_id",
        F.last(F.when(is_anchor, F.col(id_col)), ignorenulls=True).over(w),
    )
    ordered_lines = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("i"),
                                             F.col(line_col).alias("l")))),
        lambda s: s["l"],
    )
    return (
        owned.groupBy(F.col(group_col), F.col("_anchor_id").alias("anchor_id"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(ordered_lines, sep).alias("assembled"),
        )
    )
