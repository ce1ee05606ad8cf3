"""Table maintenance: small-file compaction.

A streaming/checkpointed pipeline appending micro-batches (or per-chunk
commits) accretes many small files per sink; at 100 TB the scan-side
cost is real — every file is an open/footer-parse/seek, task scheduling
is per-split, and the NameNode/object-store listing grows unbounded.
Iceberg deployments run `rewrite_data_files`; this is the same
operation for the Parquet layout: rewrite a table into
size-targeted files, preserving rows, schema, and partition layout.

Design notes:
- File count target = ceil(on-disk bytes / target_file_bytes), measured
  from the actual file listing — not row counts, which mispredict width.
- Unpartitioned tables use a round-robin `repartition(n)`: even output
  sizes, one shuffle, no skew sensitivity. Partitioned tables
  `repartition(n, *partition_cols)` so each output task writes into few
  partitions (the maxConcurrentOutputFileWriters path stays cheap);
  dynamic-partition-overwrite keeps the rewrite idempotent per
  partition.
- The rewrite goes through a temp table then an atomic directory swap,
  so a crash mid-compaction leaves the original table intact (the same
  idempotence discipline as plans/checkpoint.py commits).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from ..sources.io import ParquetIO


def _count_partition_dirs(root: str, first_partition_col: str) -> int:
    try:
        return sum(
            1 for d in os.listdir(root) if d.startswith(f"{first_partition_col}=")
        )
    except FileNotFoundError:
        return 0


def table_file_stats(io: ParquetIO, table: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) from the on-disk listing, counting
    the io flavor's own data extension (an OrcIO table holds .orc files
    — counting .parquet there would report 0 and turn compaction into
    a silent permanent no-op)."""
    root = io.location(table)
    ext = getattr(io, "data_ext", ".parquet")
    n, total = 0, 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            if f.endswith(ext):
                n += 1
                total += os.path.getsize(os.path.join(dirpath, f))
    return n, total


def compact_table(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    target_file_bytes: int = 128 << 20,
    partition_by: list[str] | None = None,
    min_files_to_compact: int = 4,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite `table` into ~target-size files. Returns a stats dict
    (files/bytes before and after, whether a rewrite ran). No-op when
    the table already has fewer than `min_files_to_compact` files —
    compaction must be safe to run on a schedule.

    ``cluster_by`` additionally sorts the rewrite on those columns (the
    Parquet-layout analog of Iceberg's sort-order rewrite): an
    unpartitioned table is range-repartitioned then sorted, so each
    output file owns a DISJOINT value range of the cluster key —
    parquet footer min/max then prune whole files for selective scans
    on that key (pytest asserts the per-file disjointness from the real
    footers). A partitioned table keeps its partition-hash layout and
    sorts within tasks: stats tighten per file, pruning still improves,
    but cross-file ranges inside one partition may touch.

    The swap window (two renames) is small but not atomic: a hard kill
    between them leaves the table parked at `<table>__precompact`. The
    next run (or any caller) recovers it automatically below, so a
    scheduled job self-heals instead of no-op'ing on a missing table."""
    if not isinstance(io, ParquetIO):
        raise TypeError(
            "compact_table only understands the Parquet directory layout; "
            "for Iceberg tables run the catalog's rewrite_data_files "
            "procedure instead"
        )
    backup = io.location(f"{table}__precompact")
    if not os.path.isdir(io.location(table)) and os.path.isdir(backup):
        # a previous run died inside the swap window — finish the rollback
        os.rename(backup, io.location(table))
    files_before, bytes_before = table_file_stats(io, table)
    if files_before < min_files_to_compact:
        return {
            "table": table, "rewritten": False,
            "files_before": files_before, "bytes_before": bytes_before,
            "files_after": files_before,
        }
    n_out = max(1, -(-bytes_before // target_file_bytes))  # ceil
    df = io.read(spark, table)
    if partition_by:
        # Hashing only the partition columns would collapse each
        # partition value onto ONE task => one (possibly huge) file per
        # partition, ignoring the size target. A deterministic salt
        # splits big partitions across ~splits tasks; small partitions
        # still coalesce because the pre-write repartition bounds total
        # task count at n_out.
        n_parts = max(1, _count_partition_dirs(io.location(table), partition_by[0]))
        splits = max(1, -(-int(n_out) // n_parts))
        salted = df.withColumn(
            "_compact_salt", (F.rand(seed=42) * splits).cast("int")
        )
        out = salted.repartition(int(n_out), *partition_by, "_compact_salt").drop(
            "_compact_salt"
        )
        if cluster_by:
            out = out.sortWithinPartitions(*partition_by, *cluster_by)
    elif cluster_by:
        out = df.repartitionByRange(int(n_out), *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(int(n_out))

    tmp = f"{table}__compacting"
    io.delete(spark, tmp)
    io.write(out, tmp, mode="overwrite", partition_by=partition_by)

    # swap: the table dir is replaced only after the rewrite fully
    # committed; a crash before the first rename leaves the original
    # intact, and a crash between the renames is recovered at entry
    old, new = io.location(table), io.location(tmp)
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(old, backup)
    try:
        os.rename(new, old)
    except OSError:
        os.rename(backup, old)  # roll back; tmp left for inspection
        raise
    shutil.rmtree(backup, ignore_errors=True)

    files_after, bytes_after = table_file_stats(io, table)
    return {
        "table": table, "rewritten": True,
        "files_before": files_before, "bytes_before": bytes_before,
        "files_after": files_after, "bytes_after": bytes_after,
    }
