"""Table maintenance: small-file compaction, sort-order rewrite, upsert.

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

import contextlib
import functools
import operator
import os
import shutil
from urllib.parse import unquote

from pyspark.sql import SparkSession, functions as F

from ..sources.io import ParquetIO


def _count_partition_dirs(root: str, first_partition_col: str) -> int:
    try:
        return sum(
            1 for d in os.listdir(root) if d.startswith(f"{first_partition_col}=")
        )
    except FileNotFoundError:
        return 0


def _partition_dirs(root: str, partition_col: str) -> dict[str, str]:
    """{logical partition value -> actual dir name} for one partition
    column, from the REAL listing. Spark hive-escapes special characters
    in partition dir names (':' -> '%3A', etc.), so deriving a dir name
    with f"{col}={value}" silently misses those partitions — the r4
    ADVICE-high bug: delete_keys 'succeeded' while the escaped dir (and
    the supposedly-erased rows) survived. unquote() inverts Spark's
    ExternalCatalogUtils.escapePathName (percent-hex escaping)."""
    prefix = f"{partition_col}="
    out: dict[str, str] = {}
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return out
    for d in names:
        if d.startswith(prefix) and os.path.isdir(os.path.join(root, d)):
            out[unquote(d[len(prefix):])] = d
    return out


def _null_key_predicate(key_cols: list[str]):
    # Column API, not an f-string filter: names needing backticks
    # (spaces, dots, dashes) would make the SQL string throw or bind to
    # the wrong expression.
    return functools.reduce(operator.or_, [F.col(c).isNull() for c in key_cols])


@contextlib.contextmanager
def _maintenance_lock(io: ParquetIO, table: str):
    """Single-maintenance-writer guard: compact/upsert/delete on one
    table share the `__precompact` backup path and rename the live table
    dir, so two concurrent ops (a scheduled compaction racing a CDC
    upsert stream) can destroy each other's backup mid-swap. An O_EXCL
    lock file under the warehouse serializes them; a lock whose owner
    pid is dead is stolen (crash leftovers must not wedge scheduled
    jobs). Single-host semantics — on a shared object store, use the
    catalog's own transaction/locking layer instead."""
    lock_path = io.location(table) + ".__maintenance_lock"
    os.makedirs(os.path.dirname(lock_path), exist_ok=True)
    for _attempt in range(2):
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                holder = int(open(lock_path).read().strip() or "0")
            except (OSError, ValueError):
                holder = 0
            alive = False
            if holder > 0:
                try:
                    os.kill(holder, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True
            if alive:
                raise RuntimeError(
                    f"table {table!r} is under maintenance by pid {holder} "
                    f"(lock {lock_path}) — maintenance ops must not run "
                    "concurrently on one table"
                )
            # Steal ATOMICALLY via rename: a bare unlink would race — two
            # stealers both classify the lock stale, the slower unlink
            # then deletes the faster one's freshly ACQUIRED lock and
            # both proceed. rename succeeds for exactly one process; the
            # losers fall through to the O_EXCL retry and lose cleanly.
            stale = f"{lock_path}.stale.{os.getpid()}"
            try:
                os.rename(lock_path, stale)
            except FileNotFoundError:
                pass  # someone else stole it first; retry the create
            else:
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(stale)
    else:
        raise RuntimeError(f"could not acquire maintenance lock {lock_path}")
    try:
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(lock_path)


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


def _recover_parked_table(io: ParquetIO, table: str) -> None:
    """Finish the rollback of a run that died inside the swap window
    (table dir missing, contents parked at __precompact)."""
    backup = io.location(f"{table}__precompact")
    if not os.path.isdir(io.location(table)) and os.path.isdir(backup):
        os.rename(backup, io.location(table))


def _swap_in(io: ParquetIO, table: str, tmp: str) -> None:
    """Replace the table dir with the fully-written tmp table via a
    backup rename pair. A crash before the first rename leaves the
    original intact; between the renames, _recover_parked_table (run at
    entry by every maintenance op) restores it. ONE shared
    implementation — compaction and upsert must never drift on this."""
    backup = io.location(f"{table}__precompact")
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(io.location(table), backup)
    try:
        os.rename(io.location(tmp), io.location(table))
    except OSError:
        os.rename(backup, io.location(table))  # roll back; tmp left for inspection
        raise
    shutil.rmtree(backup, ignore_errors=True)


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
    with _maintenance_lock(io, table):
        return _compact_locked(
            spark, io, table, target_file_bytes, partition_by,
            min_files_to_compact, cluster_by,
        )


def _compact_locked(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    target_file_bytes: int,
    partition_by: list[str] | None,
    min_files_to_compact: int,
    cluster_by: list[str] | None,
) -> dict:
    _recover_parked_table(io, table)
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

    _swap_in(io, table, tmp)

    files_after, bytes_after = table_file_stats(io, table)
    return {
        "table": table, "rewritten": True,
        "files_before": files_before, "bytes_before": bytes_before,
        "files_after": files_after, "bytes_after": bytes_after,
    }


def upsert_table(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    updates,
    key_cols: list[str],
    partition_by: list[str] | None = None,
    order_col: str | None = None,
    max_touched_partitions: int = 10_000,
) -> dict:
    """Latest-wins MERGE INTO for the Parquet layout (the Iceberg
    `MERGE INTO t USING u ON keys WHEN MATCHED UPDATE WHEN NOT MATCHED
    INSERT` analog): rows of `updates` replace same-key rows of
    `table`, new keys append.

    - `order_col`: when updates may carry several versions of one key,
      the row with the greatest order_col wins; without it, updates
      must be unique per key (asserted — silently picking one would be
      a correctness lottery).
    - Partitioned tables must have `partition_by ⊆ key_cols` (a key
      that could move partitions would leave its stale row behind in an
      untouched partition — refused rather than silently wrong). Only
      the partitions PRESENT in updates are rewritten: the merge reads
      just those partitions (semi-join prunes the scan), and the write
      commits through dynamic partition overwrite, so a crash before
      job commit leaves the table untouched and a re-run is idempotent
      (merging already-applied updates is a no-op). The merged slice is
      localCheckpoint()ed first — Spark refuses to overwrite a path the
      plan still reads, and the checkpoint truncates that lineage; the
      materialized slice is bounded by the touched partitions.
    - Unpartitioned tables rewrite through a temp table + the same
      atomic directory swap compaction uses (crash-safe, self-healing
      via the __precompact recovery path there).
    """
    from pyspark.sql import Window

    if not isinstance(io, ParquetIO):
        raise TypeError(
            "upsert_table only understands the Parquet directory layout; "
            "Iceberg tables have native MERGE INTO"
        )
    if partition_by and not set(partition_by) <= set(key_cols):
        raise ValueError(
            f"partition columns {partition_by} must be a subset of key "
            f"columns {key_cols}: a key that moves partitions would leave "
            "a stale duplicate behind"
        )
    # NULL keys never equi-join: a NULL-keyed update would APPEND next
    # to the row it meant to replace, and a NULL partition value would
    # make dynamic overwrite REPLACE that partition while the semi-join
    # failed to carry its existing rows — both silently corrupting.
    null_key = updates.filter(_null_key_predicate(key_cols)).limit(1)
    if null_key.count() > 0:
        raise ValueError(
            f"updates contain NULL in key columns {key_cols} — NULL keys "
            "cannot be matched for replacement"
        )
    if order_col is not None:
        # tiebreak by the REMAINING row content (desc) so two update
        # rows sharing (key, order_col) resolve identically on every
        # run/retry — order_col alone is not a total order and
        # row_number over a partial order is a per-run lottery
        others = [c for c in updates.columns
                  if c not in key_cols and c != order_col]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc_nulls_last() for c in others]
        )
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        dup = updates.groupBy(*key_cols).count().filter("count > 1").limit(1)
        if dup.count() > 0:
            raise ValueError(
                "updates carry multiple rows per key and no order_col — "
                "latest-wins needs an ordering"
            )
    # the probes below (count, touched partitions) and the merge each
    # re-execute the updates lineage otherwise — on the CDC stream path
    # that is ~5 scans per micro-batch
    updates = updates.persist()
    try:
        with _maintenance_lock(io, table):
            # crash-window recovery (kill between the two swap renames
            # parks the table at __precompact) must run INSIDE the lock:
            # outside it, this would "recover" another process's
            # in-flight swap mid-rename and wreck both operations
            _recover_parked_table(io, table)
            return _apply_upsert(
                spark, io, table, updates, key_cols, partition_by,
                max_touched_partitions,
            )
    finally:
        updates.unpersist()


def _apply_upsert(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    updates,
    key_cols: list[str],
    partition_by: list[str] | None,
    max_touched_partitions: int,
) -> dict:
    n_updates = updates.count()
    if not os.path.isdir(io.location(table)):
        io.write(updates, table, mode="overwrite", partition_by=partition_by)
        return {"table": table, "rows_upserted": n_updates, "created": True}

    existing = io.read(spark, table)
    if partition_by:
        touched = updates.select(*partition_by).distinct()
        n_touched = touched.limit(max_touched_partitions + 1).count()
        if n_touched > max_touched_partitions:
            raise ValueError(
                f"updates touch > {max_touched_partitions} partitions — "
                "that is a rewrite, use compact/overwrite instead"
            )
        base = existing.join(F.broadcast(touched), partition_by, "left_semi")
        merged = (
            base.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
            .unionByName(updates)
            .localCheckpoint()  # cut lineage: can't overwrite a read path
        )
        io.write(merged, table, mode="overwrite_partitions", partition_by=partition_by)
        return {
            "table": table, "rows_upserted": n_updates,
            "partitions_touched": n_touched, "created": False,
        }

    merged = existing.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    ).unionByName(updates)
    tmp = f"{table}__upserting"
    io.delete(spark, tmp)
    io.write(merged, tmp, mode="overwrite")
    _swap_in(io, table, tmp)
    return {"table": table, "rows_upserted": n_updates, "created": False}


def expire_partitions(
    io: ParquetIO,
    table: str,
    partition_col: str,
    keep_values: list[str] | None = None,
    drop_values: list[str] | None = None,
) -> dict:
    """Retention/TTL expiry for a partitioned table: physically delete
    whole partition directories (the Iceberg expire/DROP PARTITION
    analog) — a metadata-scale operation, no data is read or rewritten.
    Exactly one of keep_values / drop_values must be given; values are
    LOGICAL partition values — the listing is matched through Spark's
    hive escaping (':' is stored as '%3A'), so exotic values expire
    correctly. Removing a directory is atomic per partition and
    idempotent — re-running after a crash just deletes the remainder.
    Returns dropped/kept/failed lists: a partition whose rmtree did not
    actually remove it (permissions, open handles) lands in `failed`,
    never in `dropped` — scheduled retention jobs must log the truth."""
    if (keep_values is None) == (drop_values is None):
        raise ValueError("pass exactly one of keep_values / drop_values")
    with _maintenance_lock(io, table):
        return _expire_locked(io, table, partition_col, keep_values, drop_values)


def _expire_locked(
    io: ParquetIO,
    table: str,
    partition_col: str,
    keep_values: list[str] | None,
    drop_values: list[str] | None,
) -> dict:
    # under the same per-table lock as compact/upsert/delete: an
    # unlocked retention drop racing a locked compact would be silently
    # UNDONE when the compact swaps in its rewrite built from the
    # pre-drop read — the retention job would log success while the
    # expired data came back
    root = io.location(table)
    dirs = _partition_dirs(root, partition_col)
    if not dirs:
        raise ValueError(
            f"table {table!r} has no {partition_col}= partition dirs — "
            "wrong column or unpartitioned table"
        )
    present = sorted(dirs)
    if keep_values is not None:
        keep = {str(v) for v in keep_values}
        to_drop = [v for v in present if v not in keep]
    else:
        drop = {str(v) for v in drop_values}
        to_drop = [v for v in present if v in drop]
    dropped, failed = [], []
    for v in to_drop:
        path = os.path.join(root, dirs[v])
        shutil.rmtree(path, ignore_errors=True)
        (failed if os.path.isdir(path) else dropped).append(v)
    return {
        "table": table,
        "partition_col": partition_col,
        "dropped": dropped,
        "failed": failed,
        "kept": [v for v in present if v not in set(to_drop)],
    }


def delete_keys(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    keys,
    key_cols: list[str],
    partition_by: list[str] | None = None,
    max_touched_partitions: int = 10_000,
) -> dict:
    """Row-level delete by key (the GDPR/right-to-erasure shape; the
    Iceberg `DELETE FROM t WHERE key IN (...)` analog): rows of `table`
    matching any row of the `keys` frame on `key_cols` are removed via
    an anti-join rewrite. Partitioned tables with partition_by ⊆
    key_cols rewrite ONLY the partitions named in the keys (broadcast
    semi-join pruned read + dynamic-partition-overwrite commit,
    idempotent like upsert, capped at max_touched_partitions — past
    that it is a table rewrite and is refused); otherwise the whole
    table rewrites through the crash-safe swap. NULL key values are
    refused — they never equi-join, so the 'deletion' would silently
    keep the row.

    Erasure is VERIFIED, not assumed: after the rewrite the touched
    slice is re-read and semi-joined against the keys; any survivor
    (e.g. a partition directory the cleanup failed to remove) raises
    instead of returning success — this is the path compliance jobs
    trust."""
    if not isinstance(io, ParquetIO):
        raise TypeError("delete_keys only understands the Parquet directory layout")
    null_key = keys.filter(_null_key_predicate(key_cols)).limit(1)
    if null_key.count() > 0:
        raise ValueError(
            f"keys contain NULL in {key_cols} — NULL keys never match, the "
            "row would silently survive the delete"
        )
    keys = keys.select(*key_cols).distinct().persist()
    try:
        with _maintenance_lock(io, table):
            _recover_parked_table(io, table)
            return _apply_delete(
                spark, io, table, keys, key_cols, partition_by,
                max_touched_partitions,
            )
    finally:
        keys.unpersist()


def _apply_delete(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    keys,
    key_cols: list[str],
    partition_by: list[str] | None,
    max_touched_partitions: int,
) -> dict:
    n_keys = keys.count()
    existing = io.read(spark, table)
    if partition_by and len(partition_by) == 1 \
            and set(partition_by) <= set(key_cols):
        (pcol,) = partition_by
        touched = keys.select(pcol).distinct()
        n_touched = touched.limit(max_touched_partitions + 1).count()
        if n_touched > max_touched_partitions:
            raise ValueError(
                f"keys touch > {max_touched_partitions} partitions — that "
                "is a table rewrite; call without partition pruning or "
                "raise max_touched_partitions"
            )
        base = existing.join(F.broadcast(touched), [pcol], "left_semi")
        remaining = base.join(keys, key_cols, "left_anti").localCheckpoint()
        io.write(remaining, table, mode="overwrite_partitions",
                 partition_by=partition_by)
        # dynamic overwrite only replaces partitions PRESENT in the
        # output: a partition whose rows were ALL deleted emits no rows,
        # so its old directory would silently survive with the
        # supposedly-deleted data — remove emptied partitions explicitly.
        # Matching goes through the REAL directory listing (hive-escaped
        # names unescaped), never a formatted f"{col}={value}" guess:
        # values like '2024:01' live in dirs like 'p=2024%3A01'.
        emptied = [
            r[0]
            for r in touched.join(
                remaining.select(pcol).distinct(), [pcol], "left_anti"
            ).collect()  # bounded: <= n_touched <= max_touched_partitions
        ]
        dirs = _partition_dirs(io.location(table), pcol)
        for v in emptied:
            d = dirs.get(str(v))
            if d is not None:
                shutil.rmtree(os.path.join(io.location(table), d),
                              ignore_errors=True)
        # read-back proof of erasure over the touched slice only; a
        # delete that emptied EVERY partition leaves no data files, and
        # reading an empty directory is a schema-inference error, not a
        # survivor — that case is proven erased by the empty listing
        if table_file_stats(io, table)[0] == 0:
            survivors = 0
        else:
            survivors = (
                io.read(spark, table)
                .join(F.broadcast(touched), [pcol], "left_semi")
                .join(keys, key_cols, "left_semi")
                .limit(1)
                .count()
            )
        if survivors:
            raise RuntimeError(
                f"delete_keys on {table!r}: deleted keys still present "
                "after rewrite — erasure NOT complete (check partition-dir "
                "permissions/open handles)"
            )
        return {
            "table": table, "keys_requested": n_keys,
            "partitions_touched": n_touched, "scope": "partitions",
        }
    remaining = existing.join(keys, key_cols, "left_anti")
    tmp = f"{table}__deleting"
    io.delete(spark, tmp)
    io.write(remaining, tmp, mode="overwrite", partition_by=partition_by)
    _swap_in(io, table, tmp)
    return {"table": table, "keys_requested": n_keys, "scope": "table"}
