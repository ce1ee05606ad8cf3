"""Snapshot diff: change detection between two versions of a table.

The data-pipeline primitive behind incremental refresh, CDC backfill
validation, and SCD auditing: given OLD and NEW snapshots keyed by
`key_cols`, emit one row per changed key labeled insert / delete /
update (unchanged keys are dropped — at 100 TB the diff output is the
change set, a tiny fraction of the table).

Spark-first plan: each side is reduced to (keys, xxhash64(compare
cols)) at scan time — the FULL OUTER shuffle then moves ~24 bytes per
row instead of whole rows, the same bytes-discipline as hash-mode
exact dedup. The join itself is a plain hash-partitioned equi-join:
AQE handles skew, and no row amplification is possible (keys are
unique per side — asserted cheaply via the hash aggregate when
`check_unique=True`).

Null discipline: the digest hashes per-column isNull flags alongside
the values (xxhash64 alone SKIPS null inputs, which would let
`('x', NULL)` collide with `(NULL, 'x')`), so every NULL transition is
detected; key columns may not contain NULL (refused — NULL keys never
equi-join, a NULL-keyed row would always diff as insert+delete).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    check_unique: bool = True,
) -> DataFrame:
    """(key_cols..., change) with change in {'insert','delete','update'}.

    compare_cols defaults to every shared non-key column. Column sets
    may differ between snapshots (schema evolution) — only the shared
    compare columns participate, so adding a column to NEW does not
    mark every row updated.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    shared = [c for c in old.columns if c in set(new.columns)]
    if compare_cols is None:
        compare_cols = [c for c in shared if c not in set(key_cols)]
    missing = [c for c in list(key_cols) + list(compare_cols) if c not in shared]
    if missing:
        raise ValueError(f"columns {missing} not present in both snapshots")

    null_key = functools.reduce(
        operator.or_, [F.col(c).isNull() for c in key_cols]
    )

    def guarded_key(c: str, side: str):
        # NULL-key refusal must hold on EVERY path, including
        # check_unique=False (NULL keys never equi-join, so an unchanged
        # NULL-keyed row would silently diff as insert+delete). This
        # guard is a runtime expression INSIDE the key projection, so
        # plan construction stays lazy and the check costs nothing
        # beyond the scan.
        return (
            F.when(F.col(c).isNotNull(), F.col(c))
            .otherwise(F.raise_error(F.lit(
                f"snapshot_diff: NULL key in {c!r} ({side} snapshot) — "
                "keys must be non-NULL"
            )))
            .alias(c)
        )

    def digest(df: DataFrame, side: str) -> DataFrame:
        # xxhash64 SKIPS null inputs (the seed passes through), so
        # hashing values alone would let ('x', NULL) collide with
        # (NULL, 'x'); the per-column isNull flags always contribute,
        # making the digest injective w.r.t. the NULL pattern.
        hash_inputs = [F.col(c) for c in compare_cols] + [
            F.col(c).isNull() for c in compare_cols
        ]
        d = df.select(
            *[guarded_key(c, side) for c in key_cols],
            F.xxhash64(*hash_inputs).alias(f"_h_{side}")
            if compare_cols else F.lit(0).alias(f"_h_{side}"),
        )
        if check_unique:
            # a dup key would make the diff ambiguous (which version is
            # "the" row?); NULL keys are covered by the runtime guard on
            # every path, so this probe only checks uniqueness
            dup = (
                d.groupBy(*key_cols).count().filter("count > 1").limit(1)
            )
            if dup.count() > 0:
                raise ValueError(
                    f"{side} snapshot has duplicate keys on {key_cols} — "
                    "snapshot_diff needs unique non-NULL keys"
                )
        return d

    o = digest(old, "old")
    n = digest(new, "new")
    joined = o.join(n, on=list(key_cols), how="full_outer")
    return (
        joined.filter(
            F.col("_h_old").isNull()
            | F.col("_h_new").isNull()
            | (F.col("_h_old") != F.col("_h_new"))
        )
        .select(
            *key_cols,
            F.when(F.col("_h_old").isNull(), F.lit("insert"))
            .when(F.col("_h_new").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change"),
        )
    )
