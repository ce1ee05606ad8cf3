"""Rendezvous (HRW) consistent sharding — stable work placement.

Incremental corpus pipelines need a STABLE document -> shard mapping:
when capacity grows from N to N+k shards, only the documents that move
to the NEW shards may move (minimal churn) — a mod-N mapping instead
reshuffles ~everything, invalidating every shard-local artifact
(dedup indexes, caches, sketches). Highest-random-weight hashing gives
exactly that: shard(doc) = argmax_s h(doc, s); weights of existing
shards never change when shards are added, so a document moves ONLY
when a new shard wins it.

The weight hash is portable integer arithmetic (the repo's exactness
contract — replayable in any engine, no engine-specific hash):

    dm = doc_key mod (2^31 - 1)                     # overflow guard
    h1 = (dm * 2654435761 + (s+1) * 40503) mod (2^31 - 1)
    w  = (h1*h1 + s) mod 1000003                    # h1^2 < 2^62, exact

All intermediates fit int64 for ANY doc_key (the mod-first guard), so
ANSI Spark never throws and the DuckDB oracle reproduces every weight.
Assignment is a pure codegen projection (array of shard weights ->
struct-max argmax with smallest-shard tie-break) — zero shuffle, which
is the point: placement must be computable row-locally on any executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

M31 = 2147483647
A = 2654435761
B = 40503
W = 1000003


def _weight(dm, s: int):
    h1 = (dm * F.lit(A) + F.lit((s + 1) * B)) % F.lit(M31)
    return (h1 * h1 + F.lit(s)) % F.lit(W)


def hrw_shard_expr(id_col: str, n_shards: int):
    """Column expression: the winning shard for this row — argmax of
    the per-shard weights, ties to the smallest shard id (struct max
    over (weight, -shard))."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    dm = F.pmod(F.col(id_col).cast("long"), F.lit(M31))
    best = F.greatest(
        *[
            F.struct(
                _weight(dm, s).alias("w"), F.lit(-s).alias("neg_s")
            )
            for s in range(n_shards)
        ]
    ) if n_shards > 1 else F.struct(
        _weight(dm, 0).alias("w"), F.lit(0).alias("neg_s")
    )
    return (-best["neg_s"]).cast("long")


def hrw_assign(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """df + `shard` column — zero-shuffle codegen projection."""
    return df.withColumn("shard", hrw_shard_expr(id_col, n_shards))


def shard_churn(
    df: DataFrame, id_col: str, n_before: int, n_after: int
) -> DataFrame:
    """(status, n) for the N -> M resize: 'stayed', 'moved_to_new'
    (won by a shard id >= n_before), 'moved_between_old'. HRW
    guarantees moved_between_old == 0 — existing shards' weights are
    unchanged by the resize, so an old shard can't newly beat another
    old shard. The report proves it corpus-wide with one partial
    aggregate."""
    if n_after <= n_before:
        raise ValueError("shard_churn reports a grow: n_after > n_before")
    before = hrw_shard_expr(id_col, n_before)
    after = hrw_shard_expr(id_col, n_after)
    status = (
        F.when(before == after, "stayed")
        .when(after >= n_before, "moved_to_new")
        .otherwise("moved_between_old")
    )
    return (
        df.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
