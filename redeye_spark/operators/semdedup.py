"""SemDeDup-style semantic deduplication over embedding columns.

Web-scale curation prunes *semantic* duplicates — documents whose
embeddings nearly coincide even though their text differs (templated
pages, paraphrases, machine translations) — before training (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540). The reference engine has no
analog (redeye is a streaming line filter, src/bin/redeye.rs:82-89);
this is the curation step that composes the repo's two embedding
primitives:

  1. **Cluster as the blocking key**: k-means (operators/clustering.py,
     exact-arithmetic Lloyd's) assigns every vector a cluster; candidate
     pairs are generated ONLY within a cluster. That is SemDeDup's core
     scale idea — the quadratic neighbor search is confined to cluster-
     sized blocks, and k grows with the corpus so block size stays
     bounded (the paper runs k=50k over LAION). Pairs straddling a
     cluster boundary are *by design* not candidates (the paper's
     recall trade-off); for blocking-free pairs use
     dedup.cosine_lsh_pairs, which this module deliberately does not
     replace.
  2. **Exact integer cosine test**: components are clamped to [-1, 1]
     and floored ONCE onto a coarse 1e-3 grid (SIM_QUANTIZE — coarser
     than clustering's 1e-6 grid precisely so every product below stays
     inside int64, see _headroom_guard). cos(x, y) >= num/den is then
     decided division- and sqrt-free as

         dot > 0  AND  dot^2 * den^2 >= num^2 * |x|^2 * |y|^2

     — pure int64 cross-multiplication, bit-identical in Spark and the
     DuckDB oracle under any partitioning (the same trick the z-score
     and bm25 oracles use; no float epsilon anywhere).

Keeper rule: a vector is DROPPED when some senior (smaller-id) vector
in its own cluster sits above the threshold — the keep-first greedy,
one SQL-expressible pass, the same seniority convention as
span_dedup's min(struct) keeper. This is NOT transitive-closure
semantics: in a chain a~b~c with a!~c, both b and c drop (each has a
senior witness) even though c's witness b was itself dropped. For
connected-component semantics compose the pair set with
dedup.connected_components.

Scale shape (100 TB posture): assignment is a zero-shuffle codegen
projection against centroid literals (clustering.py's contract); the
pair search shuffles (id, coarse-vec, norm) rows hash-partitioned by
cluster — an equi-join, never a CartesianProduct — and the in-cluster
quadratic is bounded by block size because k scales with N. The drop
step anti-joins on bare ids (16 bytes/row), never vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .clustering import _assign_expr, quantized

#: Coarse similarity grid. 1e-3 (not clustering's 1e-6) so that with
#: clamped components (|q| <= SIM_QUANTIZE) every term of the cross-
#: multiplied threshold test stays far inside int64 — see
#: _headroom_guard for the exact bound.
SIM_QUANTIZE = 1000


def _coarse(vec_col: str) -> F.Column:
    """array<long>: floor(clamp(x, -1, 1) * SIM_QUANTIZE) — quantize
    ONCE; all similarity arithmetic downstream is exact int64. The
    clamp is part of the operator's definition (mirrored in the
    oracle): embeddings are unit-norm by contract, so it only guards
    pathological inputs into the headroom bound, never real mass."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            F.greatest(F.least(x.cast("double"), F.lit(1.0)), F.lit(-1.0))
            * F.lit(SIM_QUANTIZE)
        ).cast("long"),
    )


def _headroom_guard(dim: int, num: int, den: int, q: int) -> None:
    """Every product in the threshold test is bounded by
    (dim * q^2)^2 * max(num, den)^2 (dot and both squared norms are
    <= dim * q^2 after the clamp). Refuse combinations that could
    overflow int64 — Spark 4 runs ANSI-on, so an overflow would THROW
    mid-job at scale, and silently wrapping would be worse."""
    worst = (dim * q * q) ** 2 * max(num, den) ** 2
    if worst >= 2**63:
        raise ValueError(
            f"int64 headroom exceeded: dim={dim}, quantize={q}, "
            f"tau={num}/{den} -> worst product {worst} >= 2^63; "
            "coarsen the grid or reduce the embedding dimension"
        )


def semantic_dup_pairs(
    df: DataFrame,
    centroids: dict[int, list[int]],
    tau: tuple[int, int] = (9, 20),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, id_a, id_b, dot_q): ordered within-cluster pairs with
    cos >= tau[0]/tau[1] under the exact integer test. ``centroids``
    are quantized k-means centroids (clustering.kmeans_fit). dot_q is
    the exact int64 dot product on the coarse grid — deterministic, so
    the oracle pins it too."""
    num, den = int(tau[0]), int(tau[1])
    if not (0 < num <= den):
        raise ValueError(f"tau must be a rational in (0, 1], got {num}/{den}")
    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:  # empty frame: no pairs, skip the probe-derived guard
        dim = 0
    else:
        dim = int(dim_row["d"])  # bounded probe: one row, like contaminated_ids
    _headroom_guard(dim, num, den, SIM_QUANTIZE)

    base = df.select(
        F.col(id_col).alias("_id"),
        _assign_expr(quantized(df, vec_col), centroids)["c"].alias("cluster"),
        _coarse(vec_col).alias("_cq"),
    ).withColumn(
        "_n2",
        F.aggregate(
            F.transform("_cq", lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    # fresh column names per side: a self-join on one frame shares
    # expression IDs, so each side is re-projected before joining
    left = base.select(
        F.col("cluster"),
        F.col("_id").alias("id_a"),
        F.col("_cq").alias("_cq_a"),
        F.col("_n2").alias("_n2_a"),
    )
    right = base.select(
        F.col("cluster"),
        F.col("_id").alias("id_b"),
        F.col("_cq").alias("_cq_b"),
        F.col("_n2").alias("_n2_b"),
    )
    pairs = (
        left.join(right, on="cluster")  # equi-join: hash-partitioned by cluster
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dot_q",
            F.aggregate(
                F.zip_with("_cq_a", "_cq_b", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    keep = (F.col("dot_q") > 0) & (
        F.col("dot_q") * F.col("dot_q") * F.lit(den * den).cast("long")
        >= F.lit(num * num).cast("long") * F.col("_n2_a") * F.col("_n2_b")
    )
    return pairs.filter(keep).select("cluster", "id_a", "id_b", "dot_q")


def semantic_dedup_keep(
    df: DataFrame,
    centroids: dict[int, list[int]],
    tau: tuple[int, int] = (9, 20),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): the surviving vectors after dropping every one
    that has a senior (smaller-id) above-threshold neighbor in its own
    cluster. The anti-join carries bare ids only."""
    pairs = semantic_dup_pairs(df, centroids, tau, id_col, vec_col)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    assigned = df.select(
        F.col(id_col),
        _assign_expr(quantized(df, vec_col), centroids)["c"].alias("cluster"),
    )
    return assigned.join(dropped, on=id_col, how="left_anti")
