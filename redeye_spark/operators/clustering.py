"""Distributed k-means (Lloyd's) over embedding columns, exact-arithmetic.

Training-data curation clusters corpora for diversity sampling, dedup
blocking, and topic balancing. This is the classic iterative-algorithm
shape the reference engine has no analog for (redeye is a streaming
line filter, src/bin/redeye.rs:82-89); on Spark the right plan is
Lloyd's with the DRIVER holding only the k x d centroid table between
iterations — the same contract as MLlib's KMeans, but with every
arithmetic step exact so a DuckDB oracle can replay it bit-for-bit:

  * components are floored onto a 1/quantize integer grid ONCE (the
    house recipe shared with similarity.centroid_cells) — all distances
    are then exact int64 sums, identical under any partitioning;
  * assignment ties break to the SMALLEST cluster id (array_min over
    (dist, cluster) structs — lexicographic, deterministic);
  * centroid updates use TRUNCATED integer division (toward zero),
    the one division both Spark-side Python and SQL `(s - s % n) / n`
    agree on exactly — no float mean ever enters the loop.

Scale shape (100 TB posture): per iteration the cluster does ONE
partial-aggregated shuffle of k x d integer cells (posexplode of the
assigned vectors feeds a same-stage HashAggregate — the shuffle carries
cells, never vectors), and the driver collects exactly k x d longs.
Assignment itself is a pure codegen projection against centroid
literals — zero shuffle, zero Python. Iterations are O(log-ish
constant) in practice (fixed `iters` here, deterministic by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

QUANTIZE = 1_000_000


def _trunc_div(s: int, n: int) -> int:
    """C-style integer division (truncate toward zero), n > 0.

    Python's // floors (−7 // 2 == −4); Spark/DuckDB integer division
    truncates (−7 / 2 == −3). Centroid updates must match the SQL
    oracle's `(s - s % n) / n`, which is exactly trunc division."""
    q = abs(s) // n
    return q if s >= 0 else -q


def quantized(df: DataFrame, vec_col: str = "embedding") -> F.Column:
    """array<long> of floor(x * QUANTIZE) — the shared exact grid."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(QUANTIZE)).cast("long"),
    )


def _assign_expr(qcol, centroids: dict[int, list[int]]) -> F.Column:
    """argmin_j dist(q, c_j), ties to the smallest cluster id: array_min
    over (dist, cluster) structs compares lexicographically.

    The centroid table rides the plan as ONE nested array literal
    (two F.expr parses) and a single zip_with/aggregate chain, instead
    of k unrolled distance subtrees of d literal nodes each built
    through ~k*d py4j calls: the fit re-plans this expression every
    Lloyd's round, and with the unrolled form the DRIVER-side
    construct+analyze gap between round jobs (~0.5-0.8 s each at
    k=4, d=64) dwarfed the sub-0.5 s cluster stages themselves.
    Arithmetic, comparison order, and tie-breaking are identical —
    array_min over the same (d, c) structs."""
    items = sorted(centroids.items())
    cents = F.expr(
        "cast(array(%s) as array<array<bigint>>)"
        % ",".join("array(%s)" % ",".join(str(int(v)) for v in c) for _, c in items)
    )
    ids = F.expr(
        "cast(array(%s) as array<bigint>)"
        % ",".join(str(int(j)) for j, _ in items)
    )
    return F.array_min(
        F.zip_with(
            cents,
            ids,
            lambda c, j: F.struct(
                F.aggregate(
                    F.zip_with(qcol, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                j.alias("c"),
            ),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[int]]:
    """Run `iters` Lloyd's rounds; return {cluster: quantized centroid}.

    Init: the k rows with the smallest ids (deterministic; a seeded
    sample works too but the oracle must replay it). Each round:
    assignment is a codegen projection, the update is one k x d-cell
    shuffle plus a bounded k x d driver collect. A cluster that loses
    all members drops out (its id simply stops existing) — the same
    rule the SQL oracle's join semantics produce."""
    q = df.select(
        F.col(id_col).alias("_id"), quantized(df, vec_col).alias("_q")
    )
    seed_rows = q.orderBy("_id").limit(k).collect()  # bounded: k rows
    centroids = {j: list(r["_q"]) for j, r in enumerate(seed_rows)}

    for _ in range(iters):
        assigned = q.select(
            F.col("_id"),
            F.col("_q"),
            _assign_expr(F.col("_q"), centroids)["c"].alias("_cluster"),
        )
        cells = (
            assigned.select("_cluster", F.posexplode("_q").alias("pos", "val"))
            .groupBy("_cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k x d integer cells
        )
        nxt: dict[int, list[int]] = {}
        for r in cells:
            nxt.setdefault(int(r["_cluster"]), [0] * len(centroids[min(centroids)]))
            nxt[int(r["_cluster"])][int(r["pos"])] = _trunc_div(int(r["s"]), int(r["n"]))
        centroids = nxt
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: dict[int, list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist) under the given centroids — a pure codegen
    projection (no shuffle, no Python): safe to run over the full corpus
    at any scale."""
    q = quantized(df, vec_col)
    a = _assign_expr(q, centroids)
    return df.select(
        F.col(id_col),
        a["c"].alias("cluster"),
        a["d"].alias("dist"),
    )


def kmeans_cells(
    spark: SparkSession,
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, pos, c_val, n_vecs): the fitted quantized centroids plus
    membership counts under the FINAL centroids. The centroid table is
    k x d driver state (that is Lloyd's contract, same as MLlib); the
    counts are computed distributed and broadcast-joined onto it."""
    centroids = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    counts = (
        kmeans_assign(df, centroids, id_col=id_col, vec_col=vec_col)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    cells = spark.createDataFrame(
        [(int(j), int(p), int(v)) for j, c in sorted(centroids.items())
         for p, v in enumerate(c)],
        "cluster long, pos int, c_val long",
    )
    return cells.join(F.broadcast(counts), "cluster").select(
        "cluster", "pos", "c_val", "n_vecs"
    )
