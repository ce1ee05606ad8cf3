"""Deterministic corpus splitting / sampling for training pipelines.

All split decisions hash the ROW KEY, never rand(): a row's assignment
is a pure function of (seed, id), so splits are reproducible across
runs, cluster sizes, and re-shuffles of the input — the property a
train/val/test split must have at 10^12 rows, where "sample the same
5% next month" cannot mean re-running Bernoulli sampling. The hash is
md5 (not xxhash64) so the rule is recomputable in any SQL engine: the
DuckDB oracles rebuild every assignment from the same hex digits.

Bucket rule (shared cross-engine): bucket(id) = first two hex digits of
md5('<kind><seed>:' || id) as an integer 0..255. Spark computes it with
conv(); engines without conv() use strpos('0123456789abcdef', ...)
digit arithmetic — same value.

Scale shape: the bucket is a per-row projection (whole-stage codegen,
no shuffle, no state); a split/sample is a FILTER on it, so it pushes
into scans wherever the id column feeds a stored expression and costs
nothing even at 100 TB. No sampleBy/rand anywhere (nondeterministic
under retries: a recomputed task would re-draw its rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 256


def hash_bucket(id_col: Column, kind: str, seed: int = 42) -> Column:
    """Deterministic bucket 0..255 from md5 of the keyed id."""
    key = F.concat(F.lit(f"{kind}{seed}:"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 42,
) -> DataFrame:
    """Append a `split` column ('train'|'val'|'test') by bucket cut.

    Cut points are floor(weight_prefix * 256), so realized fractions are
    exact multiples of 1/256 — documented quantization, not sampling
    noise. Every row is assigned (the last range is open-ended)."""
    b = hash_bucket(F.col(id_col), "split", seed)
    t_cut = int(weights[0] * N_BUCKETS)
    v_cut = int((weights[0] + weights[1]) * N_BUCKETS)
    split = (
        F.when(b < t_cut, F.lit("train"))
        .when(b < v_cut, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    fraction: float,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sample: keep rows whose bucket falls
    under floor(fraction*256), with the bucket keyed by (stratum, id) so
    the SAME id can land differently in different strata (independent
    draws per stratum) but identically across runs. Unlike
    df.sampleBy(), membership is stable under task retries and input
    re-partitioning."""
    key = F.concat(F.col(strata_col).cast("string"), F.lit("|"), F.col(id_col).cast("string"))
    b = hash_bucket(key, "strat", seed)
    return df.filter(b < int(fraction * N_BUCKETS))


def mix_corpora(
    corpora: list[tuple[DataFrame, str, float]],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic training-mix assembly: union several corpora, each
    downsampled to its mixture weight — the "20% code, 30% web, 50%
    curated" recipe every LLM data pipeline ends in. Each (df, name,
    weight) contributes the rows whose md5 bucket (keyed by the CORPUS
    NAME + id, so the same id draws independently per corpus) falls
    under floor(weight*256), tagged with a `corpus` column.

    Same scale shape as the other samplers: per-row codegen projection
    + filter, no shuffle, no rand() — membership is a pure function of
    (seed, name, id), so re-running the mix next month (or after a
    task retry) yields byte-identical membership, and the realized
    weights are exact multiples of 1/256 by construction."""
    if not corpora:
        raise ValueError("mix_corpora needs at least one (df, name, weight)")
    parts = []
    for df, name, weight in corpora:
        if not (0.0 <= weight <= 1.0):
            raise ValueError(f"weight for {name!r} must be in [0, 1], got {weight}")
        key = F.concat(F.lit(f"{name}|"), F.col(id_col).cast("string"))
        b = hash_bucket(key, "mix", seed)
        parts.append(
            df.filter(b < int(weight * N_BUCKETS)).withColumn(
                "corpus", F.lit(name)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_sample(
    df: DataFrame,
    weight_buckets: Column,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-row Bernoulli with a per-row acceptance rate:
    keep a row iff its md5 bucket (0..255, keyed by id) falls under
    `weight_buckets` — an INTEGER cut in [0, 256] computed per row
    (256 = always keep, 0 = always drop). Quality-weighted corpus
    downsampling ("keep long documents more often") without rand():
    membership is a pure function of (seed, id, weight), so it is
    byte-stable under task retries, repartitioning, and re-runs, and
    independent rows draw independently.

    The cut is integer ON PURPOSE: callers derive it with integer
    arithmetic (e.g. least(256, n_chars * 256 / limit) with integer
    division) so the realized rate is an exact multiple of 1/256 and
    any SQL engine reproduces membership bit-for-bit — float weights
    would make the boundary rows engine-dependent. Pure codegen
    projection + filter; zero shuffle."""
    b = hash_bucket(F.col(id_col), "wsamp", seed)
    return df.filter(b < weight_buckets.cast("int"))


def take_per_group(
    df: DataFrame,
    n: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic 'N rows per group' sample: rank rows inside each
    stratum by the md5 of their keyed id and keep the first `n`. The
    md5 ordering is a uniform random permutation that any engine
    reproduces exactly (unlike ORDER BY rand()), and ties are
    impossible because the digest input embeds the unique id. One
    shuffle (the window partition); per-group state is a single
    counter, so a billion-row stratum costs the same memory as a
    thousand-row one."""
    from pyspark.sql.window import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    key = F.concat(
        F.lit(f"take{seed}:"),
        F.col(strata_col).cast("string"), F.lit("|"),
        F.col(id_col).cast("string"),
    )
    w = Window.partitionBy(strata_col).orderBy(F.md5(key))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
