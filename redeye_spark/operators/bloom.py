"""Bloom filters as mergeable integer bitmap cells.

Decontamination (operators/dedup.py:contaminated_ids) broadcasts the
benchmark-id set; at 100 TB the production prefilter is a Bloom filter:
O(m/62) longs regardless of member count, mergeable by bit_or (so
per-shard/day filters union without rescanning), probe-side broadcast,
zero false negatives. The reference engine has no analog (redeye is a
line filter); this is the standard web-scale "have we seen this id/URL"
structure (Bloom 1970, public).

Exactness: positions are md5-nibble arithmetic (the engine-portable
hash discipline of sampling.hash_bucket): position j for value v is the
first 3 hex nibbles of md5('bloom<seed>:<j>:' || v) read base-16 —
0..4095 over an m_bits=4096 filter. Words pack 62 bits per BIGINT
(shiftleft never touches the sign bit), so every cell and every probe
verdict is bit-identical in Spark and any SQL engine — including the
false positives, which are a deterministic function of the hash family.

Scale shape: building shuffles (word_idx, partial-bit_or) cells — the
map-side partial collapses to <= m/62 rows per task; probing broadcasts
the (m/62)-row cell table and aggregates per probe in one pass. Nothing
data-sized ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

M_BITS = 4096
N_HASHES = 3
WORD_BITS = 62  # keep shifts off the BIGINT sign bit


def position(value: Column, j: int, seed: int = 42) -> Column:
    """Bit position 0..M_BITS-1 for hash j: first 3 md5 hex nibbles."""
    key = F.concat(F.lit(f"bloom{seed}:{j}:"), value.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 3), 16, 10).cast("int")


def position_sql(value_expr: str, j: int, seed: int = 42) -> str:
    """The identical position arithmetic in portable SQL (nibble
    lookups — no hex-cast builtin assumed)."""
    h = f"md5('bloom{seed}:{j}:' || CAST({value_expr} AS VARCHAR))"
    nib = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
    return " + ".join(
        f"({nib.format(h=h, i=i + 1)}) * {16 ** (2 - i)}" for i in range(3)
    )


def bloom_cells(
    df: DataFrame, value_col: str, seed: int = 42
) -> DataFrame:
    """(word_idx, bits) — the filter as <= M_BITS/62 packed longs.
    Mergeable: bit_or cells from any number of shards/days. The
    explode(k positions) feeds a same-stage partial bit_or, so the
    shuffle carries at most m/62 rows per task."""
    positions = F.explode(
        F.array(*[position(F.col(value_col), j, seed) for j in range(N_HASHES)])
    ).alias("pos")
    return (
        df.select(positions)
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            (F.col("pos") % WORD_BITS).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def collect_words(cells: DataFrame) -> list[int]:
    """Densify the cell table to a word array (index = word_idx).
    Bounded driver state: M_BITS/62 + 1 longs — the Bloom analog of the
    kmeans centroid table; this list IS the shippable filter."""
    words = [0] * (M_BITS // WORD_BITS + 1)
    for r in cells.collect():  # bounded: <= m/62 rows
        words[int(r["word_idx"])] = int(r["bits"])
    return words


def bloom_probe(
    probes: DataFrame,
    words: list[int],
    value_col: str,
    seed: int = 42,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append `bloom_hit` (true iff ALL k bits are set — may include
    deterministic false positives, never false negatives). The filter
    is a literal word array folded into the plan, so probing is a pure
    codegen projection: zero shuffle, zero Python, safe over the full
    corpus at any scale (the 100 TB decontamination prefilter)."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    hit = F.lit(True)
    for j in range(N_HASHES):
        pos = position(F.col(value_col), j, seed)
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), pos % WORD_BITS
        )
        hit = hit & (word.bitwiseAND(mask) != 0)
    return probes.withColumn(out_col, hit)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    seed: int = 42,
) -> DataFrame:
    """Runtime-filter (Bloom-pruned) inner join — the 100 TB join
    pattern Spark's own `spark.sql.optimizer.runtimeFilter` automates,
    made explicit and engine-exact: build the filter from the DIM keys
    (<= m/62 cell rows -> a literal word array), prefilter the FACT
    side as a ZERO-SHUFFLE codegen projection, then join only the
    survivors. The result is EXACTLY the plain join — the filter has
    no false negatives, and its deterministic false positives die in
    the real join — but the shuffle/broadcast probe now carries only
    rows that MIGHT match, which at fact scale is the difference
    between exchanging 100 TB and exchanging the selectivity.

    NOTE: building the filter runs one bounded job (collect of the
    cell table) when this function is CALLED — same contract as
    ivf_topk_indexed's index build."""
    cells = bloom_cells(dim.select(F.col(dim_key).alias("_v")), "_v", seed)
    words = collect_words(cells)
    pruned = (
        bloom_probe(fact, words, fact_key, seed)
        .filter(F.col("bloom_hit"))
        .drop("bloom_hit")
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
