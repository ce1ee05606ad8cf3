"""Deduplication queries: exact/minhash-LSH/simhash/ngram/cosine
pair sets, corpus filters, connected components, decontamination."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..functions.logparse import FORMAT_COMMON  # noqa: F401
from ..operators import enrich as enrich_op  # noqa: F401
from ..operators import parse_op, route as route_op, tokenize_op  # noqa: F401
from ..operators import aggregate as agg_op  # noqa: F401
from ._shared import (  # noqa: F401
    _OFFS, _STATUS, _frags, _oracle_base, _parsed, _spark_lines, _spread,
    _utc, _PARSE_COLS,
)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup(docs)


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY text
"""


def q_dedup_exact_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB exact-dedup path: group by (xxhash64(text), length)
    so the shuffle carries ~16 bytes/row instead of documents. The
    output contract is identical, so the SAME by-text SQL oracle
    verifies it — including the absence of hash collisions."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup(docs, by_hash=True)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trim matches the oracle's tokenization at the edges (corpus text
    # carries no edge whitespace today; this keeps the pair robust)
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.trim("text")
    )
    return dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5)


SQL_NGRAM_JACCARD = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common) >= 0.5
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pair set (ids only — est_jaccard is a hash
    estimate with no SQL form). The oracle computes the EXACT 5-byte
    character-shingle Jaccard in DuckDB: the testdata's planted near-dups
    sit at J >= 0.92 with the next pair at 0.33, so the LSH pair set at
    threshold 0.5 must equal the exact pair set — a real end-to-end
    check of shingling, signatures, banding, and estimation.

    Round 5: verify="exact" — banding proposes candidates (recall), the
    true shingle Jaccard decides (precision), so the emitted set equals
    the oracle STRUCTURALLY instead of via estimator luck, and num_perm
    drops 64 -> 16 (4x cheaper signatures)."""
    from ..operators import dedup

    # _spread: the 1-row-group documents scan is unsplittable, so the
    # signature mapInPandas (evaluated by 2-3 banding consumers) and
    # the exact-verify pass all ran single-task without it. Signatures
    # are a pure function of the text — partitioning-invariant.
    docs = _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return dedup.minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=16, bands=8, verify="exact"
    ).select("id_a", "id_b")


# Exact char-5-shingle Jaccard (the operator's shingle definition: all
# 5-byte windows; rows shorter than 5 contribute the whole row).
SQL_MINHASH_PAIRS = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - 4, 1)),
           i -> substr(text, i, 5))) AS grams
  FROM documents
),
g AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
"""


def q_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the dedup story: apply the MinHash-LSH pair set to the
    corpus with the keep-lowest-id policy and return the surviving ids.
    Oracle: ids not appearing as id_b in the exact-Jaccard pair set."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=16, bands=8, verify="exact"
    )
    return dedup.drop_near_duplicates(docs, pairs).select("doc_id")


# The pair query embeds verbatim as a derived table (DuckDB allows WITH
# inside a parenthesized subquery) — no brittle string surgery.
SQL_DEDUP_FILTER = f"""
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM ({SQL_MINHASH_PAIRS}) AS pair_set)
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming<=3 pairs under a FULL oracle: the md5-keyed token
    hash is shared with DuckDB, which rebuilds every signature from the
    same md5 hex digits (64 bit-vote sums) and applies the exact
    all-pairs bit_count(xor) <= 3 cut. Spark's banded pair set equals
    the exact cut because hamming <= 3 over 4 16-bit blocks guarantees
    at least one identical block (pigeonhole) — so this verifies
    tokenization, hashing, voting, banding, AND the hamming filter."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_near_pairs(docs, max_hamming=3)


def _simhash_oracle_sql(seed: int = 42, max_hamming: int = 3) -> str:
    """DuckDB replica of simhash_signatures: bit b of a token's 64-bit
    hash lives in md5-hex digit 16 - b//4 (1-based, big-endian), bit
    b%4 of the digit's value. Weight of bit 63 is long-min (sign bit)."""
    bit_sums = ",\n         ".join(
        f"sum(((strpos('0123456789abcdef', substr(hx, {16 - b // 4}, 1))-1) >> {b % 4}) & 1) AS c{b}"
        for b in range(64)
    )
    weights = " + ".join(
        f"CASE WHEN 2*c{b} > n THEN {-(1 << 63) if b == 63 else (1 << b)} ELSE 0 END"
        for b in range(64)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS tok
  FROM documents
),
h AS (SELECT doc_id, md5('sh{seed}:' || tok) AS hx FROM toks),
bits AS (
  SELECT doc_id, count(*) AS n,
         {bit_sums}
  FROM h GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({weights} AS BIGINT) AS sh FROM bits),
allsig AS (
  SELECT d.doc_id, coalesce(s.sh, 0) AS sh
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
"""


SQL_SIMHASH_PAIRS = _simhash_oracle_sql()


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints, checked through their GROUP
    structure: the fingerprint equality classes must equal the
    normalized-text (lower, whitespace-split) equality classes — which
    verifies determinism, normalization semantics, and injectivity on
    the corpus even though DuckDB cannot chain xxhash64 itself."""
    from pyspark.sql import Window
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = text_op.document_fingerprints(docs)
    w = Window.partitionBy("fp")
    return fps.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keep_id"),
        F.count(F.lit(1)).over(w).alias("group_n"),
    )


SQL_DOC_FINGERPRINTS = r"""
WITH k AS (
  SELECT doc_id,
         array_to_string(string_split_regex(trim(lower(text)), '\s+'), chr(31)) AS key
  FROM documents
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY key) AS keep_id,
       COUNT(*) OVER (PARTITION BY key) AS group_n
FROM k
"""


def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH bucketing
    + exact in-bucket cosine — no driver-side collect at any scale. The
    oracle is the EXACT all-pairs cosine threshold in DuckDB, so this
    checks LSH recall (the band parameters are sized for recall ~1 at
    the 0.45 threshold: p=0.65, 64 bands x 4 bits -> miss ~4e-6/pair)
    AND the in-bucket cosine math. Pair ids only: the cosine value's
    last ulp is not hash-stable across engines (it IS checked against
    numpy in pytest)."""
    from ..operators import dedup

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = dedup.cosine_lsh_pairs(embs, threshold=0.45, bits_per_band=4, bands=64)
    return pairs.select("id_a", "id_b")


# Threshold margin note: nearest pair cosines to 0.45 in the testdata are
# 0.4494/0.4516 (sf0.01) and 0.4489/0.4532 (sf0.001) — 1e-3 margins, far
# beyond any cross-engine float noise.
SQL_COSINE_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    labeled with the minimum doc_id reachable through minhash pairs
    (singletons label themselves). Closes the chain-shaped gap of the
    keep-lowest-id policy. Oracle: DuckDB recursive CTE computing min
    reachable id over the EXACT char-5-shingle Jaccard pair set (which
    equals the LSH pair set on this corpus — see q_minhash_pairs)."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=16, bands=8, verify="exact"
    )
    comps = dedup.connected_components(pairs)
    return docs.select("doc_id").join(comps, on="doc_id", how="left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )


SQL_DEDUP_CC = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_PAIRS}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


SQL_DUP_CLUSTER_SIZES = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_PAIRS}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
lab AS (
  SELECT coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
),
sz AS (SELECT component, count(*) AS cluster_size FROM lab GROUP BY component)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM sz GROUP BY cluster_size
"""




def q_dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_cc through the O(log n)-round large-star/small-star
    variant (connected_components_twophase) instead of label
    propagation — same recursive-CTE ground truth, so both CC
    algorithms are pinned to identical clusterings."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=16, bands=8, verify="exact"
    )
    comps = dedup.connected_components_twophase(pairs)
    return docs.select("doc_id").join(comps, on="doc_id", how="left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )


def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution — the dedup run report every
    curation pipeline publishes: (cluster_size, n_clusters, n_docs).
    Two component-keyed partial aggregates on top of dedup_cc's
    labeling; the shuffles carry components then sizes, never docs."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=16, bands=8, verify="exact"
    )
    comps = dedup.connected_components(pairs)
    lab = docs.select("doc_id").join(comps, on="doc_id", how="left").select(
        F.coalesce("component", F.col("doc_id")).alias("component")
    )
    sz = lab.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sz.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs (all sources but src0)
    sharing any word-5-gram with the held-out eval set (source src0).
    The eval gram set is explicitly broadcast — the 10^12-row corpus
    streams through a map-side semi-join and never shuffles."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.trim("text")
    )
    train = docs.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    return dedup.contaminated_ids(train, eval_df, n=5)


def q_decontaminate_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME decontamination but FORCED through the large-eval-set
    degradation path (max_broadcast_grams=1): the gram semi-join runs
    as a shuffle sort-merge join instead of a broadcast. Sharing
    q_decontaminate's oracle hash-pins the fallback plan to identical
    semantics — the plan shape itself is gated in test_plans."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.trim("text")
    )
    train = docs.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    return dedup.contaminated_ids(train, eval_df, n=5, max_broadcast_grams=1)


SQL_DECONTAMINATE = r"""
WITH w AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
g AS (
  SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+4], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
)
SELECT DISTINCT g.doc_id
FROM g JOIN (SELECT DISTINCT gram FROM g WHERE source = 'src0') e USING (gram)
WHERE g.source <> 'src0'
"""


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over NORMALIZED text (lower, strip punctuation,
    collapse whitespace) — the standard pre-pass that collapses
    trivially-reformatted copies. Same group contract as dedup_exact;
    DuckDB replicates the normalization with the identical regex
    chain."""
    from ..operators import dedup
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = docs.select(
        "doc_id", text_op.normalize_text(F.col("text")).alias("text")
    )
    return dedup.exact_dedup(norm)


SQL_DEDUP_NORMALIZED = r"""
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^\w\s]', '', 'g'), '\s+', ' ', 'g')) AS t
  FROM documents
)
GROUP BY t
"""


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (line/paragraph) dedup — C4/Dolma-style: every
    5-word span kept only at its globally first occurrence (ordered by
    (doc_id, span index)); documents rewritten without later
    occurrences. operators/spans.py for the no-hot-partition plan
    (keeper = partial-aggregatable min-struct, never a per-span
    window)."""
    from ..operators.spans import span_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (span_dedup(docs, "text", "doc_id", span_words=5)
            .withColumn("n_kept", F.col("n_kept").cast("bigint"))
            .withColumn("n_dropped", F.col("n_dropped").cast("bigint")))


SQL_SPAN_DEDUP = """
WITH segs AS (
  SELECT doc_id, i - 1 AS seg_idx,
         array_to_string(words[(i-1)*5+1:i*5], ' ') AS seg
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       LATERAL (SELECT unnest(generate_series(
                  1, CAST(ceil(len(words)/5.0) AS INT))) AS i)
), marked AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY seg
                            ORDER BY doc_id, seg_idx) = 1 AS keep
  FROM segs
)
SELECT doc_id,
       string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep) AS clean_text,
       COUNT(*) FILTER (WHERE keep) AS n_kept,
       COUNT(*) FILTER (WHERE NOT keep) AS n_dropped
FROM marked
GROUP BY doc_id
HAVING COUNT(*) FILTER (WHERE keep) > 0
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "span_dedup": q_span_dedup,
    "dedup_exact_hashed": q_dedup_exact_hashed,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_pairs": q_minhash_pairs,
    "dedup_filter": q_dedup_filter,
    "simhash_pairs": q_simhash_pairs,
    "doc_fingerprints": q_doc_fingerprints,
    "cosine_near_dup": q_cosine_near_dup,
    "dedup_cc": q_dedup_cc,
    "dedup_cc_star": q_dedup_cc_star,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "decontaminate": q_decontaminate,
    "decontaminate_shuffle": q_decontaminate_shuffle,
    "dedup_normalized": q_dedup_normalized,
}

ORACLES = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "span_dedup": SQL_SPAN_DEDUP,
    "dedup_exact_hashed": SQL_DEDUP_EXACT,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "dedup_filter": SQL_DEDUP_FILTER,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "cosine_near_dup": SQL_COSINE_NEAR_DUP,
    "dedup_cc": SQL_DEDUP_CC,
    "dedup_cc_star": SQL_DEDUP_CC,
    "dup_cluster_sizes": SQL_DUP_CLUSTER_SIZES,
    "decontaminate": SQL_DECONTAMINATE,
    "decontaminate_shuffle": SQL_DECONTAMINATE,
    "dedup_normalized": SQL_DEDUP_NORMALIZED,
}
