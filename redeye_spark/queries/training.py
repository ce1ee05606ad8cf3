"""LLM-training-data pipeline queries: dedup (exact/minhash/
simhash/ngram/cosine/CC), ANN, text quality, tokenization,
sampling/splits, TF-IDF, decontamination, curation capstone."""

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


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.quality_metrics(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "avg_word_len", "punct_ratio", "dup_word_ratio",
    )


SQL_TEXT_QUALITY = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
       CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
            THEN round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(ws), 4) END AS avg_word_len,
       CASE WHEN length(text) > 0
            THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4) END AS punct_ratio,
       CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
            THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4) END AS dup_word_ratio
FROM w
"""


def q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        text_op.token_count(F.col("text")).cast("long").alias("n_words"),
        text_op.subword_estimate(F.col("text")).cast("long").alias("n_subwords"),
    )


SQL_SUBWORD_TOKENS = r"""
WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
       CAST(list_aggregate(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS INT)), 'sum') AS BIGINT) AS n_subwords
FROM w
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.lang_id(docs).groupBy("lang_guess").agg(F.count(F.lit(1)).alias("n"))


def _stop_sql(lang: str) -> str:
    from ..operators.text import STOPWORDS

    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect(ws, [{words}]))"


SQL_LANG_ID = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents
),
h AS (
  SELECT doc_id, {_stop_sql('en')} AS h_en, {_stop_sql('es')} AS h_es,
         {_stop_sql('fr')} AS h_fr, {_stop_sql('de')} AS h_de
  FROM w
)
SELECT CASE WHEN greatest(h_en, h_es, h_fr, h_de) = 0 THEN 'und'
            WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
            WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
            WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
            ELSE 'de' END AS lang_guess,
       COUNT(*) AS n
FROM h GROUP BY 1
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 3 vectors (exact ANN
    baseline). Returns ranks only — cross-engine float hashing of the
    cosine itself is not stable at the last ulp."""
    from ..operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    top = similarity.brute_force_topk(embs, queries, k=5)
    return top.select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))


SQL_SIMILARITY_TOPK = """
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 3
) WHERE rank <= 5
"""


def _ivf_fixed_centroids(nlist: int = 8, dim: int = 64, seed: int = 7):
    """Deterministic centroids for the driver-checked IVF query: seeded
    Gaussian directions, normalized. Fixing the centroids (instead of
    k-means-fitting them) lets the DuckDB oracle embed the SAME values as
    literals and replicate the FULL IVF semantics — assignment, probing,
    pruned ranking — in SQL. Production callers use fit_centroids()."""
    import numpy as np

    rng = np.random.default_rng(seed)
    c = rng.normal(size=(nlist, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


_IVF_NPROBE = 3


def _ivf_inputs(spark: SparkSession, sf_dir: str):
    """Shared by the in-memory and persisted-index IVF queries — they
    MUST select identical query vectors to share one oracle."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    return embs, queries


def _ivf_project(top: DataFrame) -> DataFrame:
    return top.select(
        "query_id", "vec_id", F.col("rank").cast("long").alias("rank")
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 3 vectors with fixed centroids: the
    oracle mirrors list assignment + nprobe probing + in-list ranking
    exactly, so this verifies the whole IVF plan (assign -> prune ->
    masked local top-k -> global merge), not just output shape."""
    from ..operators import similarity

    embs, queries = _ivf_inputs(spark, sf_dir)
    top = similarity.ivf_topk(
        embs, queries, k=5, nprobe=_IVF_NPROBE, centroids=_ivf_fixed_centroids()
    )
    return _ivf_project(top)


_IVF_INDEX_CACHE: dict[tuple, str] = {}


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME IVF query through a PERSISTED index (build_ivf_index
    with the fixed centroids -> parquet partitioned by list_id ->
    ivf_topk_indexed): sharing q_ivf_topk's oracle hash-pins the
    build/load/partition-pruned-probe path to identical semantics —
    centroids round-trip float64-exact, and the probe filter prunes
    stored partitions instead of post-filtering a scan (plan-gated in
    TestIvfIndex). NOTE: constructing this query BUILDS the index (a
    write job) on first call per (session, sf_dir) — memoized so
    repeated sweeps reuse one directory — and it is therefore listed in
    the plan-gate's eager-query skip list."""
    import atexit
    import shutil
    import tempfile

    from ..operators import similarity

    embs, queries = _ivf_inputs(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _IVF_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="redeye_ivf_idx_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        similarity.build_ivf_index(embs, path, centroids=_ivf_fixed_centroids())
        _IVF_INDEX_CACHE[key] = path
    top = similarity.ivf_topk_indexed(
        spark, path, queries, k=5, nprobe=_IVF_NPROBE
    )
    return _ivf_project(top)


def _ivf_oracle_sql() -> str:
    cents = _ivf_fixed_centroids()
    rows = ", ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(float(v)) for v in c))
        for i, c in enumerate(cents)
    )
    return f"""
WITH cents(list_id, cvec) AS (VALUES {rows}),
assign AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.list_id FROM cents c
          ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.list_id
          LIMIT 1) AS list_id
  FROM embeddings e
),
probes AS (
  SELECT q.vec_id AS query_id, c.list_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.cvec) DESC, c.list_id
         ) AS pr
  FROM embeddings q, cents c WHERE q.vec_id < 3
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT p.query_id, a.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY list_cosine_similarity(q.embedding, a.embedding) DESC, a.vec_id
         ) AS rank
  FROM (SELECT query_id, list_id FROM probes WHERE pr <= {_IVF_NPROBE}) p
  JOIN assign a ON a.list_id = p.list_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) WHERE rank <= 5
"""


SQL_IVF_TOPK = _ivf_oracle_sql()


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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation quality score (monotone blend of the rounded
    metrics) — the formula is replicated verbatim in SQL, so the driver
    hash-checks the full scoring path, not just the raw metrics."""
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.quality_score(docs).select("doc_id", "quality")


SQL_QUALITY_SCORE = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
m AS (
  SELECT doc_id,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
    CASE WHEN length(text) > 0
         THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4)
         ELSE NULL END AS punct_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round(len(list_intersect(list_transform(string_split_regex(trim(lower(text)), '\s+'), x -> trim(x)),
              ['the','and','of','to','in','is','that','for','with','was'])) * 1.0 / len(ws), 4)
         ELSE NULL END AS stopword_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4)
         ELSE NULL END AS dup_word_ratio
  FROM w
)
SELECT doc_id,
  round(
    least(n_words / 20.0, 1.0) * 0.4
    + (1 - least(coalesce(punct_ratio, 0.0) * 4, 1.0)) * 0.2
    + least(coalesce(stopword_ratio, 0.0) * 5, 1.0) * 0.2
    + (1 - least(coalesce(dup_word_ratio, 0.0) * 2, 1.0)) * 0.2,
  4) AS quality
FROM m
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





# ---------------------------------------------------------------------------
# Sessionization + sequence-length stats (window fns / training-data prep)
# ---------------------------------------------------------------------------

def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the tokenized corpus (training-data
    length stats; n_tok == line byte length for ASCII lines)."""
    from ..operators import sequences as seq_op

    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir))
    return seq_op.length_histogram(raw, bucket=16)


SQL_LENGTH_HISTOGRAM = f"""
WITH {_oracle_base()}
SELECT CAST(floor(length(line) / 16) * 16 AS BIGINT) AS len_bucket,
       COUNT(*) AS n,
       CAST(SUM(length(line)) AS BIGINT) AS total_tok
FROM base GROUP BY 1
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing, checked through its partition-order-free
    INVARIANTS (pack boundaries legitimately depend on partition-local
    arrival order, so pack rows themselves can't be oracled):
      * token conservation — sum(n_tok) minus the one separator per
        extra doc equals the input token count exactly;
      * doc conservation — sum(n_docs) equals the input row count;
      * budget — no multi-doc pack exceeds max_tokens (single oversized
        docs are allowed through un-truncated by design).
    All three are DuckDB-expressible over the input (tokens are line
    bytes), so this runs the real packing operator end to end under a
    full value-hash check."""
    from ..operators import sequences as seq_op

    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir)).coalesce(4)
    packed = seq_op.pack_sequences(raw, max_tokens=2048)
    return packed.agg(
        F.sum(F.col("n_tok") - (F.col("n_docs") - 1)).cast("long").alias("total_tok_net"),
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.count(
            F.when((F.col("n_docs") > 1) & (F.col("n_tok") > 2048), 1)
        ).alias("oversize_multi"),
    )


SQL_PACK_SEQUENCES = f"""
WITH {_oracle_base()}
SELECT CAST(SUM(length(line)) AS BIGINT) AS total_tok_net,
       CAST(COUNT(*) AS BIGINT) AS total_docs,
       CAST(0 AS BIGINT) AS oversize_multi
FROM base
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


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the derived log corpus: every line carries an
    IPv4 (the remote host) and an appended synthetic email, so both
    placeholder substitutions are exercised; chained regexp_replace runs
    at scan speed. Patterns are Java-regex/RE2-common so the DuckDB
    oracle replays them verbatim."""
    from ..operators import text as text_op

    lines = _spread(spark, _spark_lines(spark, sf_dir).select(
        "doc_id",
        F.concat(F.col("line"), F.lit(" "), F.col("doc_id"), F.lit("@example.net")).alias("text"),
    ))
    return text_op.redact_pii(lines).select("doc_id", "text_redacted")


SQL_REDACT_PII = f"""
WITH {_oracle_base()}
SELECT doc_id,
       regexp_replace(
         regexp_replace(line || ' ' || doc_id || '@example.net',
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<email>', 'g'),
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<ipv4>', 'g'
       ) AS text_redacted
FROM expected
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: md5-keyed global order
    (range-partitioned sort at scale); the first 25 keys are checked —
    both engines compute the identical md5 permutation."""
    from ..operators import sequences as seq_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        seq_op.epoch_shuffle(docs, epoch=1)
        .select("doc_id", "shuffle_key")
        .limit(25)
    )


SQL_EPOCH_SHUFFLE = """
SELECT doc_id, md5('e1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
ORDER BY shuffle_key LIMIT 25
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


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: assignment is a pure
    function of (seed, doc_id) via shared-rule md5 buckets — stable
    across runs, retries, cluster sizes, and input order, unlike
    rand()-based randomSplit. The oracle rebuilds every assignment from
    the same md5 hex digits."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.train_val_test_split(docs).select("doc_id", "split")


SQL_TRAIN_VAL_SPLIT = """
WITH b AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math FULLY JVM-side via higher-order functions — zero
    Python, zero explode-shuffle: per-embedding L2 norm through
    F.aggregate's sequential fold and a self-reversed dot product
    through F.zip_with + F.reverse. Every lambda casts to DOUBLE before
    multiplying so both engines run the identical IEEE sequence; the
    DuckDB oracle replays the same left fold with list_reduce over a
    0-prepended term list (its bare reduce seeds with element 1, which
    would skip squaring it)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    dot_rev = F.aggregate(
        F.zip_with(
            "embedding",
            F.reverse("embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(dot_rev, 6).alias("dot_reversed"),
    )


SQL_EMBEDDING_STATS = """
WITH t AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sq,
         list_transform(embedding,
                        (x, i) -> CAST(x AS DOUBLE)
                                  * CAST(embedding[len(embedding) - i + 1] AS DOUBLE)) AS pr
  FROM embeddings
)
SELECT vec_id,
       round(sqrt(list_reduce(list_prepend(0.0, sq), (a, b) -> a + b)), 6) AS l2_norm,
       round(list_reduce(list_prepend(0.0, pr), (a, b) -> a + b), 6) AS dot_reversed
FROM t
"""


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix assembly (sampling.mix_corpora): the
    documents table split into two pseudo-corpora by doc_id parity,
    mixed at 75% / 25% — each corpus's membership cut is an independent
    md5 bucket keyed by (corpus name, id), so the oracle rebuilds every
    draw from the same hex digits."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    web = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    code = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source")
    mixed = sampling.mix_corpora(
        [(web, "web", 0.75), (code, "code", 0.25)], id_col="doc_id"
    )
    return mixed.select("doc_id", "source", "corpus")


def _mix_bucket_sql(name: str) -> str:
    k = f"'mix42:' || '{name}|' || CAST(doc_id AS VARCHAR)"
    return (
        f"(strpos('0123456789abcdef', substr(md5({k}), 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(md5({k}), 2, 1)) - 1)"
    )


SQL_CORPUS_MIX = f"""
SELECT doc_id, source, 'web' AS corpus
FROM documents WHERE doc_id % 2 = 0 AND {_mix_bucket_sql('web')} < 192
UNION ALL
SELECT doc_id, source, 'code' AS corpus
FROM documents WHERE doc_id % 2 = 1 AND {_mix_bucket_sql('code')} < 64
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source 20% sample (bucket keyed by
    (source, doc_id), so draws are independent across strata but stable
    under retries — the property sampleBy()'s Bernoulli draw lacks)."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.stratified_sample(docs, fraction=0.2).select("doc_id", "source")


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, source
FROM documents
WHERE (strpos('0123456789abcdef', substr(md5('strat42:' || source || '|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
    + (strpos('0123456789abcdef', substr(md5('strat42:' || source || '|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 51
"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, ties broken by
    term so the cut is total-ordered). Scores are rounded BEFORE the
    rank window in both engines, so ordering can never diverge on float
    noise."""
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.top_tfidf_terms(docs, k=3)


SQL_TFIDF_TERMS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq USING (term), n
),
ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3
"""


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




def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document's whitespace tokens split
    into 64-token blocks with stride 48 (16-token overlap) — the
    fixed-length training-block transform. Pure codegen
    (explode(sequence) + slice, operators/sequences.py::chunk_tokens):
    no shuffle, no Python; amplification equals output size."""
    from ..operators import sequences
    from ..operators.text import ws_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", ws_tokens("text").alias("tokens")
    )
    out = sequences.chunk_tokens(docs, "tokens", block=64, stride=48)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("n_tok"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


SQL_CHUNK_TOKENS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS ws
  FROM documents
),
sized AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0)
SELECT doc_id,
       i AS chunk_idx,
       len(ws[i*48+1 : least(i*48+64, n)]) AS n_tok,
       array_to_string(ws[i*48+1 : least(i*48+64, n)], ' ') AS chunk_text
FROM sized,
     UNNEST(generate_series(0, CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS t(i)
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation capstone — the composition a training-data
    pipeline actually runs, all existing operators chained: quality
    scoring (codegen formula) -> threshold filter -> exact dedup
    (keep-lowest-id semi join) -> deterministic md5 split -> per-split
    stats. Aggregates stay integer (doc counts, word counts, quality in
    basis points: the score is rounded to 4dp, so x10000 is integral)
    so no float accumulation order can flap the hash."""
    from ..operators import dedup as dedup_op
    from ..operators import sampling
    from ..operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = text_op.quality_score(docs)
    kept = scored.filter(F.col("quality") >= 0.5)
    # window-based dedup filter: ONE scan of the scored frame — the
    # aggregate + self-semi-join formulation re-executes the regex
    # quality metrics on both join branches
    deduped = dedup_op.exact_dedup_filter(kept)
    split_df = sampling.train_val_test_split(deduped)
    return split_df.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("long")).alias("total_words"),
        F.sum(F.round(F.col("quality") * 10000).cast("long")).alias("quality_bp"),
    )


SQL_CURATION_PIPELINE = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
m AS (
  SELECT doc_id, text,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
    CASE WHEN length(text) > 0
         THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4)
         ELSE NULL END AS punct_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round(len(list_intersect(list_transform(string_split_regex(trim(lower(text)), '\s+'), x -> trim(x)),
              ['the','and','of','to','in','is','that','for','with','was'])) * 1.0 / len(ws), 4)
         ELSE NULL END AS stopword_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4)
         ELSE NULL END AS dup_word_ratio
  FROM w
),
q AS (
  SELECT doc_id, text, n_words,
    round(
      least(n_words / 20.0, 1.0) * 0.4
      + (1 - least(coalesce(punct_ratio, 0.0) * 4, 1.0)) * 0.2
      + least(coalesce(stopword_ratio, 0.0) * 5, 1.0) * 0.2
      + (1 - least(coalesce(dup_word_ratio, 0.0) * 2, 1.0)) * 0.2,
    4) AS quality
  FROM m
),
kept AS (SELECT * FROM q WHERE quality >= 0.5),
keep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
dd AS (SELECT kept.* FROM kept JOIN keep USING (doc_id)),
sp AS (
  SELECT *,
         CASE WHEN (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204
              THEN 'train'
              WHEN (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
              THEN 'val'
              ELSE 'test' END AS split
  FROM dd
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(CAST(round(quality * 10000) AS BIGINT)) AS BIGINT) AS quality_bp
FROM sp GROUP BY split
"""






QUERIES = {
    "chunk_tokens": q_chunk_tokens,
    "dedup_exact": q_dedup_exact,
    "dedup_exact_hashed": q_dedup_exact_hashed,
    "text_quality": q_text_quality,
    "subword_tokens": q_subword_tokens,
    "lang_id": q_lang_id,
    "similarity_topk": q_similarity_topk,
    "ivf_topk": q_ivf_topk,
    "ivf_topk_indexed": q_ivf_topk_indexed,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "doc_fingerprints": q_doc_fingerprints,
    "dedup_filter": q_dedup_filter,
    "quality_score": q_quality_score,
    "dedup_cc": q_dedup_cc,
    "dedup_cc_star": q_dedup_cc_star,
    "train_val_split": q_train_val_split,
    "stratified_sample": q_stratified_sample,
    "corpus_mix": q_corpus_mix,
    "embedding_stats": q_embedding_stats,
    "tfidf_terms": q_tfidf_terms,
    "decontaminate": q_decontaminate,
    "decontaminate_shuffle": q_decontaminate_shuffle,
    "curation_pipeline": q_curation_pipeline,
    "length_histogram": q_length_histogram,
    "pack_sequences": q_pack_sequences,
    "cosine_near_dup": q_cosine_near_dup,
    "redact_pii": q_redact_pii,
    "epoch_shuffle": q_epoch_shuffle,
}

ORACLES = {
    "chunk_tokens": SQL_CHUNK_TOKENS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_exact_hashed": SQL_DEDUP_EXACT,
    "text_quality": SQL_TEXT_QUALITY,
    "subword_tokens": SQL_SUBWORD_TOKENS,
    "lang_id": SQL_LANG_ID,
    "similarity_topk": SQL_SIMILARITY_TOPK,
    "ivf_topk": SQL_IVF_TOPK,
    "ivf_topk_indexed": SQL_IVF_TOPK,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "dedup_filter": SQL_DEDUP_FILTER,
    "quality_score": SQL_QUALITY_SCORE,
    "dedup_cc": SQL_DEDUP_CC,
    "dedup_cc_star": SQL_DEDUP_CC,
    "train_val_split": SQL_TRAIN_VAL_SPLIT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "corpus_mix": SQL_CORPUS_MIX,
    "embedding_stats": SQL_EMBEDDING_STATS,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "decontaminate": SQL_DECONTAMINATE,
    "decontaminate_shuffle": SQL_DECONTAMINATE,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "cosine_near_dup": SQL_COSINE_NEAR_DUP,
    "redact_pii": SQL_REDACT_PII,
    "epoch_shuffle": SQL_EPOCH_SHUFFLE,
}
