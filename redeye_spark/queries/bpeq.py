"""BPE tokenizer-training queries (operators/bpe.py) over the byte
stream of the deterministically derived log lines — the `tokens`
payload axis end-to-end: fit merges on token arrays, re-encode, and
measure compression.

The DuckDB oracle replays the ENTIRE training run relationally
(unrolled CTEs, one count/argmax/merge block per round): the greedy
leftmost-non-overlapping scan is reproduced via match islands
(consecutive matching positions) with even-parity selection, so a hash
match pins pair counting, the (cnt desc, a, b) argmax tie-break, AND
the merge scan order — not just output shape.

Corpus: a deterministic 1/4 md5-subset of the lines (both engines),
keeping the sf0.1 oracle's per-round window passes tractable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import bpe, tokenize_op
from ._shared import _frags, _spark_lines, _utc

_ROUNDS = 3
_FIRST_ID = 256  # byte vocab below


def _subset_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _spark_lines(spark, sf_dir)
    return lines.filter(
        F.substring(F.md5(F.col("doc_id")), 1, 1).isin("0", "1", "2", "3")
    )


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset lines -> (doc_id, tokens, n_tok, source)."""
    _utc(spark)
    return tokenize_op.tokenize_lines(_subset_lines(spark, sf_dir))


def _duck_s0() -> str:
    """DuckDB CTEs: subset lines -> char-level (doc_id, pos, val)."""
    f = _frags("duck")
    return f"""
lines AS (
  SELECT {f['doc_id']} AS doc_id, event_type AS source, {f['line']} AS line
  FROM events
  WHERE substr(md5({f['doc_id']}), 1, 1) IN ('0', '1', '2', '3')
),
s0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(line) + 1), i -> CAST(i AS BIGINT))) AS pos,
         unnest(list_transform(range(1, length(line) + 1), i -> ord(line[i]))) AS val
  FROM lines
)"""


def _round_ctes(t: int) -> list[str]:
    """One BPE round: adjacent-pair counts -> deterministic argmax ->
    greedy-island merge -> re-ranked sequence s{t+1}."""
    new_id = _FIRST_ID + t
    return [
        f"""n{t} AS (
  SELECT doc_id, pos, val,
         lead(val) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM s{t}
)""",
        f"""c{t} AS (
  SELECT val AS a, nxt AS b, CAST(count(*) AS BIGINT) AS cnt
  FROM n{t} WHERE nxt IS NOT NULL GROUP BY 1, 2
)""",
        f"""t{t} AS (
  SELECT a, b, cnt FROM c{t} ORDER BY cnt DESC, a, b LIMIT 1
)""",
        # match islands: consecutive matching positions; greedy leftmost
        # == even parity offset from each island's start
        f"""m{t} AS (
  SELECT doc_id, pos FROM (
    SELECT n.doc_id, n.pos,
           n.pos - row_number() OVER (PARTITION BY n.doc_id ORDER BY n.pos) AS isl
    FROM n{t} n, t{t} t
    WHERE n.val = t.a AND n.nxt = t.b
  )
  QUALIFY (pos - min(pos) OVER (PARTITION BY doc_id, isl)) % 2 = 0
)""",
        # merged positions become new_id; the consumed right neighbor
        # (pos-1 selected) drops; positions re-rank to restore adjacency
        f"""s{t + 1} AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pos,
         CASE WHEN sel THEN {new_id} ELSE val END AS val
  FROM (
    SELECT s.doc_id, s.pos, s.val, m.pos IS NOT NULL AS sel
    FROM s{t} s
    LEFT JOIN m{t} m USING (doc_id, pos)
    ANTI JOIN m{t} mm ON mm.doc_id = s.doc_id AND mm.pos = s.pos - 1
  )
)""",
    ]


def _with_clause() -> str:
    ctes = [_duck_s0()]
    for t in range(_ROUNDS):
        ctes.extend(_round_ctes(t))
    return "WITH " + ",\n".join(ctes)


def _tok_checksum(tokens) -> F.Column:
    """sum((1-based pos) * token) — pins exact sequence content."""
    idx = F.sequence(F.lit(1), F.size(tokens))
    prods = F.zip_with(tokens, idx, lambda v, i: v.cast("long") * i.cast("long"))
    s = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(tokens) == 0, F.lit(0).cast("long")).otherwise(s)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, a, b, new_id, cnt): the fitted merge table for 3 BPE
    rounds over the line-byte corpus. Fitting runs eagerly (one
    pair-count shuffle + 1-row collect per round); the hash pins the
    full iteration history against the oracle's unrolled replay."""
    merges = bpe.bpe_fit(_raw(spark, sf_dir), rounds=_ROUNDS, first_new_id=_FIRST_ID)
    rows = [(r, a, b, nid, cnt) for r, (a, b, nid, cnt) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "round int, a int, b int, new_id int, cnt long"
    )


def q_bpe_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_out, checksum): every document re-encoded under the
    fitted merges — the inference path (zero-shuffle per-row folds).
    The positional checksum pins exact token content and order."""
    raw = _raw(spark, sf_dir)
    merges = bpe.bpe_fit(raw, rounds=_ROUNDS, first_new_id=_FIRST_ID)
    enc = bpe.apply_merges(raw, merges)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_out"),
        _tok_checksum(F.col("tokens")).alias("checksum"),
    )


def q_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, toks_before, toks_after): per-source corpus compression
    under the fitted merges — the fit's acceptance metric."""
    raw = _raw(spark, sf_dir)
    merges = bpe.bpe_fit(raw, rounds=_ROUNDS, first_new_id=_FIRST_ID)
    enc = bpe.apply_merges(raw, merges, out_col="_enc")
    return enc.groupBy("source").agg(
        F.sum(F.size("tokens").cast("long")).alias("toks_before"),
        F.sum(F.size("_enc").cast("long")).alias("toks_after"),
    )


SQL_BPE_MERGES = _with_clause() + "\n" + "\nUNION ALL\n".join(
    f"SELECT {t} AS round, CAST(a AS INTEGER) AS a, CAST(b AS INTEGER) AS b, "
    f"{_FIRST_ID + t} AS new_id, cnt FROM t{t}"
    for t in range(_ROUNDS)
)

SQL_BPE_ENCODED = _with_clause() + f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_out,
       CAST(sum(pos * val) AS BIGINT) AS checksum
FROM s{_ROUNDS} GROUP BY 1
"""

SQL_BPE_COMPRESSION = _with_clause() + f"""
SELECT l.source,
       CAST(sum(length(l.line)) AS BIGINT) AS toks_before,
       CAST(sum(e.n_out) AS BIGINT) AS toks_after
FROM lines l
JOIN (SELECT doc_id, count(*) AS n_out FROM s{_ROUNDS} GROUP BY 1) e
  USING (doc_id)
GROUP BY 1
"""


QUERIES = {
    "bpe_merges": q_bpe_merges,
    "bpe_encoded": q_bpe_encoded,
    "bpe_compression": q_bpe_compression,
}

ORACLES = {
    "bpe_merges": SQL_BPE_MERGES,
    "bpe_encoded": SQL_BPE_ENCODED,
    "bpe_compression": SQL_BPE_COMPRESSION,
}
