"""Log template mining — Drain-lite pattern extraction over raw lines.

Real log pipelines (the reference's domain: a CLI that eats NCSA access
logs, README.md:7-20) almost always include a template-mining step:
collapse each raw line to a structural TEMPLATE by masking the
variable fields (IPs, timestamps, numbers), then count lines per
template. The template table is the log's "schema census" — the top
templates are the traffic shape, the rare ones are the anomalies worth
paging on. This is the batch-analytics generalization of tools like
Drain / Spell, restricted to deterministic regex masking so the result
is exactly reproducible (and oracle-checkable) on any engine.

Scale shape: masking is a chain of `regexp_replace` expressions that
run INSIDE whole-stage codegen (no UDF, no Python); the groupBy
template is a standard two-phase partial aggregate, so the shuffle
carries one row per DISTINCT template (dozens-to-thousands) regardless
of corpus size. `rare_template_lines` broadcasts the rare-template set
(bounded by the template census, not the corpus) back over the line
stream — the corpus is scanned, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Ordered masking rules. Patterns deliberately use only portable regex
# (character classes, bounded repetition — no lookaround, no backrefs)
# so Java regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
# Order matters: IPs must be masked before bare-number masking eats
# their octets, and bracketed timestamps before their digits.
DEFAULT_MASKS: tuple[tuple[str, str], ...] = (
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\[[^\]]*\]", "<TS>"),
    (r"\d+", "<NUM>"),
)


def template_expr(line_col: str, masks=DEFAULT_MASKS):
    """Column expression computing the masked template of `line_col` —
    a pure codegen projection (chained regexp_replace)."""
    c = F.col(line_col)
    for pat, token in masks:
        c = F.regexp_replace(c, pat, token)
    return c


def mine_templates(
    df: DataFrame,
    line_col: str = "line",
    source_col: str = "source",
    masks=DEFAULT_MASKS,
) -> DataFrame:
    """(template, n_lines, n_sources, example) — the template census.

    `example` is the lexicographically smallest raw line of the
    template (deterministic representative; min() folds map-side so
    only one candidate line per template per partition shuffles).
    """
    t = df.select(
        template_expr(line_col, masks).alias("template"),
        F.col(source_col).alias("_src"),
        F.col(line_col).alias("_line"),
    )
    return t.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count_distinct("_src").alias("n_sources"),
        F.min("_line").alias("example"),
    )


def rare_template_lines(
    df: DataFrame,
    line_col: str = "line",
    id_col: str = "doc_id",
    max_share: float = 0.001,
    masks=DEFAULT_MASKS,
) -> DataFrame:
    """(id_col, template) — every line whose template covers at most
    `max_share` of the corpus: the template-frequency anomaly screen.

    The share test is exact-integer (n_lines * denom <= total) — no
    float division crosses the engine boundary. The rare-template set
    is corpus-size-independent (bounded by the census), so it
    broadcasts; the line stream is scanned once and never shuffled.
    """
    if not (0.0 < max_share < 1.0):
        raise ValueError(f"max_share must be in (0, 1), got {max_share}")
    # express the share as an exact integer ratio num/den
    from fractions import Fraction

    fr = Fraction(max_share).limit_denominator(10**9)
    num, den = fr.numerator, fr.denominator
    census = mine_templates(df, line_col=line_col, masks=masks)
    total = census.agg(F.sum("n_lines").alias("_total"))
    rare = (
        census.crossJoin(F.broadcast(total))
        .filter(F.col("n_lines") * den <= F.col("_total") * num)
        .select("template")
    )
    lines = df.select(
        F.col(id_col), template_expr(line_col, masks).alias("template")
    )
    return lines.join(F.broadcast(rare), "template").select(id_col, "template")
