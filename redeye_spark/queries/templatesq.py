"""Log-template mining queries (operators/templates.py).

- log_templates: the template census over the NCSA common-format line
  corpus — masked-structure counts, source spread, canonical example.
- rare_templates: the frequency anomaly screen — every line whose
  template covers <= 0.1% of the corpus.

The oracles do NOT run the masking regexes: they derive each line's
expected template from FIRST PRINCIPLES out of the same event-field
arithmetic that constructs the lines (_shared._frags), so a Spark-side
masking bug (wrong rule order, an unmasked field) hash-mismatches
instead of being replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..operators import templates
from ._shared import _frags, _spark_lines, _utc


def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template census: chained-regexp masking inside codegen, one
    partial-aggregated shuffle of distinct templates (~70 rows at any
    scale factor)."""
    _utc(spark)
    out = templates.mine_templates(_spark_lines(spark, sf_dir))
    return out.select(
        "template",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_sources").cast("long").alias("n_sources"),
        "example",
    )


def _duck_template() -> str:
    """DuckDB CTE (doc_id, source, line, template): expected template
    per line, derived from event arithmetic — no regex anywhere."""
    f = _frags("duck")
    ident_m = "CASE WHEN event_id % 11 = 7 THEN 'svc<NUM>' ELSE '-' END"
    user_m = "CASE WHEN user_id % 5 = 0 THEN '-' ELSE 'u<NUM>' END"
    status_m = (f"CASE WHEN {f['badk']} = 'badint' THEN 'NaN' "
                "WHEN event_id % 97 = 0 THEN '-' ELSE '<NUM>' END")
    clen_m = "CASE WHEN event_id % 13 = 0 THEN '-' ELSE '<NUM>' END"
    return f"""
tl AS (
  SELECT {f['doc_id']} AS doc_id, event_type AS source, {f['line']} AS line,
    CASE WHEN {f['badk']} = 'garbage'
         THEN 'this is not a log line <NUM>'
         ELSE '<IP> ' || {ident_m} || ' ' || {user_m} || ' <TS> "'
              || {f['method']} || ' /api/v<NUM>/item/<NUM> HTTP/<NUM>.<NUM>" '
              || {status_m} || ' ' || {clen_m}
    END AS template
  FROM events
)"""


SQL_LOG_TEMPLATES = f"""
WITH {_duck_template()}
SELECT template, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       min(line) AS example
FROM tl GROUP BY template
"""


def q_rare_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency anomaly screen: templates covering <= 0.1% of lines,
    joined back over the line stream via a broadcast of the (bounded)
    rare-template set."""
    _utc(spark)
    out = templates.rare_template_lines(
        _spark_lines(spark, sf_dir), max_share=0.001
    )
    return out.select("doc_id", "template")


SQL_RARE_TEMPLATES = f"""
WITH {_duck_template()},
census AS (SELECT template, count(*) AS n FROM tl GROUP BY template),
tot AS (SELECT sum(n) AS t FROM census),
rare AS (SELECT template FROM census, tot WHERE n * 1000 <= t)
SELECT tl.doc_id, tl.template FROM tl JOIN rare USING (template)
"""


def q_stream_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The template census computed INCREMENTALLY: the line corpus is
    split into 4 files, streamed one file per micro-batch through
    foreachBatch partial censuses, and the partials merge on read.
    Sharing log_templates' first-principles oracle hash-pins the
    streamed+merged census to the batch result — the census is a
    mergeable sketch, so micro-batching cannot change it."""
    import atexit
    import shutil
    import tempfile

    from ..streaming import stream as stream_mod

    _utc(spark)
    base = tempfile.mkdtemp(prefix="redeye_tpl_stream_")
    try:
        _spark_lines(spark, sf_dir).repartition(4).write.mode(
            "overwrite"
        ).parquet(base + "/in")
        q = stream_mod.start_template_census_stream(
            spark, base + "/in", base + "/partials", base + "/ckpt",
            max_files_per_trigger=1, trigger_available_now=True,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_templates did not finish within 600s")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    out = stream_mod.merge_template_census(spark, base + "/partials")
    return out.select(
        "template",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_sources").cast("long").alias("n_sources"),
        "example",
    )


QUERIES = {
    "log_templates": q_log_templates,
    "rare_templates": q_rare_templates,
    "stream_templates": q_stream_templates,
}

ORACLES = {
    "log_templates": SQL_LOG_TEMPLATES,
    "rare_templates": SQL_RARE_TEMPLATES,
    "stream_templates": SQL_LOG_TEMPLATES,
}
