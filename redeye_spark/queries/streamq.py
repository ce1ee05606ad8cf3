"""Structured Streaming queries (availableNow batch-equivalent)."""

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

def q_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end to end under a full oracle: the derived
    corpus streams through readStream -> the SAME parse/enrich/tag plan
    -> watermarked 1-hour windowed counts (append mode, availableNow).
    Single input file + single micro-batch makes it deterministic: no
    intra-stream late-drops, and exactly the windows whose end the
    terminal watermark (max event time - 2h) has passed are emitted —
    a condition DuckDB reproduces from first principles. Multi-batch
    behavior (real late-data handling) is pytest-covered."""
    import atexit
    import shutil
    import tempfile

    from ..streaming import stream as stream_mod
    from ..plans.pipeline import PipelineConfig

    base = tempfile.mkdtemp(prefix="redeye_stream_q_")
    try:
        raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir)).coalesce(1)
        raw.write.mode("overwrite").parquet(base + "/in")
        q = stream_mod.start_windowed_counts(
            spark, base + "/in", base + "/out", base + "/ckpt",
            cfg=PipelineConfig(), window="1 hour", watermark="2 hours",
            trigger_available_now=True, max_files_per_trigger=None,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_counts query did not finish within 600s")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    # Free the bulky scratch (corpus copy + checkpoint) now; the windowed
    # OUTPUT parquet stays on disk until process exit and is returned as a
    # lazy scan — no driver-side collect of an unbounded (hour x sink x
    # method x source) result.
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return spark.read.parquet(base + "/out").select(
        "sink",
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket_str"),
        "status_class", "method", "source", "n",
    )


# Watermark semantics replicated: a window [start, start+1h) is emitted
# iff start + 1h <= max(event_time) - 2h. Only ok rows reach the
# aggregation (error rows carry NULL timestamps).
SQL_STREAM_COUNTS = f"""
WITH {_oracle_base()},
ok AS (SELECT * FROM expected WHERE error_kind IS NULL),
wm AS (SELECT max(ts_utc) - INTERVAL 2 HOUR AS w FROM ok)
SELECT CASE WHEN status_code BETWEEN 200 AND 299 THEN 'sink_2xx'
            WHEN status_code BETWEEN 300 AND 399 THEN 'sink_3xx'
            WHEN status_code BETWEEN 400 AND 599 THEN 'sink_4xx5xx'
            ELSE 'sink_other' END AS sink,
       strftime(date_trunc('hour', ts_utc), '%Y-%m-%d %H:00:00') AS bucket_str,
       CASE WHEN status_code IS NOT NULL THEN CAST(floor(status_code / 100) AS BIGINT) || 'xx' END AS status_class,
       method, source, COUNT(*) AS n
FROM ok, wm
WHERE date_trunc('hour', ts_utc) + INTERVAL 1 HOUR <= wm.w
GROUP BY ALL
"""




# ---------------------------------------------------------------------------
# Round 3: fact x fact shuffle join, set ops, sketch percentiles
# ---------------------------------------------------------------------------



def q_stream_counts_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME windowed-count stream as stream_counts, but driven
    through FOUR micro-batches (maxFilesPerTrigger=1 over four input
    files) so cross-batch aggregation-state carry and progressive
    watermark eviction are exercised for real — the semantics the
    single-batch query can't reach.

    Determinism: the corpus is split into four CONTIGUOUS event-time
    slices written in ascending order (the file stream source processes
    oldest-modified first), so no row is ever late — every row arrives
    at-or-after the running max event time, nothing is ever dropped at
    the watermark, and the emitted set is exactly "windows closed by
    the FINAL watermark": the same terminal condition the single-batch
    oracle states in SQL. Equal-timestamp rows may straddle a slice
    boundary, but a tie can never fall into an already-closed window (a
    window closes only once a strictly later event has been seen).
    The ntile slicer runs on one reducer — corpus construction for the
    oracle harness, not the data plane (the stream itself is the thing
    under test)."""
    import atexit
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql.window import Window

    from ..streaming import stream as stream_mod
    from ..plans.pipeline import PipelineConfig

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    f = _frags("spark")
    lines = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        f"{f['doc_id']} AS doc_id",
        "event_type AS source",
        f"{f['line']} AS line",
        "ts",
    )
    lines = lines.withColumn(
        "_slice", F.ntile(4).over(Window.orderBy("ts", "doc_id"))
    )
    base = tempfile.mkdtemp(prefix="redeye_stream_mb_")
    try:
        os.makedirs(base + "/in")
        for i in range(1, 5):
            part_dir = f"{base}/slice{i}"
            (
                tokenize_op.tokenize_lines(
                    lines.filter(F.col("_slice") == i).drop("ts", "_slice")
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            (src,) = glob.glob(part_dir + "/part-*.parquet")
            # ascending names AND ascending mtimes (written sequentially):
            # the file source takes oldest-first, so batch i = slice i
            os.rename(src, f"{base}/in/{i:02d}.parquet")
            shutil.rmtree(part_dir, ignore_errors=True)
        q = stream_mod.start_windowed_counts(
            spark, base + "/in", base + "/out", base + "/ckpt",
            cfg=PipelineConfig(), window="1 hour", watermark="2 hours",
            trigger_available_now=True, max_files_per_trigger=1,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("multibatch stream query did not finish within 600s")
        n_batches = len(
            [p for p in os.listdir(base + "/ckpt/commits") if not p.startswith(".")]
        )
        if n_batches < 4:
            raise RuntimeError(
                f"expected >=4 committed micro-batches, got {n_batches}"
            )
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return spark.read.parquet(base + "/out").select(
        "sink",
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket_str"),
        "status_class", "method", "source", "n",
    )


QUERIES = {
    "stream_counts": q_stream_counts,
    "stream_counts_multibatch": q_stream_counts_multibatch,
}

ORACLES = {
    "stream_counts": SQL_STREAM_COUNTS,
    # no-late-rows ascending slices make the multi-batch emitted set
    # identical to the terminal-watermark condition — same oracle
    "stream_counts_multibatch": SQL_STREAM_COUNTS,
}
