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


# ---------------------------------------------------------------------------
# Round 5: oracles for the three previously pytest-only streaming
# operators (r4 verdict #3) — error-correlation join, streaming dedup,
# CDC upsert apply. All use the stream_counts_multibatch determinism
# recipe: contiguous ascending event-time slices, one file per
# micro-batch, so the emitted set equals a batch-computable condition.
# ---------------------------------------------------------------------------


def _ascending_slices(spark: SparkSession, lines, base: str, n_slices: int,
                      extra_for_slice=None) -> None:
    """Write `lines` (must carry ts) as n contiguous ascending event-time
    slice files with ascending mtimes under base/in — batch i = slice i.
    extra_for_slice(i, slices) may return an extra frame unioned into
    slice i's file (duplicate injection)."""
    import glob
    import os
    import shutil

    from pyspark.sql.window import Window

    from ..operators import tokenize_op as tok

    sliced = lines.withColumn(
        "_slice", F.ntile(n_slices).over(Window.orderBy("ts", "doc_id"))
    ).persist()
    os.makedirs(base + "/in", exist_ok=True)
    try:
        for i in range(1, n_slices + 1):
            part = sliced.filter(F.col("_slice") == i)
            if extra_for_slice is not None:
                extra = extra_for_slice(i, sliced)
                if extra is not None:
                    part = part.unionByName(extra)
            part_dir = f"{base}/slice{i}"
            (
                tok.tokenize_lines(part.drop("ts", "_slice"))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            (src,) = glob.glob(part_dir + "/part-*.parquet")
            os.rename(src, f"{base}/in/{i:02d}.parquet")
            shutil.rmtree(part_dir, ignore_errors=True)
    finally:
        sliced.unpersist()


def _ts_lines(spark: SparkSession, sf_dir: str):
    """(doc_id, source, line, ts) — the common-format corpus WITH the
    event time kept for slicing."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    f = _frags("spark")
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        f"{f['doc_id']} AS doc_id",
        "event_type AS source",
        f"{f['line']} AS line",
        "ts",
    )


def q_stream_error_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join under FOUR real
    micro-batches: every 5xx event pairs with the same source's 2xx
    events in the preceding hour. Ascending contiguous slices mean no
    row is late and no needed join state is evicted early (an ok row is
    dropped only once ok_ts + horizon < watermark, and every future err
    that could need it has err_ts > watermark + horizon by slice
    ordering) — so the emitted set equals the plain batch interval
    join, which DuckDB states directly."""
    import atexit
    import os
    import shutil
    import tempfile

    from ..streaming import stream as stream_mod
    from ..plans.pipeline import PipelineConfig

    base = tempfile.mkdtemp(prefix="redeye_stream_corr_")
    try:
        _ascending_slices(spark, _ts_lines(spark, sf_dir), base, 4)
        q = stream_mod.start_error_correlation_stream(
            spark, base + "/in", base + "/out", base + "/ckpt",
            cfg=PipelineConfig(), key_col="source",
            horizon="1 hour", watermark="2 hours",
            trigger_available_now=True, max_files_per_trigger=1,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("error-correlation stream did not finish in 600s")
        n_batches = len(
            [p for p in os.listdir(base + "/ckpt/commits") if not p.startswith(".")]
        )
        if n_batches < 4:
            raise RuntimeError(f"expected >=4 micro-batches, got {n_batches}")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return spark.read.parquet(base + "/out").select(
        "err_doc_id",
        F.col("err_host").alias("err_source"),
        F.unix_micros(F.col("err_ts").cast("timestamp")).alias("err_ts_us"),
        F.col("err_status").cast("long").alias("err_status"),
        F.unix_micros(F.col("ok_ts").cast("timestamp")).alias("ok_ts_us"),
        "ok_uri",
    )


SQL_STREAM_ERROR_CORRELATION = f"""
WITH {_oracle_base()},
-- NCSA log timestamps carry whole seconds only, so the PARSED event
-- times are second-truncated; the join condition must compare the same
-- truncated values or hour-boundary pairs flip in/out of the horizon.
ok_rows AS (
  SELECT *, date_trunc('second', ts_utc) AS ts_sec
  FROM expected WHERE error_kind IS NULL
),
succ AS (
  SELECT source, ts_sec AS ok_ts, requested_uri AS ok_uri
  FROM ok_rows WHERE status_code BETWEEN 200 AND 299
),
err AS (
  SELECT doc_id AS err_doc_id, source AS err_source, ts_sec AS err_ts,
         status_code AS err_status
  FROM ok_rows WHERE status_code BETWEEN 500 AND 599
)
SELECT err_doc_id, err_source, epoch_us(err_ts) AS err_ts_us,
       CAST(err_status AS BIGINT) AS err_status,
       epoch_us(ok_ts) AS ok_ts_us, ok_uri
FROM err JOIN succ ON err.err_source = succ.source
 AND succ.ok_ts >= err.err_ts - INTERVAL 1 HOUR
 AND succ.ok_ts <= err.err_ts
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark) under two
    real micro-batches with INJECTED duplicates: slice 2's file carries
    byte-identical copies of slice 1's final hour (cross-batch dups —
    killed by dedup STATE, which is still alive because their event
    times are within the watermark horizon) and of part of slice 2
    itself (in-batch dups). Every duplicate's original precedes it, so
    the emitted set is exactly the distinct ok rows — the batch dedup
    answer, stated by the oracle without modeling the injection at
    all."""
    import atexit
    import os
    import shutil
    import tempfile

    from ..streaming import stream as stream_mod
    from ..plans.pipeline import PipelineConfig

    base = tempfile.mkdtemp(prefix="redeye_stream_dd_")

    def dup_injection(i: int, sliced):
        if i != 2:
            return None
        s1_max = F.max(F.when(F.col("_slice") == 1, F.col("ts")))
        cross = sliced.filter(F.col("_slice") == 1).join(
            F.broadcast(sliced.agg(s1_max.alias("m"))),
            F.col("ts") >= F.col("m") - F.expr("INTERVAL 1 HOUR"),
        ).drop("m")
        inbatch = sliced.filter(
            (F.col("_slice") == 2) & (F.xxhash64("doc_id") % 5 == 0)
        )
        return cross.unionByName(inbatch)

    try:
        _ascending_slices(spark, _ts_lines(spark, sf_dir), base, 2,
                          extra_for_slice=dup_injection)
        q = stream_mod.start_dedup_stream(
            spark, base + "/in", base + "/out", base + "/ckpt",
            cfg=PipelineConfig(), watermark="2 hours", key_cols=("doc_id",),
            trigger_available_now=True, max_files_per_trigger=1,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("dedup stream did not finish in 600s")
        n_batches = len(
            [p for p in os.listdir(base + "/ckpt/commits") if not p.startswith(".")]
        )
        if n_batches < 2:
            raise RuntimeError(f"expected >=2 micro-batches, got {n_batches}")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    # status_code is NULL on the '-' slice -> cast DOUBLE on both sides
    # (nullable-int pandas dtype class flaps with the head-50 sample)
    return spark.read.parquet(base + "/out").select(
        "doc_id", "source",
        F.col("status_code").cast("double").alias("status_code"),
        F.unix_micros(F.col("timestamp").cast("timestamp")).alias("ts_us"),
    )


SQL_STREAM_DEDUP = f"""
WITH {_oracle_base()}
SELECT doc_id, source, CAST(status_code AS DOUBLE) AS status_code,
       epoch_us(date_trunc('second', ts_utc)) AS ts_us
FROM expected WHERE error_kind IS NULL
"""


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply end to end: three change files stream through
    start_upsert_stream (one micro-batch per file, arrival order =
    batch order) into a latest-wins table. Batch membership is a pure
    function of o_orderkey % 10, so DuckDB states the final table as a
    CASE over the winning batch — verifying merge semantics, arrival
    ordering, and the crash-safe rewrite in one hash."""
    import atexit
    import glob
    import os
    import shutil
    import tempfile

    from ..sources.io import ParquetIO
    from ..streaming import stream as stream_mod

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    batches = [
        ("v0", "pmod(o_orderkey, 10) IN (0,1,2,3,4)"),
        ("v1", "pmod(o_orderkey, 10) IN (3,4,5,6)"),
        ("v2", "pmod(o_orderkey, 10) IN (0,6,7)"),
    ]
    base = tempfile.mkdtemp(prefix="redeye_stream_cdc_")
    io = ParquetIO(base + "/tables")
    try:
        os.makedirs(base + "/in")
        for i, (val, cond) in enumerate(batches):
            change = orders.filter(cond).selectExpr(
                "o_orderkey AS k",
                f"'{val}' AS val",
                f"round(CAST(o_totalprice AS DOUBLE) + {i}, 2) AS price",
            )
            part_dir = f"{base}/b{i}"
            change.coalesce(1).write.mode("overwrite").parquet(part_dir)
            (src,) = glob.glob(part_dir + "/part-*.parquet")
            os.rename(src, f"{base}/in/{i:02d}.parquet")  # ascending mtimes
            shutil.rmtree(part_dir, ignore_errors=True)
        q = stream_mod.start_upsert_stream(
            spark, base + "/in", "k BIGINT, val STRING, price DOUBLE",
            io, "cdc_table", key_cols=["k"], checkpoint=base + "/ckpt",
            trigger_available_now=True, max_files_per_trigger=1,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("CDC upsert stream did not finish in 600s")
        n_batches = len(
            [p for p in os.listdir(base + "/ckpt/commits") if not p.startswith(".")]
        )
        if n_batches < 3:
            raise RuntimeError(f"expected >=3 micro-batches, got {n_batches}")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return io.read(spark, "cdc_table").select("k", "val", "price")


# winner per key = the LAST batch whose membership predicate holds
SQL_STREAM_UPSERT = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 10 IN (0, 6, 7) THEN 'v2'
            WHEN o_orderkey % 10 IN (3, 4, 5) THEN 'v1'
            ELSE 'v0' END AS val,
       round(CAST(o_totalprice AS DOUBLE)
             + CASE WHEN o_orderkey % 10 IN (0, 6, 7) THEN 2
                    WHEN o_orderkey % 10 IN (3, 4, 5) THEN 1
                    ELSE 0 END, 2) AS price
FROM orders
WHERE o_orderkey % 10 <= 7
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session windows under readStream with merging state: the
    same session_window_stats operator as the batch twin, driven through
    a watermarked stream. Single availableNow batch -> no intra-stream
    late drops; append mode emits exactly the sessions the TERMINAL
    watermark closed (session end = last event + gap <= max event time
    - 2h), a condition the batch oracle states with one HAVING clause."""
    import atexit
    import shutil
    import tempfile

    from ..streaming import stream as stream_mod
    from ..plans.pipeline import PipelineConfig

    base = tempfile.mkdtemp(prefix="redeye_stream_sess_")
    try:
        raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir)).coalesce(1)
        raw.write.mode("overwrite").parquet(base + "/in")
        q = stream_mod.start_session_stream(
            spark, base + "/in", base + "/out", base + "/ckpt",
            cfg=PipelineConfig(), key_col="remote_host",
            gap="30 minutes", watermark="2 hours",
            trigger_available_now=True,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("session stream did not finish in 600s")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return spark.read.parquet(base + "/out").select(
        "remote_host",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start_str"),
        "n_requests",
        "duration_sec",
    )


# the batch session oracle + the terminal-watermark close condition:
# a session is emitted iff last_event + gap <= max(event_time) - 2h
SQL_STREAM_SESSIONS = f"""
WITH {_oracle_base()},
ok AS (
  SELECT remote_host, date_trunc('second', ts_utc) AS t
  FROM expected WHERE error_kind IS NULL AND remote_host IS NOT NULL
),
s AS (
  SELECT remote_host, t,
         CASE WHEN lag(t) OVER w IS NULL
                   OR epoch(t) - epoch(lag(t) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_s
  FROM ok WINDOW w AS (PARTITION BY remote_host ORDER BY t)
),
s2 AS (
  SELECT remote_host, t,
         SUM(new_s) OVER (PARTITION BY remote_host ORDER BY t ROWS UNBOUNDED PRECEDING) AS sn
  FROM s
)
SELECT remote_host,
       strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS start_str,
       COUNT(*) AS n_requests,
       CAST(MAX(epoch(t)) - MIN(epoch(t)) AS BIGINT) AS duration_sec
FROM s2 GROUP BY remote_host, sn
HAVING MAX(epoch(t)) + 1800 <= (SELECT MAX(epoch(t)) - 7200 FROM ok)
"""


QUERIES = {
    "stream_counts": q_stream_counts,
    "stream_counts_multibatch": q_stream_counts_multibatch,
    "stream_error_correlation": q_stream_error_correlation,
    "stream_dedup": q_stream_dedup,
    "stream_upsert": q_stream_upsert,
    "stream_sessions": q_stream_sessions,
}

ORACLES = {
    "stream_counts": SQL_STREAM_COUNTS,
    # no-late-rows ascending slices make the multi-batch emitted set
    # identical to the terminal-watermark condition — same oracle
    "stream_counts_multibatch": SQL_STREAM_COUNTS,
    "stream_error_correlation": SQL_STREAM_ERROR_CORRELATION,
    "stream_dedup": SQL_STREAM_DEDUP,
    "stream_upsert": SQL_STREAM_UPSERT,
    "stream_sessions": SQL_STREAM_SESSIONS,
}
