"""Per-chunk checkpoint/resume with lineage + metrics (north_rule).

Spark batch jobs have no built-in partial-resume; this implements it at
the plan level: the input keyspace is split into deterministic chunks
(`chunk_id = pmod(xxhash64(doc_id), n_chunks)`), each chunk runs as an
independent pipeline pass appending to the same sinks, and a manifest
records per-chunk lineage (input fingerprint, row counts, wall time,
config). Resume skips chunks whose manifest entry is complete, so a
killed run continues where it stopped and the final sinks are identical
to an uninterrupted run (FIXTURES §3.5).

At cluster scale each chunk is a partition-range of the Iceberg table
(or a predicate on its partition column); hashing doc_id keeps chunks
deterministic and stable across cluster sizes, and the per-chunk write
is the commit unit.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline import PipelineConfig, build_tagged
from ..operators import aggregate as agg_op
from ..operators import route as route_op
from ..sources.io import TableIO

MANIFEST = "manifest.json"


def chunk_column(n_chunks: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_chunks))


def _manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, MANIFEST)


def load_manifest(checkpoint_dir: str) -> dict:
    p = _manifest_path(checkpoint_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"chunks": {}}


def _save_manifest(checkpoint_dir: str, manifest: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = _manifest_path(checkpoint_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(checkpoint_dir))  # atomic commit


def input_fingerprint(raw: DataFrame, chunk: int, n_chunks: int) -> dict:
    """Cheap order-insensitive lineage fingerprint of one input chunk:
    row count + xor/sum of doc_id hashes. Computed Spark-side, O(rows)."""
    row = (
        raw.filter(chunk_column(n_chunks) == chunk)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr("bit_xor(xxhash64(doc_id))").alias("hash_sum"),
        )
        .collect()[0]
    )
    return {"rows": row["rows"], "hash_sum": str(row["hash_sum"])}


def run_checkpointed(
    spark: SparkSession,
    raw: DataFrame,
    io: TableIO,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    n_chunks: int = 8,
    source_dim: DataFrame | None = None,
    events_table: str = "events",
    agg_table: str = "agg_counts",
    fail_after: int | None = None,  # test hook: raise after k chunks
) -> dict:
    """Run the pipeline chunk-by-chunk with resume.

    Returns the manifest. Sinks receive one append per chunk; aggregates
    are written per-chunk and re-aggregated on read (sum of partial
    counts — associative, so chunking never changes results).
    """
    cfg = cfg or PipelineConfig()
    manifest = load_manifest(checkpoint_dir)
    manifest.setdefault("n_chunks", n_chunks)
    if manifest["n_chunks"] != n_chunks:
        raise ValueError(
            f"resume with n_chunks={n_chunks} but manifest has {manifest['n_chunks']}"
        )
    done = 0
    for chunk in range(n_chunks):
        key = str(chunk)
        entry = manifest["chunks"].get(key)
        if entry and entry.get("status") == "complete":
            continue
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"injected failure after {done} chunks")

        t0 = time.monotonic()
        part = raw.filter(chunk_column(n_chunks) == chunk)
        fp = input_fingerprint(raw, chunk, n_chunks)

        # part_id records the physical parse partition per row, so the
        # manifest can carry per-partition metrics (north_rule lineage).
        tagged = (
            build_tagged(spark, part, cfg, source_dim)
            .withColumn("chunk_id", F.lit(chunk))
            .withColumn("part_id", F.spark_partition_id())
        )
        # Idempotent commit unit: each chunk overwrites only its own
        # chunk_id=... partitions, so a rerun of a half-written chunk
        # (killed after the sink write but before the manifest write)
        # replaces rather than duplicates. No persist — the committed
        # chunk partitions are the reuse point (partition-pruned reads).
        io.write(tagged, events_table, mode="overwrite_partitions", partition_by=["chunk_id", "sink"])
        chunk_events = io.read(spark, events_table).filter(F.col("chunk_id") == chunk)
        counts = (
            agg_op.salted_counts(chunk_events, cfg.bucket_granularity, cfg.salt_buckets)
            if cfg.use_salted_agg
            else agg_op.sink_counts(chunk_events, cfg.bucket_granularity)
        ).withColumn("chunk_id", F.lit(chunk))
        io.write(counts, agg_table, mode="overwrite_partitions", partition_by=["chunk_id"])
        per_sink = {
            r["sink"]: r["n"]
            for r in counts.groupBy("sink").agg(F.sum("n").alias("n")).collect()
        }
        per_partition = [
            {"part_id": r["part_id"], "rows": r["rows"], "err": r["err"]}
            for r in (
                chunk_events.groupBy("part_id")
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.count(F.when(F.col("error_kind").isNotNull(), 1)).alias("err"),
                )
                .orderBy("part_id")
                .collect()
            )
        ]

        rows_err = per_sink.get(route_op.DEAD_LETTER, 0)
        manifest["chunks"][key] = {
            "status": "complete",
            "input": fp,
            "rows_in": sum(per_sink.values()),
            "rows_ok": sum(per_sink.values()) - rows_err,
            "rows_err": rows_err,
            "sinks": per_sink,
            "partitions": per_partition,
            "wall_sec": round(time.monotonic() - t0, 3),
            "config": {"fmt": cfg.fmt, "salt_buckets": cfg.salt_buckets},
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _save_manifest(checkpoint_dir, manifest)
        done += 1
    return manifest


def final_counts(spark: SparkSession, io: TableIO, agg_table: str = "agg_counts") -> DataFrame:
    """Re-aggregate per-chunk partial counts into the final table."""
    df = io.read(spark, agg_table)
    keys = ["sink", "bucket"] + agg_op.AGG_KEYS
    return df.groupBy(*keys).agg(F.sum("n").alias("n"))
