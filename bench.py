"""Benchmark harness (driver contract + BASELINE.md protocol).

Measures:
  1. Headline: parsed+routed rows/sec of the full pipeline (tokenized
     corpus -> parse -> enrich -> route -> sinks -> aggregates) at TWO
     parallelism levels — local[8] vs local[32] — as the sandbox proxy
     for N vs 4N executors; reports both throughputs and the scaling
     efficiency (= (T32/T8)/4, target >= 0.8 per BASELINE.json).
  2. Per-query wall seconds for the entry queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line. The corpus is generated once (seeded, size scaled
to the SF dir's events table) and cached under /tmp/redeye_bench.

Usage: python bench.py            — full run
       python bench.py --worker --master local[8] --input ... --out ...
                                  — internal: one pipeline run, prints JSON
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_BASE = os.environ.get(
    "REDEYE_BENCH_DIR",
    "/dev/shm/redeye_bench" if os.path.isdir("/dev/shm") else "/tmp/redeye_bench",
)
ROWS_PER_EVENT = 6  # corpus size multiplier over the SF events table
SEED = 42

# Queries timed individually (representative of SURVEY §2 families).
TIMED_QUERIES = [
    "parse_common",
    "agg_counts_hour",
    "route_counts",
    "token_roundtrip",
    "lineitem_pricing",
    "nation_revenue",
    "last_event_per_user",
]


def _corpus_rows() -> int:
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    n = n_events * ROWS_PER_EVENT
    # Scaling efficiency needs compute-dominated runs: at bench scale
    # (sf >= 0.1) pad to 3M rows so fixed startup (~10 s: Python worker
    # spawn + codegen) stops dominating the local[8] vs local[32] ratio.
    if n >= 600_000:
        n = max(n, 3_000_000)
    return n


def ensure_corpus(path: str, n: int) -> None:
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return
    from redeye_spark.sources.datagen import write_input_table

    # >= 64 files so a local[32] scan gets split-parallelism without a
    # pre-UDF repartition shuffle.
    write_input_table(path, n, fmt="combined", seed=SEED, chunk=max(10_000, n // 64))
    open(marker, "w").write(str(n))


def worker(master: str, input_path: str, out_path: str) -> None:
    """One full pipeline run; prints {"wall_sec":..,"rows_in":..} JSON.

    CPU affinity is pinned to n_threads cores: a cluster of N executors
    has N cores TOTAL, so an honest local[N] proxy must not let its JVM
    task threads + Python workers free-ride on the other 32-N cores
    (unpinned local[8] overlaps Python and JVM across 16+ cores, which
    no 8-core cluster could, and the 8->32 ratio then understates real
    cluster scaling)."""
    from redeye_spark.session import get_spark
    from redeye_spark.functions.logparse import FORMAT_COMBINED
    from redeye_spark.plans.pipeline import PipelineConfig, run_pipeline
    from redeye_spark.sources.io import ParquetIO

    n_threads = int(master.split("[")[1].rstrip("]"))
    try:
        os.sched_setaffinity(0, range(n_threads))  # inherited by JVM + py workers
    except (AttributeError, OSError):
        pass
    spark = get_spark("bench-worker", master=master, shuffle_partitions=n_threads * 2)
    shutil.rmtree(out_path, ignore_errors=True)
    raw = spark.read.parquet(input_path)
    # No explicit repartition: the corpus is written as 64+ files, so the
    # scan is already split-parallel and the parse needs no shuffle. (The
    # repartition path stays available for few-file / skewed inputs.)
    cfg = PipelineConfig(fmt=FORMAT_COMBINED, num_partitions=None)
    t0 = time.monotonic()
    res = run_pipeline(spark, raw, ParquetIO(out_path), cfg)
    wall = time.monotonic() - t0
    print(json.dumps({"wall_sec": wall, "rows_in": res.rows_in, "rows_err": res.rows_err}))
    spark.stop()


def run_worker_subprocess(master: str, input_path: str, out_path: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "--master", master,
         "--input", input_path, "--out", out_path],
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"worker {master} failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--worker" in sys.argv:
        args = dict(zip(sys.argv[2::2], sys.argv[3::2]))
        worker(args["--master"], args["--input"], args["--out"])
        return

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    n = _corpus_rows()
    corpus = os.path.join(BENCH_BASE, f"sf{sf}_n{n}", "raw")
    ensure_corpus(corpus, n)

    # --- scaling runs (sandbox proxy for N vs 4N executors) ---
    lo, hi = 8, min(32, CPUS)
    out_lo = os.path.join(BENCH_BASE, "out_lo")
    out_hi = os.path.join(BENCH_BASE, "out_hi")
    r_lo = run_worker_subprocess(f"local[{lo}]", corpus, out_lo)
    r_hi = run_worker_subprocess(f"local[{hi}]", corpus, out_hi)
    tput_lo = r_lo["rows_in"] / r_lo["wall_sec"]
    tput_hi = r_hi["rows_in"] / r_hi["wall_sec"]
    efficiency = (tput_hi / tput_lo) / (hi / lo)

    # --- per-query timings on a local[CPUS] session ---
    from redeye_spark.session import get_spark
    from redeye_spark import entry_queries as EQ

    spark = get_spark("bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries: dict[str, float] = {}
    for name in TIMED_QUERIES:
        q = EQ.QUERIES[name]
        t0 = time.monotonic()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.monotonic() - t0, 3)
    spark.stop()

    print(json.dumps({
        "metric": "full pipeline (parse+enrich+route+sinks+agg) wall sec at local[%d], sf%s corpus %d rows" % (hi, sf, n),
        "value": round(r_hi["wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "corpus_rows": n,
        "rows_per_sec_local8": round(tput_lo, 1),
        "rows_per_sec_local32": round(tput_hi, 1),
        "scaling_efficiency_8_to_32": round(efficiency, 3),
        "rows_err": r_hi["rows_err"],
    }))


if __name__ == "__main__":
    main()
