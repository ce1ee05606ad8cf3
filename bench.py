"""Benchmark harness (driver contract + BASELINE.md protocol).

Measures:
  1. Headline: parsed+routed rows/sec of the full pipeline (tokenized
     corpus -> parse -> enrich -> route -> sinks -> aggregates) at TWO
     cluster sizes — N=1 executor vs 4N=4 executors, each executor a
     separate 2-core-pinned JVM with its own Python workers and sinks,
     processing a disjoint shard of the same corpus. This is the
     faithful single-box proxy for executor scaling: executors on real
     nodes are exactly this (independent JVMs sharing a memory bus).
     Reports both throughputs and efficiency = (tput_4N / tput_N) / 4,
     target >= 0.8 per BASELINE.json.
  2. Per-query wall seconds for the entry queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line. The corpus is generated once (seeded, sized off
the SF events table, min 3M rows at bench scale) and cached on tmpfs.

Why thread-scaling (local[2] vs local[8]) is NOT the headline: this
VM's memory-bound parse kernel scales 2->8 *processes* at only 0.84
(pure multiprocessing, no Spark — hardware bandwidth/SMT ceiling), so a
single-JVM thread ramp conflates hardware ceiling with pipeline
quality. The multi-JVM topology matches how clusters actually deploy.

Usage: python bench.py                      — full run
       python bench.py --exec-worker <shard> <cores lo-hi> <input> <out>
                                            — internal single-executor run
"""

from __future__ import annotations

import glob
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
CORES_PER_EXECUTOR = int(os.environ.get("REDEYE_EXEC_CORES", "2"))
N_EXECUTORS_HI = int(os.environ.get("REDEYE_EXEC_HI", "4"))

TIMED_QUERIES = [
    "parse_common",
    "agg_counts_hour",
    "route_counts",
    "token_roundtrip",
    "lineitem_pricing",
    "nation_revenue",
    "last_event_per_user",
    # round 3: the fact x fact shuffle-join shapes
    "order_priority_counts",
    "shipping_revenue",
    # round 3b: as-of (single-exchange window) and Q5 star join
    "asof_last_order",
    "regional_revenue",
    # round 4: hot-key-safe bucketed as-of (3 exchanges vs 1 — the
    # skew-insurance overhead should stay a small constant factor)
    "asof_bucketed",
    # round 5: the LLM-ops families enter the timed set (r4 verdict #4 —
    # a 2x dedup/ANN regression was machine-invisible before)
    "minhash_pairs",
    "similarity_topk",
    "dedup_exact_hashed",
    # round 5b: the tokens-axis n-gram path (explode -> same-stage
    # partial agg; a regression in the higher-order-function gram
    # builder or the map-side collapse shows up here first)
    "token_bigrams",
    # round 6: the new curation families — DSIR scoring (explode ->
    # cell agg -> broadcast dot product) and k-means (3 Lloyd's rounds:
    # iterative bounded collects + codegen assignment)
    "dsir_scores",
    "kmeans_assign",
    # round 6b: SemDeDup — kmeans fit + the cluster-blocked pair
    # search (an equi-join fanning to ~500k in-block candidate pairs
    # at sf0.1, each a 64-dim integer dot in codegen)
    "semantic_dup_pairs",
]

# Pinned per-query baselines: best recorded sf0.1 wall seconds from the
# round-3 runs (BENCH_r03.json + the quiet-host samples in
# BENCH/BASELINE.md). queries_vs_baseline in the output is
# measured/baseline — a ratio > 2 on a quiet host is a machine-visible
# regression, not noise (host variance is documented at +/-30%).
QUERY_BASELINES_S = {
    "parse_common": 2.45,
    "agg_counts_hour": 5.19,
    "route_counts": 3.69,
    "token_roundtrip": 3.41,
    "lineitem_pricing": 0.93,
    "nation_revenue": 0.72,
    "last_event_per_user": 0.66,
    "order_priority_counts": 1.03,
    "shipping_revenue": 0.77,
    "asof_last_order": 1.24,
    "regional_revenue": 1.27,
    # round-4 queries: best of the two round-4 samples becomes the pin
    "asof_bucketed": 2.33,
    # round-5 LLM-ops entries: best of the two round-5 samples. The
    # minhash number is the COLD cost (bench charges each query one
    # un-warmed run) of signatures + banding + exact-verify joins at
    # sf0.1's 5k-doc corpus — startup constants dominate at this size.
    "minhash_pairs": 21.5,
    "similarity_topk": 0.59,
    "dedup_exact_hashed": 0.28,
    "token_bigrams": 6.29,
    # round-6 entries: first healthy-host sample (2026-08-18 #5,
    # calibration 1.06-1.35x quiet pins, headline 163k). kmeans_assign
    # charges the whole fit (3 Lloyd's rounds of collects) + assignment.
    "dsir_scores": 1.64,
    "kmeans_assign": 4.34,
    # round-6b entry: provisional pin from a standalone cold local[8]
    # run on landing day (same epoch as sample #5); re-pin at the next
    # healthy in-bench sample
    "semantic_dup_pairs": 27.95,
}


# Quiet-host pins for the no-Spark parse-kernel calibration (measured
# 2026-08-16, BENCH/calib_kernel.py, best of 2). A bench sample whose
# same-run calibration lands well below 1.0 of these is a slow-host
# sample (hypervisor steal / co-tenant interference), not a pipeline
# regression — the r5 headline dipped 30% while the same-day kernel
# number held 0.89, and the round-5 verdict asked for the protocol to
# carry this evidence inside the artifact instead of asserting it.
CALIB_PIN_4PROC = 309_138.0
CALIB_PIN_16PROC = 1_130_195.0
# MUST match the pin measurement's corpus (1.2M lines): smaller shards
# under-amortize per-process startup and read as false host slowness.
CALIB_LINES = 1_200_000


def _calib_worker(args):
    cpu, lines = args
    try:
        os.sched_setaffinity(0, [cpu])
    except (AttributeError, OSError):
        pass
    import pyarrow as pa

    pa.set_cpu_count(1)
    import pandas as pd

    from redeye_spark.functions.logparse import FORMAT_COMBINED, parse_lines

    t0 = time.monotonic()
    parse_lines(pd.Series(lines), fmt=FORMAT_COMBINED)
    return time.monotonic() - t0


_CALIB_LINES_CACHE: list | None = None


def host_calibration() -> dict:
    """Same-run host-health probe: the repo's pure pyarrow/RE2 parse
    kernel (zero Spark, zero JVM) at 4 and 16 pinned processes.
    Deterministic work; the only variable is the host."""
    import multiprocessing as mp

    global _CALIB_LINES_CACHE
    if _CALIB_LINES_CACHE is None:
        from redeye_spark.sources.datagen import gen_frame

        # generation is deterministic and ~1 min — build once, reuse in
        # the post-window probe (forked workers inherit it for free)
        _CALIB_LINES_CACHE = gen_frame(
            CALIB_LINES, fmt="combined", seed=3
        )["line"].tolist()
    lines = _CALIB_LINES_CACHE
    ctx = mp.get_context("fork")

    def run(nproc: int, sample) -> float:
        shard = len(sample) // nproc
        with ctx.Pool(nproc) as p:
            walls = p.map(
                _calib_worker,
                [(i, sample[i * shard:(i + 1) * shard]) for i in range(nproc)],
            )
        return (shard * nproc) / max(walls)

    run(4, lines[:80_000])  # warm (imports, RE2 compile, allocator)
    r4 = max(run(4, lines) for _ in range(2))
    r16 = max(run(16, lines) for _ in range(2))
    return {
        "kernel_rows_per_sec_4proc": round(r4, 0),
        "kernel_rows_per_sec_16proc": round(r16, 0),
        "vs_quiet_pin_4proc": round(r4 / CALIB_PIN_4PROC, 3),
        "vs_quiet_pin_16proc": round(r16 / CALIB_PIN_16PROC, 3),
    }


def _corpus_rows() -> int:
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    n = n_events * ROWS_PER_EVENT
    # startup-amortization floor: per-job constants (driver planning,
    # commit, agg job setup — a few seconds) must stay small relative to
    # the measured window at BOTH cluster sizes, and longer runs
    # self-average this VM's ±10% noise.
    if n >= 600_000:
        n = max(n, 6_000_000)
    return n


def ensure_corpus(path: str, n: int) -> None:
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        # a corpus generated under an older chunking (or a raised
        # REDEYE_EXEC_HI) can have fewer files than executors — the
        # round-robin shard loop would then hand empty dirs out
        n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        # a corpus of n rows can never yield more than n files, so clamp
        # the requirement or a tiny corpus would be regenerated forever
        if n_files < min(n, N_EXECUTORS_HI):
            shutil.rmtree(path, ignore_errors=True)
    if not os.path.exists(marker):
        from redeye_spark.sources.datagen import write_input_table

        # many files => split-parallel scans with no repartition shuffle,
        # and clean round-robin sharding across executors; the min()
        # bound guarantees >= N_EXECUTORS_HI files so tiny smoke corpora
        # still give every shard at least one file
        chunk = max(1, min(n // max(N_EXECUTORS_HI, 1), max(10_000, n // 64)))
        write_input_table(path, n, fmt="combined", seed=SEED, chunk=chunk)
        open(marker, "w").write(str(n))
    # shard into N_EXECUTORS_HI disjoint hardlink dirs
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    for q in range(N_EXECUTORS_HI):
        d = os.path.join(os.path.dirname(path), f"shard{q}")
        if os.path.isdir(d) and len(os.listdir(d)) == len(files[q::N_EXECUTORS_HI]):
            continue
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        for f in files[q::N_EXECUTORS_HI]:
            os.link(os.path.join(path, f), os.path.join(d, f))


def exec_worker(shard: int, cores: str, input_path: str, out_path: str) -> None:
    """One executor: pinned JVM + python workers over one corpus shard."""
    lo, hi = map(int, cores.split("-"))
    try:
        os.sched_setaffinity(0, range(lo, hi + 1))
    except (AttributeError, OSError):
        pass
    n = hi - lo + 1

    from redeye_spark.session import get_spark
    from redeye_spark.functions.logparse import FORMAT_COMBINED
    from redeye_spark.plans.pipeline import PipelineConfig, run_pipeline
    from redeye_spark.sources.io import ParquetIO

    spark = get_spark(
        f"bench-exec{shard}",
        master=f"local[{n}]",
        shuffle_partitions=n * 2,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={n}",
            # ~3MB splits: >=6 waves per slot smooths stragglers
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            "spark.ui.enabled": "false",
        },
    )
    cfg = PipelineConfig(fmt=FORMAT_COMBINED, num_partitions=None)

    # Warm-up (excluded from the window): primes every task slot's python
    # worker, codegen, and the committer — constants a 10^12-row run
    # amortizes to nothing.
    files = sorted(f for f in os.listdir(input_path) if f.endswith(".parquet"))
    # one wave per task slot primes workers/codegen/committer; capped at
    # half the input so wide executors don't re-process the whole shard
    n_warm = min(n, max(2, len(files) // 2))
    warm = spark.read.parquet(*[os.path.join(input_path, f) for f in files[:n_warm]])
    run_pipeline(spark, warm, ParquetIO(out_path + "_warm"), cfg)
    shutil.rmtree(out_path + "_warm", ignore_errors=True)

    shutil.rmtree(out_path, ignore_errors=True)
    raw = spark.read.parquet(input_path)
    t0 = time.monotonic()
    res = run_pipeline(spark, raw, ParquetIO(out_path), cfg)
    wall = time.monotonic() - t0
    print(json.dumps({"shard": shard, "wall_sec": wall, "rows_in": res.rows_in,
                      "rows_err": res.rows_err}))
    spark.stop()


def _spawn_exec(shard: int, cores: str, inp: str, out: str):
    # Fixed per-executor heap at BOTH cluster sizes (clusters size executor
    # memory per executor, not per cluster). Oversized heaps anti-scale
    # hard here: 4 x 48g JVMs on a 125 GiB box turned 16 s shards into
    # 90+ s ones (page-fault storms -> 60-77% sys time + hypervisor
    # steal), an effect invisible at 1 executor.
    env = dict(os.environ,
               SPARK_GRAFT_DRIVER_MEM=os.environ.get("REDEYE_EXEC_MEM", "12g"))
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--exec-worker", str(shard), cores, inp, out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )


def run_cluster(n_exec: int, base: str, cores_per_exec: int = CORES_PER_EXECUTOR) -> dict:
    """Run n_exec concurrent pinned executors of cores_per_exec cores.

    Strong scaling over identical input (BASELINE.md protocol): the
    1-executor "cluster" processes the FULL corpus; the 4-executor
    cluster processes the same corpus as 4 disjoint shards."""
    procs = []
    for q in range(n_exec):
        cores = f"{q * cores_per_exec}-{(q + 1) * cores_per_exec - 1}"
        inp = os.path.join(base, "raw") if n_exec == 1 else os.path.join(base, f"shard{q}")
        out = os.path.join(base, f"exec_out{q}")
        procs.append(_spawn_exec(q, cores, inp, out))
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"executor failed rc={p.returncode}")
        results.append(json.loads(out.strip().splitlines()[-1]))
    rows = sum(r["rows_in"] for r in results)
    wall = max(r["wall_sec"] for r in results)
    return {"rows_in": rows, "wall_sec": wall,
            "rows_err": sum(r["rows_err"] for r in results)}


def best_of(fn, n_runs=2, tiebreak_ratio=1.5):
    rs = [fn() for _ in range(n_runs)]
    walls = [r["wall_sec"] for r in rs]
    if max(walls) / min(walls) > tiebreak_ratio:  # VM noise outlier
        rs.append(fn())
    return min(rs, key=lambda r: r["wall_sec"])


def main() -> None:
    if "--exec-worker" in sys.argv:
        i = sys.argv.index("--exec-worker")
        exec_worker(int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3], sys.argv[i + 4])
        return

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    n = _corpus_rows()
    base = os.path.join(BENCH_BASE, f"sf{sf}_n{n}")
    corpus = os.path.join(base, "raw")
    ensure_corpus(corpus, n)

    # Host-health probe bracketing the measured window: one sample
    # before the cluster legs, one after, reported as min/max so a
    # noise burst DURING the run is also visible in the artifact.
    calib_pre = host_calibration()

    # SYMMETRIC best-of-2 on both cluster sizes (plus the adaptive third
    # run on outliers): this host's interference is bimodal on BOTH
    # sides — single lo runs at the 4-core width swung 65-116 s across
    # reps — so pairing one lucky lo with one unlucky hi (or vice versa)
    # would swing recorded efficiency by +-0.2. Best-of on each side
    # compares quiet-host windows with quiet-host windows.
    r_lo = best_of(lambda: run_cluster(1, base), n_runs=2)
    r_hi = best_of(lambda: run_cluster(N_EXECUTORS_HI, base), n_runs=2)
    tput_lo = r_lo["rows_in"] / r_lo["wall_sec"]
    tput_hi = r_hi["rows_in"] / r_hi["wall_sec"]
    efficiency = (tput_hi / tput_lo) / N_EXECUTORS_HI

    # Additional topologies, reported alongside the 2-core headline so
    # the scaling claim doesn't rest on the friendliest width:
    #   * 4-core executors: 1x4 vs 4x4 = 16 busy vCPUs at the top size —
    #     exactly this VM's PHYSICAL core budget (32 vCPU = 16 x SMT2),
    #     so it corroborates the >=0.8 rule without the SMT ceiling.
    #   * 8-core executors: 4x8 = all 32 vCPUs — deliberately past the
    #     physical budget; this VM's memory-bandwidth calibration ceiling
    #     for 8->32 busy cores (0.57-0.59) is recorded in
    #     BENCH/BASELINE.md next to the target, and its hypervisor steal
    #     at 32 busy vCPUs is bimodal (0-2% quiet, ~10% under host
    #     interference, amplified by lock-holder preemption into 35%
    #     sys-time spin and a 4x wall swing) — best-of-N rides out the
    #     bad windows.
    def topology(width: int) -> dict:
        r_lo_w = best_of(lambda: run_cluster(1, base, cores_per_exec=width), n_runs=2)
        r_hi_w = best_of(lambda: run_cluster(N_EXECUTORS_HI, base, cores_per_exec=width), n_runs=2)
        lo_t = r_lo_w["rows_in"] / r_lo_w["wall_sec"]
        hi_t = r_hi_w["rows_in"] / r_hi_w["wall_sec"]
        return {
            "cores_per_executor": width,
            "rows_per_sec_1exec": round(lo_t, 1),
            "rows_per_sec_%dexec" % N_EXECUTORS_HI: round(hi_t, 1),
            "scaling_efficiency_N_to_4N": round((hi_t / lo_t) / N_EXECUTORS_HI, 3),
        }

    topo4 = topology(int(os.environ.get("REDEYE_EXEC_CORES_MID", "4")))
    topo8 = topology(int(os.environ.get("REDEYE_EXEC_CORES_WIDE", "8")))

    calib_post = host_calibration()
    host_health = {
        **{
            k: [calib_pre[k], calib_post[k]]
            for k in ("vs_quiet_pin_4proc", "vs_quiet_pin_16proc")
        },
        "kernel_rows_per_sec_4proc": [
            calib_pre["kernel_rows_per_sec_4proc"],
            calib_post["kernel_rows_per_sec_4proc"],
        ],
        "kernel_rows_per_sec_16proc": [
            calib_pre["kernel_rows_per_sec_16proc"],
            calib_post["kernel_rows_per_sec_16proc"],
        ],
        "note": "pure pyarrow/RE2 parse kernel, no Spark, [pre, post] the "
                "timed window; quiet-host pins 2026-08-16 "
                "(BENCH/calib_kernel.py). vs_quiet_pin well below 1.0 "
                "means host interference — discount the headline sample, "
                "not the pipeline.",
    }

    # --- per-query timings on a full-width session ---
    from redeye_spark.session import get_spark
    from redeye_spark import entry_queries as EQ

    # per-query numbers must charge each query its real parse cost —
    # the registry's shared-parse persist cache would let query #2 ride
    # query #1's warm cache and misreport the suite as faster than it is
    os.environ["REDEYE_NO_PARSE_CACHE"] = "1"
    spark = get_spark("bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    # Warm the session once (python worker spawn + codegen are
    # per-session constants; the exec-scaling legs exclude them via
    # their own warm-up) so the first timed query isn't charged ~5 s of
    # one-time setup the other queries don't pay. Uses SF_DIR itself so
    # relocated testdata doesn't break the harness.
    EQ.QUERIES["parse_common"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    queries: dict[str, float] = {}
    for name in TIMED_QUERIES:
        t0 = time.monotonic()
        EQ.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.monotonic() - t0, 3)
    spark.stop()

    print(json.dumps({
        # headline value/unit/metric agree: higher is better, corpus-size
        # independent (ADVICE: wall seconds as `value` inverted semantics)
        "metric": "parsed+routed rows/sec, full pipeline (parse+enrich+route+sinks+agg), "
                  "%d executors x %d cores, sf%s corpus %d rows"
                  % (N_EXECUTORS_HI, CORES_PER_EXECUTOR, sf, n),
        "value": round(tput_hi, 1),
        "unit": "rows/sec",
        "queries": queries,
        # measured / pinned-round-3-best; only meaningful at sf0.1
        "queries_vs_baseline": {
            q: round(queries[q] / QUERY_BASELINES_S[q], 2)
            for q in queries
            if q in QUERY_BASELINES_S and float(sf) == 0.1
        },
        "sf": float(sf),
        "corpus_rows": n,
        "wall_sec_%dexec" % N_EXECUTORS_HI: round(r_hi["wall_sec"], 3),
        "rows_per_sec_1exec": round(tput_lo, 1),
        "rows_per_sec_%dexec" % N_EXECUTORS_HI: round(tput_hi, 1),
        "cores_per_executor": CORES_PER_EXECUTOR,
        "scaling_efficiency_N_to_4N": round(efficiency, 3),
        "scaling_4core": topo4,
        "scaling_8core": topo8,
        "host_calibration": host_health,
        "rows_err": r_hi["rows_err"],
    }))


if __name__ == "__main__":
    main()
