"""Profile one bench exec-worker leg (pipeline scan->parse->enrich->
route->sinks->agg) with event logging, mirroring bench.exec_worker's
session shape exactly. Usage:
  python BENCH/profile_pipeline.py [n_rows] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    try:
        os.sched_setaffinity(0, range(0, CORES))
    except OSError:
        pass
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    from redeye_spark.session import get_spark
    from redeye_spark.functions.logparse import FORMAT_COMBINED
    from redeye_spark.plans.pipeline import PipelineConfig, run_pipeline
    from redeye_spark.sources.io import ParquetIO
    from redeye_spark.sources.datagen import write_input_table

    base = f"/dev/shm/redeye_profile/n{N}"
    if not os.path.exists(base + "/_DONE"):
        shutil.rmtree(base, ignore_errors=True)
        write_input_table(base, N, fmt="combined", seed=42,
                          chunk=max(10_000, N // 64))
        open(base + "/_DONE", "w").write(str(N))

    os.makedirs("/tmp/spark-events", exist_ok=True)
    spark = get_spark(
        "profile-exec",
        master=f"local[{CORES}]",
        shuffle_partitions=CORES * 2,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={CORES}",
            "spark.sql.files.maxPartitionBytes": str(3 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file:///tmp/spark-events",
        },
    )
    cfg = PipelineConfig(fmt=FORMAT_COMBINED, num_partitions=None)
    out = "/dev/shm/redeye_profile/out"

    files = sorted(f for f in os.listdir(base) if f.endswith(".parquet"))
    warm = spark.read.parquet(*[os.path.join(base, f) for f in files[:2]])
    spark.sparkContext.setJobDescription("warmup")
    run_pipeline(spark, warm, ParquetIO(out + "_warm"), cfg)
    shutil.rmtree(out + "_warm", ignore_errors=True)

    shutil.rmtree(out, ignore_errors=True)
    spark.sparkContext.setJobDescription("timed pipeline")
    raw = spark.read.parquet(base)
    t0 = time.monotonic()
    res = run_pipeline(spark, raw, ParquetIO(out), cfg)
    wall = time.monotonic() - t0
    print(json.dumps({"wall_sec": round(wall, 3), "rows_in": res.rows_in,
                      "rows_per_sec": round(res.rows_in / wall, 1),
                      "rows_err": res.rows_err}))
    spark.stop()


if __name__ == "__main__":
    main()
