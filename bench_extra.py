"""Extra benchmarks for the optimization round (bench.py is frozen).

Mirrors bench.py's per-query methodology exactly (same session shape,
REDEYE_NO_PARSE_CACHE=1, warm-up via parse_common, noop sink) but:
  * times an arbitrary subset of queries (args), N repeats each
  * captures .explain("formatted") per query to plans/<tag>/<q>.txt

Usage:
  python bench_extra.py [--plans TAG] [--repeats N] [q1 q2 ...]
With no query args, times bench.py's TIMED_QUERIES list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    repeats = 1
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i:i + 2]
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]

    os.environ["REDEYE_NO_PARSE_CACHE"] = "1"
    from redeye_spark.session import get_spark
    from redeye_spark import entry_queries as EQ
    from bench import TIMED_QUERIES

    names = args or list(TIMED_QUERIES)
    extra = {}
    if os.environ.get("REDEYE_EVENTLOG"):
        os.makedirs("/tmp/spark-events", exist_ok=True)
        extra = {"spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": "file:///tmp/spark-events"}
    spark = get_spark("bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS, extra_conf=extra)
    spark.sparkContext.setJobDescription("warmup: parse_common")
    EQ.QUERIES["parse_common"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        if plans_tag:
            os.makedirs(f"plans/{plans_tag}", exist_ok=True)
            df = EQ.QUERIES[name](spark, SF_DIR)
            with open(f"plans/{plans_tag}/{name}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} [{r}]")
            t0 = time.monotonic()
            EQ.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    spark.stop()
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
