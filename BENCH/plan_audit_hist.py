"""One-off executed-plan audit for the quantile-histogram batch.

Same protocol as the earlier round-6 audits (BENCH/PLANS_r06.md):
run each query at sf0.001, take the FORMATTED executed plan (so AQE's
final choices are visible), and count node-name substrings —
shuffle exchanges (excluding BroadcastExchange), broadcast exchanges,
broadcast-hash joins, and the anti-pattern nodes (CartesianProduct,
BatchEvalPython/ArrowEvalPython).
"""

import json
import re
import sys

from pyspark.sql import SparkSession

from redeye_spark.queries import QUERIES

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
NAMES = (
    sys.argv[2].split(",")
    if len(sys.argv) > 2
    else ["hist_cells_value", "hist_merge", "hist_quantiles"]
)


def formatted(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit(plan):
    # AQE formatted output repeats every node in an "== Initial Plan =="
    # tree and again in the node-detail listing; count node names in the
    # "== Final Plan ==" TREE section only (executed choices).
    tree = plan.split("== Initial Plan ==")[0]

    def n(pat):
        return len(re.findall(pat, tree))

    # \bExchange cannot match inside BroadcastExchange (no word boundary
    # between "t" and "E"), so the count below is shuffle exchanges only
    shuffles = n(r"\bExchange \(\d+\)")
    return {
        "shuffles": shuffles,
        "bcast": n(r"\bBroadcastExchange \(\d+\)"),
        "bhj": n(r"\bBroadcastHashJoin"),
        "smj": n(r"\bSortMergeJoin"),
        "cartesian": n(r"CartesianProduct"),
        "py": n(r"BatchEvalPython") + n(r"ArrowEvalPython"),
        "aqe": n(r"AdaptiveSparkPlan"),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    out = {}
    for name in NAMES:
        df = QUERIES[name](spark, SF_DIR)
        df.collect()  # execute so the AQE final plan is what we read
        out[name] = audit(formatted(df))
        print(name, json.dumps(out[name]))
    spark.stop()


if __name__ == "__main__":
    main()
