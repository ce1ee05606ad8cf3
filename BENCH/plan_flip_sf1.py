#!/usr/bin/env python
"""Scale-flip plan audit (r5 verdict #5): compile the join/agg-heavy
registry queries at sf0.1 AND sf1 (BENCH/make_sf1.py output) and
report which physical join strategies flip (broadcast <-> SMJ/
shuffled-hash) as the inputs grow 10x. Static compile only (no
execution): AQE runtime re-plans are additionally visible in the
initial plan as AdaptiveSparkPlan wrappers; the flip we care about —
a "small" side outgrowing the broadcast threshold — shows up in the
pre-execution plan's join selection.

Usage: python BENCH/plan_flip_sf1.py [sf1_dir] > PLAN_FLIPS_sf1.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "shipping_revenue", "order_priority_counts", "regional_revenue",
    "nation_revenue", "lineitem_pricing", "agg_counts_hour",
    "top_orders", "customer_churn", "asof_last_order", "asof_bucketed",
    "important_parts", "dominant_suppliers", "national_market_share",
    "nation_profit", "grouping_sets_counts", "last_event_per_user",
    "token_bigrams", "funnel_counts", "retention_cohorts",
    "minhash_pairs", "similarity_topk", "dedup_exact_hashed",
]

JOIN_KINDS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct")


def join_profile(plan: str) -> dict:
    return {k: plan.count(k) for k in JOIN_KINDS if plan.count(k)}


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/testdata_sf1"
    from redeye_spark import entry_queries as EQ
    from redeye_spark.session import get_spark

    def plan_of(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    spark = get_spark("plan-flip", master="local[8]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false"})
    print("# Plan flips sf0.1 -> sf1 (static compile, AQE on)\n")
    print("| query | sf0.1 joins | sf1 joins | flip? |")
    print("|---|---|---|---|")
    flips = 0
    for name in QUERIES:
        prof = {}
        for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)):
            try:
                prof[tag] = join_profile(plan_of(EQ.QUERIES[name](spark, d)))
            except Exception as e:  # noqa: BLE001
                prof[tag] = {"error": str(e)[:80]}
        flip = prof["sf0.1"] != prof["sf1"]
        flips += flip
        print(f"| {name} | {prof['sf0.1']} | {prof['sf1']} | "
              f"{'FLIP' if flip else '-'} |")
    print(f"\n{flips} of {len(QUERIES)} queries change join strategy at 10x.")
    print("A broadcast->SMJ flip is the HEALTHY outcome: a side that "
          "outgrew spark.sql.autoBroadcastJoinThreshold stopped being "
          "broadcast, which is exactly the adaptation a 100 TB run needs. "
          "CartesianProduct anywhere would be a scale bug (the plan gate in "
          "tests/test_plans.py forbids it registry-wide). "
          "BroadcastNestedLoopJoin is a bug UNLESS the broadcast side is a "
          "keyless 1-row global aggregate (important_parts' mean-threshold "
          "probe, dominant_suppliers' twin): that side is exactly one row "
          "at every scale factor, so the 'nested loop' is a constant-time "
          "scalar attach, not an O(n*m) scan.")
    spark.stop()


if __name__ == "__main__":
    main()
