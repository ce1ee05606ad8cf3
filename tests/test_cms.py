"""Count-min sketch (operators/sketches.py CMS section): exactness vs
a pure-Python md5 replication, the est >= truth invariant, shard-add
mergeability, and the partial-agg plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import sketches


def _py_bucket(value, row, seed=42):
    return int(
        hashlib.md5(f"cms{seed}:{row}:{value}".encode()).hexdigest()[:2], 16
    )


def _py_cells(values):
    cells = {}
    for v in values:
        for j in range(sketches.CMS_DEPTH):
            k = (j, _py_bucket(v, j))
            cells[k] = cells.get(k, 0) + 1
    return cells


VALUES = [1, 1, 1, 2, 2, 3, 17, 17, 17, 17, 99, 424242] * 3


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "user_id long")


def test_cells_match_python_replication(spark):
    cells = sketches.cms_cells(_df(spark, VALUES), "user_id")
    got = {(int(r["row"]), int(r["bucket"])): int(r["cnt"])
           for r in cells.collect()}
    assert got == _py_cells(VALUES)


def test_estimates_upper_bound_truth_and_replicate(spark):
    df = _df(spark, VALUES)
    cells = sketches.cms_cells(df, "user_id")
    est = {int(r["user_id"]): int(r["est"])
           for r in sketches.cms_estimate(df, cells, "user_id").collect()}
    truth = {}
    for v in VALUES:
        truth[v] = truth.get(v, 0) + 1
    py = _py_cells(VALUES)
    for v, t in truth.items():
        want = min(py.get((j, _py_bucket(v, j)), 0)
                   for j in range(sketches.CMS_DEPTH))
        assert est[v] == want
        assert est[v] >= t, f"CMS under-counted {v}"


def test_shard_add_merge_equals_whole(spark):
    whole = sketches.cms_cells(_df(spark, VALUES), "user_id")
    a = sketches.cms_cells(_df(spark, VALUES[::2]), "user_id")
    b = sketches.cms_cells(_df(spark, VALUES[1::2]), "user_id")
    merged = (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_build_partial_agg_collapses_before_exchange(spark):
    plan = (
        sketches.cms_cells(_df(spark, VALUES * 20), "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.rindex("HashAggregate") > plan.index("Exchange"), plan
    assert "BatchEvalPython" not in plan, plan
