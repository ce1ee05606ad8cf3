"""HRW sharding tests (operators/sharding.py): Python replication of
the weight argmax, the minimal-churn invariant, degenerate shard
counts, and the zero-shuffle assignment plan."""

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import sharding


def _py_shard(doc_id: int, n: int) -> int:
    dm = doc_id % sharding.M31
    best = None
    for s in range(n):
        h1 = (dm * sharding.A + (s + 1) * sharding.B) % sharding.M31
        w = (h1 * h1 + s) % sharding.W
        if best is None or w > best[0]:
            best = (w, s)
    return best[1]


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


class TestAssign:
    def test_matches_python_replication(self, spark):
        got = {r["doc_id"]: r["shard"]
               for r in sharding.hrw_assign(_docs(spark, 500), "doc_id", 8).collect()}
        for i in range(500):
            assert got[i] == _py_shard(i, 8), i

    def test_single_shard(self, spark):
        out = sharding.hrw_assign(_docs(spark, 10), "doc_id", 1).collect()
        assert all(r["shard"] == 0 for r in out)

    def test_bad_n_rejected(self, spark):
        with pytest.raises(ValueError):
            sharding.hrw_shard_expr("doc_id", 0)

    def test_assignment_is_zero_shuffle(self, spark):
        from tests.test_plans import plan_of

        p = plan_of(sharding.hrw_assign(_docs(spark, 10), "doc_id", 8))
        assert "Exchange" not in p, p
        assert "BatchEvalPython" not in p


class TestChurn:
    def test_minimal_churn_invariant(self, spark):
        rows = {r["status"]: r["n"] for r in
                sharding.shard_churn(_docs(spark, 2000), "doc_id", 8, 10).collect()}
        assert "moved_between_old" not in rows  # THE consistent-hash guarantee
        assert rows["stayed"] + rows.get("moved_to_new", 0) == 2000
        # a grow must actually move ~2/10 of docs to the new shards
        assert 0 < rows["moved_to_new"] < 2000

    def test_stability_under_growth(self, spark):
        # every doc that stays on an old shard keeps ITS shard
        a = {r["doc_id"]: r["shard"] for r in
             sharding.hrw_assign(_docs(spark, 300), "doc_id", 8).collect()}
        b = {r["doc_id"]: r["shard"] for r in
             sharding.hrw_assign(_docs(spark, 300), "doc_id", 10).collect()}
        for i in range(300):
            assert b[i] == a[i] or b[i] >= 8, (i, a[i], b[i])

    def test_shrink_rejected(self, spark):
        with pytest.raises(ValueError):
            sharding.shard_churn(_docs(spark, 5), "doc_id", 8, 8)
