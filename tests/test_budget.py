"""Budgeted selection tests (operators/budget.py): hand-computed greedy
selection, exact boundary inclusion, tie order, bucket-width
invariance, ascending mode, and the bucketed prefix-sum plan shape."""

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import budget


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, score bigint, w bigint")


def _select(spark, rows, b, **kw):
    out = budget.select_until_budget(
        _df(spark, rows), budget=b, weight_col="w", order_col="score", **kw
    )
    return sorted((r["doc_id"], r["cum_weight"]) for r in out.collect())


class TestSelection:
    def test_greedy_order_and_boundary(self, spark):
        rows = [(1, 10, 4), (2, 20, 5), (3, 30, 6), (4, 5, 100)]
        # score desc: doc3 (6), doc2 (11), doc1 (15), doc4 (115)
        assert _select(spark, rows, 11) == [(2, 11), (3, 6)]   # == budget kept
        assert _select(spark, rows, 10) == [(3, 6)]
        assert _select(spark, rows, 5) == []
        assert _select(spark, rows, 1000) == [(1, 15), (2, 11), (3, 6), (4, 115)]

    def test_tie_broken_by_id(self, spark):
        rows = [(7, 10, 3), (2, 10, 3), (5, 10, 3)]
        # same score: id asc -> 2, 5, 7
        assert _select(spark, rows, 6) == [(2, 3), (5, 6)]

    def test_zero_weight_rows_ride_along(self, spark):
        rows = [(1, 30, 0), (2, 20, 5)]
        assert _select(spark, rows, 5) == [(1, 0), (2, 5)]

    def test_ascending_mode(self, spark):
        rows = [(1, 10, 4), (2, 20, 5), (3, 30, 6)]
        assert _select(spark, rows, 9, descending=False) == [(1, 4), (2, 9)]

    def test_bucket_width_invariance(self, spark):
        rows = [(i, (i * 13) % 40, 1 + i % 7) for i in range(400)]
        base = _select(spark, rows, 500, bucket_width=1)
        for bw in (3, 16, 1000):
            assert _select(spark, rows, 500, bucket_width=bw) == base

    def test_partitioning_invariance(self, spark):
        rows = [(i, (i * 7) % 25, 1 + i % 5) for i in range(300)]
        df = _df(spark, rows)
        a = sorted(map(tuple, budget.select_until_budget(
            df, 300, "w", "score").collect()))
        b = sorted(map(tuple, budget.select_until_budget(
            df.repartition(11), 300, "w", "score").collect()))
        assert a == b

    def test_bad_args(self, spark):
        df = _df(spark, [(1, 1, 1)])
        with pytest.raises(ValueError):
            budget.select_until_budget(df, -1, "w", "score")
        with pytest.raises(ValueError):
            budget.select_until_budget(df, 1, "w", "score", bucket_width=0)


class TestPlanShape:
    def test_row_windows_are_bucket_partitioned(self, spark):
        from tests.test_plans import plan_of

        rows = [(i, (i * 13) % 40, 1 + i % 7) for i in range(100)]
        p = plan_of(budget.select_until_budget(
            _df(spark, rows), 500, "w", "score", bucket_width=4))
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p, p  # offsets broadcast onto rows
        # the ROW-side window must be partitioned by bucket; only the
        # bucket-census offsets window (bounded input) is unpartitioned
        import re
        row_windows = [w for w in re.findall(r"Window \[.*", p)
                       if "_cum" in w or "w#" in w]
        assert all("partitionBy" not in w or "_bkt" in w for w in row_windows)


class TestQuantileBuckets:
    def _run(self, spark, rows, **kw):
        out = budget.quantile_buckets(_df(spark, rows).withColumnRenamed(
            "w", "n_tokens"), "score", "n_tokens", **kw)
        return {r["bucket"]: (r["n_docs"], r["n_weight"],
                              r["min_score"], r["max_score"])
                for r in out.collect()}

    def test_hand_computed_quartiles(self, spark):
        # scores 1..8, one doc each, weight = score
        rows = [(i, i, i) for i in range(1, 9)]
        got = self._run(spark, rows)
        # N=8: b0 = min score with cum*4 >= 8  -> cum >= 2 -> score 2
        #      b1 = cum*2 >= 8 -> cum >= 4 -> score 4
        #      b2 = cum*4 >= 24 -> cum >= 6 -> score 6
        assert got == {
            0: (2, 3, 1, 2),
            1: (2, 7, 3, 4),
            2: (2, 11, 5, 6),
            3: (2, 15, 7, 8),
        }

    def test_all_equal_scores_collapse_to_bucket_zero(self, spark):
        rows = [(i, 7, 2) for i in range(10)]
        got = self._run(spark, rows)
        assert got == {0: (10, 20, 7, 7)}

    def test_bad_fractions_raise(self, spark):
        df = _df(spark, [(1, 1, 1)]).withColumnRenamed("w", "n_tokens")
        with pytest.raises(ValueError):
            budget.quantile_buckets(df, "score", "n_tokens",
                                    fractions=((0, 4),))
        with pytest.raises(ValueError):
            budget.quantile_buckets(df, "score", "n_tokens",
                                    fractions=((5, 4),))

    def test_partitioning_invariance(self, spark):
        rows = [(i, (i * 17) % 31, 1 + i % 6) for i in range(500)]
        df = _df(spark, rows).withColumnRenamed("w", "n_tokens")
        a = sorted(map(tuple, budget.quantile_buckets(
            df, "score", "n_tokens").collect()))
        b = sorted(map(tuple, budget.quantile_buckets(
            df.repartition(13), "score", "n_tokens").collect()))
        assert a == b


class TestCensusGuard:
    """The round-6 verdict's guard: census-bounded windows must refuse
    to run when the census frame exceeds the configured cap."""

    def test_budget_census_cap_raises(self, spark, monkeypatch):
        from redeye_spark.operators import aggregate

        monkeypatch.setattr(aggregate, "MAX_CENSUS_ROWS", 2)
        rows = [(i, i * 10, 1) for i in range(1, 6)]  # 5 distinct buckets
        with pytest.raises(ValueError, match="bucket_width"):
            budget.select_until_budget(
                _df(spark, rows), budget=100, weight_col="w", order_col="score"
            )

    def test_quantile_census_cap_raises(self, spark, monkeypatch):
        from redeye_spark.operators import aggregate

        monkeypatch.setattr(aggregate, "MAX_CENSUS_ROWS", 2)
        rows = [(i, i * 10, 1) for i in range(1, 6)]
        with pytest.raises(ValueError, match="score grid"):
            budget.quantile_buckets(
                _df(spark, rows), score_col="score", weight_col="w"
            )

    def test_hist_census_cap_raises(self, spark):
        from redeye_spark.operators import sketches

        cells = spark.createDataFrame(
            [(i, 1) for i in range(5)], "bin bigint, cnt bigint"
        )
        with pytest.raises(ValueError, match="width"):
            sketches.hist_quantiles(cells, width=10, max_census_rows=2)

    def test_under_cap_passes(self, spark):
        from redeye_spark.operators import sketches

        cells = spark.createDataFrame(
            [(i, 1) for i in range(5)], "bin bigint, cnt bigint"
        )
        out = sketches.hist_quantiles(cells, width=10, max_census_rows=100)
        assert out.count() > 0
