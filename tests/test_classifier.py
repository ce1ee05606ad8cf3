"""Feature-hash classifier tests (operators/classifier.py): bucket
arithmetic vs a Python replication, custom/invalid weights, empty-token
handling, rate aggregation, and the no-Python plan shape."""

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import classifier


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def _py_bucket(tok: str, dim: int = 64) -> int:
    return (sum(ord(c) for c in tok) * classifier.KNUTH + len(tok)) % dim


def _py_score(text: str, weights, dim: int = 64) -> int:
    return sum(weights[_py_bucket(t, dim)] for t in text.split(" ") if t)


class TestScores:
    def test_matches_python_replication(self, spark):
        w = classifier.default_weights(64)
        rows = [(i, f"alpha beta{i % 7} gamma delta{i % 3} eps", "s")
                for i in range(50)]
        got = {r["doc_id"]: (r["score"], r["label"])
               for r in classifier.feature_hash_scores(_docs(spark, rows)).collect()}
        for i, text, _ in rows:
            want = _py_score(text, w)
            assert got[i] == (want, want > 0), (i, got[i], want)

    def test_custom_weights(self, spark):
        # all-ones weights -> score == token count
        w = [1] * 64
        df = _docs(spark, [(1, "a b c d", "s")])
        r = classifier.feature_hash_scores(df, weights=w).first()
        assert r["score"] == 4 and bool(r["label"]) is True

    def test_empty_tokens_ignored(self, spark):
        w = [1] * 64
        df = _docs(spark, [(1, "a  b", "s")])  # double space -> empty token
        assert classifier.feature_hash_scores(df, weights=w).first()["score"] == 2

    def test_weight_validation(self, spark):
        df = _docs(spark, [(1, "a", "s")])
        with pytest.raises(ValueError):
            classifier.feature_hash_scores(df, weights=[1, 2])  # wrong length
        with pytest.raises(ValueError):
            classifier.feature_hash_scores(df, weights=[0.5] * 64)  # non-int

    def test_partitioning_invariance(self, spark):
        rows = [(i, f"w{i % 11} x{i % 5} y", "s") for i in range(300)]
        df = _docs(spark, rows)
        a = sorted(map(tuple, classifier.feature_hash_scores(df).collect()))
        b = sorted(map(tuple,
                       classifier.feature_hash_scores(df.repartition(9)).collect()))
        assert a == b


class TestRates:
    def test_rates_exact(self, spark):
        df = _docs(spark, [
            (1, "a", "s1"), (2, "a", "s1"), (3, "a", "s2"),
        ])
        scores = classifier.feature_hash_scores(df, weights=[1] * 64)
        # every doc scores 1 -> all positive
        out = {r["source"]: r for r in
               classifier.label_rates(scores, df).collect()}
        assert out["s1"]["n_docs"] == 2 and out["s1"]["n_pos"] == 2
        assert out["s1"]["pos_rate"] == 1.0
        assert out["s2"]["n_docs"] == 1


class TestPlanShape:
    def test_no_python_and_partial_agg(self, spark):
        from tests.test_plans import plan_of

        df = _docs(spark, [(1, "a b", "s")])
        p = plan_of(classifier.feature_hash_scores(df))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "partial_sum" in p, p  # map-side combine before the shuffle
