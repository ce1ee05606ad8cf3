"""Unit tests for the round-5 behavioral/token/enrich operators:
funnel, retention, bursts, n-grams, vocab coverage, LPM join, and
weighted sampling."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=_ts(t), event_type=k)
         for i, (u, t, k) in enumerate(rows)]
    )


def test_funnel_strict_order(spark):
    from redeye_spark.operators.funnel import funnel_stages

    ev = _events(spark, [
        # user 1: full ordered funnel
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:01:00", "click"),
        (1, "2024-01-01T00:02:00", "purchase"),
        # user 2: purchase BEFORE click -> stops at click
        (2, "2024-01-01T00:00:00", "view"),
        (2, "2024-01-01T00:00:30", "purchase"),
        (2, "2024-01-01T00:01:00", "click"),
        # user 3: click only (no view) -> absent
        (3, "2024-01-01T00:00:00", "click"),
        # user 4: view only
        (4, "2024-01-01T00:05:00", "view"),
    ])
    out = {r["user_id"]: r["stage_reached"]
           for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 2, 4: 1}


def test_funnel_tie_does_not_advance(spark):
    from redeye_spark.operators.funnel import funnel_stages

    ev = _events(spark, [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:00:00", "click"),   # same instant: not after
        (2, "2024-01-01T00:00:00", "view"),
        (2, "2024-01-01T00:00:01", "click"),
    ])
    out = {r["user_id"]: r["stage_reached"]
           for r in funnel_stages(ev, ["view", "click"]).collect()}
    assert out == {1: 1, 2: 2}


def test_funnel_counts_cumulative(spark):
    from redeye_spark.operators.funnel import funnel_counts

    ev = _events(spark, [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:01:00", "click"),
        (2, "2024-01-01T00:00:00", "view"),
    ])
    rows = {r["stage"]: (r["stage_name"], r["n_users"])
            for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert rows == {1: ("view", 2), 2: ("click", 1)}


def test_retention_cohorts(spark):
    from redeye_spark.operators.funnel import retention_cohorts

    ev = _events(spark, [
        (1, "2024-01-01T10:00:00", "view"),
        (1, "2024-01-03T10:00:00", "view"),
        (1, "2024-01-03T11:00:00", "click"),   # same day counts once
        (2, "2024-01-01T09:00:00", "view"),
        (3, "2024-01-02T00:00:00", "view"),
    ])
    out = {(str(r["cohort_day"]), r["day_offset"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_error_bursts_range_boundary(spark):
    from redeye_spark.operators.funnel import error_bursts

    # user 1: 3 errors inside 600 s (inclusive boundary), user 2: spread out
    ev = _events(spark, [
        (1, "2024-01-01T00:00:00", "error"),
        (1, "2024-01-01T00:05:00", "error"),
        (1, "2024-01-01T00:10:00", "error"),   # exactly 600 s after first
        (2, "2024-01-01T00:00:00", "error"),
        (2, "2024-01-01T01:00:00", "error"),
        (2, "2024-01-01T02:00:00", "error"),
        (1, "2024-01-01T05:00:00", "view"),    # other types ignored
    ])
    out = {r["user_id"]: (r["n_burst_events"], r["max_burst"])
           for r in error_bursts(ev, k=3, window_s=600).collect()}
    assert out == {1: (1, 3)}


# ---------------------------------------------------------------------------
# n-grams / vocab
# ---------------------------------------------------------------------------

def _toks(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=f"d{i}", tokens=t, n_tok=len(t), source=s)
         for i, (t, s) in enumerate(rows)]
    )


def test_ngram_counts_and_short_rows(spark):
    from redeye_spark.operators.ngrams import ngram_counts

    df = _toks(spark, [
        ([1, 2, 3], "a"),      # grams (1,2) (2,3)
        ([1, 2], "a"),         # gram (1,2)
        ([7], "b"),            # too short: nothing
        ([], "b"),
    ])
    out = {tuple(r["gram"]): r["n_occurrences"]
           for r in ngram_counts(df, n=2).collect()}
    assert out == {(1, 2): 2, (2, 3): 1}
    assert ngram_counts(df, n=2, min_count=2).count() == 1


def test_unigram_stats_docfreq(spark):
    from redeye_spark.operators.ngrams import unigram_stats

    df = _toks(spark, [
        ([5, 5, 6], "a"),
        ([5], "a"),
        ([6], "b"),
    ])
    out = {(r["source"], r["token"]): (r["n_occurrences"], r["n_docs"])
           for r in unigram_stats(df).collect()}
    assert out == {("a", 5): (3, 2), ("a", 6): (1, 1), ("b", 6): (1, 1)}


def test_vocab_coverage_counts_occurrences(spark):
    from redeye_spark.operators.ngrams import vocab_coverage

    df = _toks(spark, [([1, 1, 2, 9], "a"), ([], "a")])
    out = {r["doc_id"]: (r["n_invocab"], r["n_oov"])
           for r in vocab_coverage(df, vocab=[1, 2]).collect()}
    assert out == {"d0": (3, 1), "d1": (0, 0)}


# ---------------------------------------------------------------------------
# LPM join
# ---------------------------------------------------------------------------

RULES = [
    ("10.0.0.0/8", "corp"),
    ("10.3.0.0/16", "net-3"),
    ("10.3.5.0/24", "rack-a"),
    ("192.168.1.0/24", "home"),
]


def test_lpm_longest_wins(spark):
    from redeye_spark.operators.enrich import lpm_join

    df = spark.createDataFrame(
        [("10.3.5.77",), ("10.3.9.1",), ("10.200.0.1",), ("192.168.1.9",),
         ("192.168.2.9",), ("8.8.8.8",), ("not-an-ip",), (None,)],
        "ip string",
    )
    out = {r["ip"]: r["net_label"] for r in lpm_join(df, RULES, "ip").collect()}
    assert out == {
        "10.3.5.77": "rack-a",
        "10.3.9.1": "net-3",
        "10.200.0.1": "corp",
        "192.168.1.9": "home",
        "192.168.2.9": None,
        "8.8.8.8": None,
        "not-an-ip": None,
        None: None,
    }


def test_lpm_plan_is_broadcast_only(spark):
    from redeye_spark.operators.enrich import lpm_join

    df = spark.createDataFrame([("10.3.5.77",)], "ip string")
    plan = lpm_join(df, RULES, "ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_lpm_rejects_malformed_rules(spark):
    from redeye_spark.operators.enrich import lpm_join

    df = spark.createDataFrame([("1.2.3.4",)], "ip string")
    with pytest.raises(ValueError):
        lpm_join(df, [("10.0.0.0/40", "x")], "ip")
    with pytest.raises(ValueError):
        lpm_join(df, [("10.0.0/8", "x")], "ip")


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------

def test_weighted_sample_bounds_and_determinism(spark):
    from redeye_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, w=256) for i in range(50)]
        + [Row(doc_id=i + 100, w=0) for i in range(50)]
    )
    out = weighted_sample(df, F.col("w"))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == list(range(50))  # cut 256 keeps all, cut 0 drops all
    again = sorted(r["doc_id"] for r in weighted_sample(df, F.col("w")).collect())
    assert again == ids


def test_weighted_sample_rate_tracks_weight(spark):
    from redeye_spark.operators.sampling import weighted_sample

    n = 2000
    df = spark.createDataFrame([Row(doc_id=i, w=64) for i in range(n)])
    kept = weighted_sample(df, F.col("w")).count()
    assert abs(kept / n - 0.25) < 0.05  # 64/256 nominal


# ---------------------------------------------------------------------------
# round-5 batch 5: URL helpers + rolling distinct
# ---------------------------------------------------------------------------

def test_url_helpers(spark):
    from redeye_spark.operators import urls

    df = spark.createDataFrame(
        [("http://www.example.com/a/b?q=1", "/api/v2/item/9"),
         ("https://x.org/", "/solo"),
         (None, None),
         ("-", "///")],
        "ref string, uri string",
    )
    out = df.select(
        urls.referer_domain(F.col("ref")).alias("dom"),
        urls.path_segments(F.col("uri")).alias("segs"),
        urls.path_segment(F.col("uri"), 2).alias("seg2"),
    ).collect()
    assert [r["dom"] for r in out] == ["www.example.com", "x.org", None, None]
    assert [r["segs"] for r in out] == [["api", "v2", "item", "9"], ["solo"], [], []]
    assert [r["seg2"] for r in out] == ["v2", None, None, None]


def test_rolling_distinct_exact(spark):
    from redeye_spark.operators.aggregate import rolling_distinct
    import pytest as _pytest

    ev = _events(spark, [
        (1, "2024-01-01T10:00:00", "view"),
        (2, "2024-01-01T11:00:00", "view"),
        (1, "2024-01-02T10:00:00", "view"),   # repeat user next day
        (3, "2024-01-05T10:00:00", "view"),
    ])
    out = {str(r["day"]): r["n_unique"]
           for r in rolling_distinct(ev, "ts", "user_id", window_days=3).collect()}
    # day1: {1,2}; day2: {1,2}; day3: {1,2}; day4: {1}; day5: {3}
    assert out == {
        "2024-01-01": 2, "2024-01-02": 2, "2024-01-03": 2,
        "2024-01-04": 1, "2024-01-05": 1,
    }
    with _pytest.raises(ValueError):
        rolling_distinct(ev, "ts", "user_id", window_days=0)


def test_token_entropy_deterministic(spark):
    import math
    from redeye_spark.operators.ngrams import token_entropy

    # uniform over 4 tokens -> exactly 2 bits; single token -> 0 bits
    df = _toks(spark, [([1, 2, 3, 4], "u"), ([9, 9, 9], "z")])
    out = {r["source"]: (r["n_tokens"], r["entropy_bits"])
           for r in token_entropy(df).collect()}
    assert out["u"] == (4, 2.0)
    assert out["z"] == (3, 0.0)
    # skewed: H = log2(4) - (3*log2(3))/4
    df2 = _toks(spark, [([7, 7, 7, 8], "s")])
    h = round(math.log2(4) - (3 * math.log2(3)) / 4, 4)
    [r] = token_entropy(df2).collect()
    assert (r["n_tokens"], r["entropy_bits"]) == (4, h)


class TestGroupPercentiles:
    """operators/aggregate.group_percentiles — exact nearest-rank
    per-group percentiles off the (group, value) census."""

    def _run(self, spark, rows, **kw):
        from redeye_spark.operators import aggregate as agg_op

        df = spark.createDataFrame(rows, "g string, v long")
        return {r["g"]: (r["n"], r["p50"], r["p90"], r["p99"])
                for r in agg_op.group_percentiles(df, "g", "v", **kw).collect()}

    def test_hand_computed_nearest_rank(self, spark):
        rows = [("a", v) for v in [10, 20, 30, 40]] + [("b", 7)]
        got = self._run(spark, rows)
        # a: n=4 -> p50 = rank ceil(2)=2 -> 20; p90 = ceil(3.6)=4 -> 40
        assert got["a"] == (4, 20, 40, 40)
        assert got["b"] == (1, 7, 7, 7)

    def test_nulls_excluded(self, spark):
        from redeye_spark.operators import aggregate as agg_op

        df = spark.createDataFrame(
            [("a", 1), ("a", None), ("a", 3)], "g string, v long")
        out = agg_op.group_percentiles(df, "g", "v").collect()[0]
        assert out["n"] == 2 and out["p50"] == 1 and out["p99"] == 3

    def test_matches_sorted_truth(self, spark):
        import math

        vals = [((i * 37) % 101) for i in range(500)]
        rows = [("g", v) for v in vals]
        got = self._run(spark, rows)["g"]
        s = sorted(vals)
        def nr(q_num, q_den):
            return s[math.ceil(q_num * len(s) / q_den) - 1]
        assert got == (500, nr(1, 2), nr(9, 10), nr(99, 100))

    def test_partitioning_invariance_and_plan(self, spark):
        from redeye_spark.operators import aggregate as agg_op
        from tests.test_plans import plan_of

        rows = [(f"g{i % 4}", (i * 13) % 50) for i in range(400)]
        df = spark.createDataFrame(rows, "g string, v long")
        a = sorted(map(tuple, agg_op.group_percentiles(df, "g", "v").collect()))
        b = sorted(map(tuple, agg_op.group_percentiles(
            df.repartition(9), "g", "v").collect()))
        assert a == b
        p = plan_of(agg_op.group_percentiles(df, "g", "v"))
        assert "partial_count" in p          # census is map-side combined
        assert "BatchEvalPython" not in p
