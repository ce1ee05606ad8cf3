"""Corpus-divergence / overlap / duplicate-run operator tests:
hand-computed KL/JS on a tiny distribution, maximal-run boundaries at
every alignment, and exact pairwise Jaccard."""

import math

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators.ngrams import distribution_drift
from redeye_spark.operators.overlap import source_gram_overlap
from redeye_spark.operators.spans import dup_ngram_runs


def _toks(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


class TestDistributionDrift:
    def test_single_source_has_zero_drift(self, spark):
        df = _toks(spark, [("a", [1, 2, 2, 3], 4, "s1"), ("b", [1, 3], 2, "s1")])
        row = distribution_drift(df).collect()[0]
        assert row["source"] == "s1"
        assert row["n_tokens"] == 6
        assert row["kl_bits"] == 0.0 and row["js_bits"] == 0.0
        # -0.0 would stringify differently from 0.0 in the oracle hash
        assert str(row["kl_bits"]) == "0.0" and str(row["js_bits"]) == "0.0"

    def test_hand_computed_kl_js(self, spark):
        # s1 = {1: 3, 2: 1}; s2 = {1: 1, 2: 3}; corpus = {1: 4, 2: 4}
        df = _toks(spark, [
            ("a", [1, 1, 1, 2], 4, "s1"),
            ("b", [1, 2, 2, 2], 4, "s2"),
        ])
        out = {r["source"]: r for r in distribution_drift(df).collect()}
        p, q = 0.75, 0.5

        def kl2(pa):
            return pa * math.log2(pa / q) + (1 - pa) * math.log2((1 - pa) / q)

        exp_kl = round(kl2(p), 4)
        m1, m2 = (p + q) / 2, (1 - p + q) / 2
        exp_js = round(0.5 * (
            p * math.log2(p / m1) + (1 - p) * math.log2((1 - p) / m2)
            + q * math.log2(q / m1) + q * math.log2(q / m2)), 4)
        for s in ("s1", "s2"):  # symmetric construction
            assert out[s]["kl_bits"] == pytest.approx(exp_kl, abs=1e-4)
            assert out[s]["js_bits"] == pytest.approx(exp_js, abs=1e-4)
            assert out[s]["n_tokens"] == 4

    def test_disjoint_sources(self, spark):
        # token sets fully disjoint, equal-sized: each source sees the
        # corpus as a 50/50 blend of itself and alien mass, so
        # KL(src||corpus) = log2(2) = 1 bit exactly, and
        # JS(src, corpus) = 0.5*(log2(4/3) + 0.5*log2(2/3) + 0.5)
        df = _toks(spark, [
            ("a", [1, 1], 2, "s1"),
            ("b", [2, 2], 2, "s2"),
        ])
        exp_js = 0.5 * (math.log2(4 / 3) + 0.5 * math.log2(2 / 3) + 0.5)
        for r in distribution_drift(df).collect():
            assert r["kl_bits"] == pytest.approx(1.0, abs=1e-4)
            assert r["js_bits"] == pytest.approx(exp_js, abs=1e-4)


class TestDupNgramRuns:
    def test_shared_passage_is_one_maximal_run(self, spark):
        shared = "q w e r t y u i o p"  # 10 words -> 8 dup 3-gram windows
        df = _docs(spark, [
            (1, "s", f"a b c {shared} d e f"),
            (2, "s", f"x y {shared} z"),
        ])
        out = {r["doc_id"]: r for r in
               dup_ngram_runs(df, "text", "doc_id", n=3).collect()}
        assert len(out) == 2
        # doc 1: shared words at 3..12 -> windows 3..10 (8 of them)
        assert (out[1]["run_start"], out[1]["n_grams"], out[1]["run_words"]) == (3, 8, 10)
        assert (out[2]["run_start"], out[2]["n_grams"], out[2]["run_words"]) == (2, 8, 10)

    def test_two_disjoint_runs_stay_separate(self, spark):
        df = _docs(spark, [
            (1, "s", "a1 a2 a3 GAP1 GAP2 b1 b2 b3"),
            (2, "s", "a1 a2 a3 OTHER b1 b2 b3"),
        ])
        runs = sorted(
            dup_ngram_runs(df, "text", "doc_id", n=3)
            .filter(F.col("doc_id") == 1).collect(),
            key=lambda r: r["run_start"],
        )
        assert [(r["run_start"], r["n_grams"]) for r in runs] == [(0, 1), (5, 1)]

    def test_within_doc_repeat_is_not_duplication(self, spark):
        # the repeated trigram occurs twice in ONE doc only: no output
        df = _docs(spark, [
            (1, "s", "r r r x r r r"),
            (2, "s", "u v w"),
        ])
        assert dup_ngram_runs(df, "text", "doc_id", n=3).count() == 0

    def test_short_docs_yield_no_windows(self, spark):
        df = _docs(spark, [(1, "s", "a b"), (2, "s", "a b")])
        assert dup_ngram_runs(df, "text", "doc_id", n=3).count() == 0


class TestSourceGramOverlap:
    def test_exact_jaccard(self, spark):
        df = _docs(spark, [
            (1, "s1", "a b c d"),    # bigrams: ab bc cd
            (2, "s2", "b c d e"),    # bigrams: bc cd de
            (3, "s3", "x y z"),      # disjoint: xy yz
        ])
        out = {(r["source_a"], r["source_b"]): r for r in
               source_gram_overlap(df, "text", "source", n=2).collect()}
        assert set(out) == {("s1", "s2")}  # disjoint pair never emitted
        r = out[("s1", "s2")]
        assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
        assert r["jaccard"] == pytest.approx(0.5, abs=1e-6)

    def test_vocab_is_distinct_per_source(self, spark):
        # repeated grams within a source count once in the vocabulary
        df = _docs(spark, [
            (1, "s1", "a b a b"),   # bigrams ab, ba, ab -> vocab {ab, ba}
            (2, "s2", "a b"),       # vocab {ab}
        ])
        r = source_gram_overlap(df, "text", "source", n=2).collect()[0]
        assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 1, 1)
        assert r["jaccard"] == pytest.approx(0.5, abs=1e-6)
