"""Perplexity LM (operators/perplexity.py): exactness vs a pure-Python
replication (add-1 smoothing, unseen trigram/prefix floors), shard-
merge of the fit artifact, filter semantics, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import perplexity


def _py_trigrams(s):
    return [s[i:i + 3] for i in range(len(s) - 2)]


def _py_lm(texts):
    lm = {}
    for t in texts:
        for g in _py_trigrams(t):
            lm[g] = lm.get(g, 0) + 1
    lmb = {}
    for g, c in lm.items():
        lmb[g[:2]] = lmb.get(g[:2], 0) + c
    return lm, lmb


def _py_score(text, lm, lmb):
    n_tri, nll = 0, 0
    counts = {}
    for g in _py_trigrams(text):
        counts[g] = counts.get(g, 0) + 1
    for g, c in counts.items():
        t = lm.get(g, 0)
        b = lmb.get(g[:2], 0)
        lp_q = round(
            (math.log(t + 1) - math.log(b + perplexity.V_VOCAB))
            * perplexity.LP_QUANTIZE
        )
        n_tri += c
        nll -= c * lp_q
    return n_tri, nll


TARGET = ["the cat sat on the mat", "the dog ate the bone", "a cat and a dog"]
ALL = TARGET + ["zzqx qqzz xqzq", "the cat", "ab", ""]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_scores_match_python_replication(spark):
    lm_df = perplexity.trigram_counts(_docs(spark, TARGET))
    out = perplexity.perplexity_scores(_docs(spark, ALL), lm_df)
    got = {int(r["doc_id"]): (int(r["n_tri"]), int(r["nll_q"]))
           for r in out.collect()}
    lm, lmb = _py_lm(TARGET)
    want = {i: _py_score(t, lm, lmb) for i, t in enumerate(ALL)}
    assert got == want
    # gibberish must score worse per-trigram than in-domain text
    assert got[3][1] * got[0][0] > got[0][1] * got[3][0]


def test_short_docs_score_zero(spark):
    lm_df = perplexity.trigram_counts(_docs(spark, TARGET))
    out = perplexity.perplexity_scores(_docs(spark, ALL), lm_df)
    got = {int(r["doc_id"]): (int(r["n_tri"]), int(r["nll_q"]))
           for r in out.collect()}
    assert got[5] == (0, 0)  # "ab"
    assert got[6] == (0, 0)  # ""


def test_fit_is_shard_mergeable(spark):
    whole = perplexity.trigram_counts(_docs(spark, TARGET))
    a = perplexity.trigram_counts(_docs(spark, TARGET[:1]))
    b = perplexity.trigram_counts(_docs(spark, TARGET[1:]))
    merged = a.unionByName(b).groupBy("tri").agg(F.sum("t_cnt").alias("t_cnt"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_filter_keeps_in_domain_drops_gibberish(spark):
    lm_df = perplexity.trigram_counts(_docs(spark, TARGET))
    scores = perplexity.perplexity_scores(_docs(spark, ALL), lm_df)
    kept = {int(r["doc_id"])
            for r in perplexity.perplexity_filter(scores, 4.6).collect()}
    assert 0 in kept and 1 in kept  # in-domain survives
    assert 3 not in kept            # gibberish dropped
    assert 5 not in kept and 6 not in kept  # no-evidence docs dropped


def test_relative_filter_splits_corpus_and_matches_python(spark):
    lm_df = perplexity.trigram_counts(_docs(spark, TARGET))
    scores = perplexity.perplexity_scores(_docs(spark, ALL), lm_df)
    kept = {int(r["doc_id"]) for r in perplexity.perplexity_filter(scores).collect()}
    lm, lmb = _py_lm(TARGET)
    ev = {i: _py_score(t, lm, lmb) for i, t in enumerate(ALL)
          if _py_score(t, lm, lmb)[0] > 0}
    t_n = sum(n for n, _ in ev.values())
    t_nll = sum(s for _, s in ev.values())
    want = {i for i, (n, s) in ev.items() if s * t_n <= n * t_nll}
    assert kept == want
    assert kept and set(ev) - kept, "gate must keep AND drop something"


def test_scores_partitioning_invariant(spark):
    lm_df = perplexity.trigram_counts(_docs(spark, TARGET))
    a = perplexity.perplexity_scores(_docs(spark, ALL).repartition(1), lm_df)
    b = perplexity.perplexity_scores(_docs(spark, ALL).repartition(7), lm_df)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fit_partial_agg_collapses_before_exchange(spark):
    plan = (
        perplexity.trigram_counts(_docs(spark, TARGET * 20))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.rindex("HashAggregate") > plan.index("Exchange"), plan
    assert "BatchEvalPython" not in plan, plan
