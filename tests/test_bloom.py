"""Bloom filter (operators/bloom.py): no false negatives, deterministic
positions vs a pure-Python md5 replication, shard-merge equivalence,
and the zero-shuffle probe plan."""

import hashlib

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import bloom


def _py_positions(value, seed=42):
    return [
        int(hashlib.md5(f"bloom{seed}:{j}:{value}".encode()).hexdigest()[:3], 16)
        for j in range(bloom.N_HASHES)
    ]


def _py_words(values, seed=42):
    words = [0] * (bloom.M_BITS // bloom.WORD_BITS + 1)
    for v in values:
        for p in _py_positions(v, seed):
            words[p // bloom.WORD_BITS] |= 1 << (p % bloom.WORD_BITS)
    return words


def _df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


MEMBERS = [0, 7, 14, 21, 1001, 424242]


def test_cells_match_python_md5_replication(spark):
    cells = bloom.bloom_cells(_df(spark, MEMBERS), "doc_id")
    got = {int(r["word_idx"]): int(r["bits"]) for r in cells.collect()}
    want = {i: w for i, w in enumerate(_py_words(MEMBERS)) if w != 0}
    assert got == want


def test_no_false_negatives_and_fps_are_deterministic(spark):
    words = bloom.collect_words(bloom.bloom_cells(_df(spark, MEMBERS), "doc_id"))
    probes = _df(spark, list(range(2000)))
    out = bloom.bloom_probe(probes, words, "doc_id")
    got = {int(r["doc_id"]): bool(r["bloom_hit"]) for r in out.collect()}
    # every member hits
    for m in MEMBERS:
        if m < 2000:
            assert got[m], f"false negative on member {m}"
    # verdicts replicate exactly (false positives included)
    pyw = _py_words(MEMBERS)
    for v, hit in got.items():
        want = all(
            pyw[p // bloom.WORD_BITS] >> (p % bloom.WORD_BITS) & 1
            for p in _py_positions(v)
        )
        assert hit == want, f"verdict drift on {v}"


def test_probe_plan_is_pure_projection(spark):
    words = bloom.collect_words(bloom.bloom_cells(_df(spark, MEMBERS), "doc_id"))
    out = bloom.bloom_probe(_df(spark, [1, 2, 3]), words, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_shard_merge_equals_whole_build(spark):
    whole = bloom.collect_words(bloom.bloom_cells(_df(spark, MEMBERS), "doc_id"))
    a = bloom.bloom_cells(_df(spark, MEMBERS[:3]), "doc_id")
    b = bloom.bloom_cells(_df(spark, MEMBERS[3:]), "doc_id")
    merged_cells = (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    )
    assert bloom.collect_words(merged_cells) == whole


def test_cells_partial_agg_collapses_before_exchange(spark):
    plan = (
        bloom.bloom_cells(_df(spark, list(range(500))), "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.rindex("HashAggregate") > plan.index("Exchange"), plan


class TestBloomPrunedJoin:
    def test_equals_plain_join(self, spark):
        from redeye_spark.operators.bloom import bloom_pruned_join

        fact = spark.createDataFrame(
            [(i, i % 100) for i in range(3000)], "row_id long, k long")
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(0, 100, 7)], "dk long, label string")
        got = sorted(map(tuple, bloom_pruned_join(fact, dim, "k", "dk")
                         .select("row_id", "k", "dk", "label").collect()))
        want = sorted(map(tuple, fact.join(
            dim, fact["k"] == dim["dk"]).select(
            "row_id", "k", "dk", "label").collect()))
        assert got == want and len(got) > 0

    def test_prune_happens_before_join(self, spark):
        from redeye_spark.operators.bloom import bloom_pruned_join
        from tests.test_plans import plan_of

        fact = spark.createDataFrame([(i, i) for i in range(50)],
                                     "row_id long, k long")
        dim = spark.createDataFrame([(1, "a"), (2, "b")], "dk long, label string")
        p = plan_of(bloom_pruned_join(fact, dim, "k", "dk"))
        # the probe filter is codegen md5 arithmetic in a Filter node,
        # not a join or Python eval
        assert "md5" in p and "Filter" in p, p
        assert "BatchEvalPython" not in p and "CartesianProduct" not in p
