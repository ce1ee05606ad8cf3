"""BPE trainer (operators/bpe.py): greedy-scan semantics vs a pure-
Python replication, overlap (a==b) handling, partitioning invariance,
deterministic argmax tie-breaks, and the zero-shuffle re-encode plan."""

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import bpe


def _py_merge(seq, a, b, new_id):
    """Reference greedy leftmost non-overlapping scan."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _py_fit(seqs, rounds, first_new_id):
    seqs = [list(s) for s in seqs]
    merges = []
    for r in range(rounds):
        counts = {}
        for s in seqs:
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        # cnt desc, then (a, b) ascending
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        new_id = first_new_id + r
        merges.append((a, b, new_id, cnt))
        seqs = [_py_merge(s, a, b, new_id) for s in seqs]
    return merges, seqs


def _df(spark, seqs):
    return spark.createDataFrame(
        [(i, list(s)) for i, s in enumerate(seqs)],
        "doc_id long, tokens array<int>",
    )


CORPUS = [
    [1, 2, 1, 2, 1, 2, 3],   # abab chain: non-overlapping repeats
    [5, 5, 5, 5, 5],         # a==b overlap: greedy -> XX5
    [1, 2, 3, 1, 2],
    [7],                      # too short for any pair
    [],                       # empty row
    [2, 1, 2, 1, 2, 1],
]


def test_merge_pair_matches_python_scan(spark):
    df = _df(spark, CORPUS)
    out = df.select("doc_id", bpe.merge_pair(F.col("tokens"), 1, 2, 99).alias("m"))
    got = {int(r["doc_id"]): list(r["m"]) for r in out.collect()}
    want = {i: _py_merge(s, 1, 2, 99) for i, s in enumerate(CORPUS)}
    assert got == want


def test_merge_pair_overlap_is_greedy_leftmost(spark):
    # 'aaaaa' + (a,a) -> X X a, never a X X or X a X
    df = _df(spark, [[5, 5, 5, 5, 5]])
    got = df.select(bpe.merge_pair(F.col("tokens"), 5, 5, 42).alias("m")).head()["m"]
    assert list(got) == [42, 42, 5]


def test_fit_matches_python_replication(spark):
    df = _df(spark, CORPUS)
    got = bpe.bpe_fit(df, rounds=3, first_new_id=100)
    want, _ = _py_fit(CORPUS, rounds=3, first_new_id=100)
    assert got == want


def test_fit_tiebreak_is_smallest_pair(spark):
    # (1,2) and (3,4) both occur twice -> the (cnt desc, a, b) argmax
    # must pick (1,2)
    seqs = [[1, 2, 9, 3, 4], [3, 4, 9, 1, 2]]
    got = bpe.bpe_fit(_df(spark, seqs), rounds=1, first_new_id=50)
    assert got[0][:2] == (1, 2)


def test_fit_is_partitioning_invariant(spark):
    df = _df(spark, CORPUS * 5)
    a = bpe.bpe_fit(df.repartition(1), rounds=3, first_new_id=100)
    b = bpe.bpe_fit(df.repartition(7), rounds=3, first_new_id=100)
    assert a == b


def test_apply_merges_matches_python_and_plans_without_shuffle(spark):
    df = _df(spark, CORPUS)
    merges, want_seqs = _py_fit(CORPUS, rounds=3, first_new_id=100)
    enc = bpe.apply_merges(df, merges)
    got = {int(r["doc_id"]): list(r["tokens"]) for r in enc.collect()}
    assert got == {i: s for i, s in enumerate(want_seqs)}

    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_pair_counts_shuffle_carries_pairs_only(spark):
    # plan shape: explode feeds a partial HashAggregate upstream of the
    # exchange (map-side collapse — the 100 TB contract). Plans print
    # top-down, so the partial agg is the one AFTER the Exchange line.
    df = _df(spark, CORPUS)
    plan = (
        bpe.pair_counts(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.rindex("HashAggregate") > plan.index("Exchange"), plan


def test_degenerate_corpus_stops_early(spark):
    df = _df(spark, [[1], [2], []])
    assert bpe.bpe_fit(df, rounds=3, first_new_id=10) == []
