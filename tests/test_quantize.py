"""SQ8 quantized search tests (operators/quantize.py): exactness vs an
independent numpy replication, the self-exclusion/k+1 local-winner
logic on a single partition, calibration errors, recall bounds, and
plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import quantize

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return [(int(r["vec_id"]), list(r["embedding"]))
            for r in emb.filter(F.col("vec_id") < 3).collect()]


def _numpy_topk(rows, queries, k, levels):
    """Independent replication: absmax over float32 values, float64
    code math, integer dot, (dot desc, vec_id asc) ranking."""
    ids = np.array([int(r["vec_id"]) for r in rows])
    M = np.array([list(r["embedding"]) for r in rows], dtype=np.float32)
    am = float(np.max(np.abs(M)))
    C = np.floor((M.astype(np.float64) * levels) / am).astype(np.int64)
    out = {}
    for qid, qv in queries:
        qc = np.floor((np.array(qv, dtype=np.float64) * levels) / am).astype(np.int64)
        dots = C @ qc
        order = sorted(range(len(ids)),
                       key=lambda i: (-int(dots[i]), int(ids[i])))
        order = [i for i in order if ids[i] != qid][:k]
        out[qid] = [(int(ids[i]), int(dots[i])) for i in order]
    return out


def test_matches_numpy_replication(spark, emb, queries):
    rows = emb.collect()
    want = _numpy_topk(rows, queries, k=5, levels=127)
    got = quantize.sq_topk(emb, queries, k=5).collect()
    for qid, pairs in want.items():
        mine = [(int(r["vec_id"]), int(r["dot"]))
                for r in sorted((r for r in got if r["query_id"] == qid),
                                key=lambda r: r["rank"])]
        assert mine == pairs, (qid, mine, pairs)


def test_full_k_on_single_partition(spark, emb, queries):
    # one partition holds every query's own row: the k+1 local-winner
    # rule must still deliver exactly k ranks per query
    got = quantize.sq_topk(emb.coalesce(1), queries, k=5).collect()
    per = {}
    for r in got:
        per.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values()), per


def test_partitioning_invariance(spark, emb, queries):
    a = sorted(map(tuple, quantize.sq_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple,
                   quantize.sq_topk(emb.repartition(13), queries, k=5).collect()))
    assert a == b


def test_zero_corpus_absmax_rejected(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        quantize.sq_absmax(df)


def test_recall_bounds_and_self_consistency(spark, emb, queries):
    rec = {r["query_id"]: r for r in quantize.sq_recall(emb, queries, k=5).collect()}
    assert set(rec) == {0, 1, 2}
    for r in rec.values():
        assert 0 <= r["n_common"] <= 5
        assert r["recall"] == round(r["n_common"] / 5, 4)
    # same grade on both sides -> identical rankings -> recall 1.0
    same = quantize.sq_recall(emb, queries, k=5, levels_lo=127, levels_hi=127)
    assert all(r["recall"] == 1.0 for r in same.collect())


def test_plan_shape(spark, emb, queries):
    from tests.test_plans import plan_of

    p = plan_of(quantize.sq_topk(emb, queries, k=5))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p  # Arrow path only
    assert "ArrowEvalPython" in p or "MapInPandas" in p or "mapInPandas" in p, p
