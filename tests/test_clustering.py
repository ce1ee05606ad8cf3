"""k-means (operators/clustering.py): exactness vs an independent numpy
replication, partitioning invariance, tie/empty-cluster semantics, and
the zero-shuffle assignment plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import clustering

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, Q, k, iters):
    """Independent exact replication (int64 throughout)."""
    order = np.argsort(ids)
    ids, Q = np.asarray(ids)[order], np.asarray(Q, dtype=np.int64)[order]
    cent = {j: Q[j].copy() for j in range(k)}
    for _ in range(iters):
        ks = sorted(cent)
        D = np.stack([((Q - cent[j]) ** 2).sum(axis=1) for j in ks], axis=1)
        assign = np.array(ks)[np.argmin(D, axis=1)]
        nxt = {}
        for j in ks:
            m = assign == j
            if not m.any():
                continue
            s, n = Q[m].sum(axis=0), int(m.sum())
            nxt[j] = np.array(
                [clustering._trunc_div(int(v), n) for v in s], dtype=np.int64
            )
        cent = nxt
    return ids, Q, cent


def test_trunc_div_is_c_style():
    assert clustering._trunc_div(7, 2) == 3
    assert clustering._trunc_div(-7, 2) == -3  # python // would give -4
    assert clustering._trunc_div(-6, 3) == -2
    assert clustering._trunc_div(0, 5) == 0


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_fit_matches_numpy_replication(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = [int(r["vec_id"]) for r in rows]
    Q = [[math.floor(float(x) * clustering.QUANTIZE) for x in r["embedding"]]
         for r in rows]
    _, _, want = _numpy_kmeans(ids, Q, k=4, iters=3)

    got = clustering.kmeans_fit(emb, k=4, iters=3)
    assert sorted(got) == sorted(want)
    for j in got:
        assert got[j] == want[j].tolist(), f"cluster {j} centroid drifted"


def test_fit_is_partitioning_invariant(spark, emb):
    a = clustering.kmeans_fit(emb.repartition(1), k=3, iters=2)
    b = clustering.kmeans_fit(emb.repartition(7), k=3, iters=2)
    assert a == b


def test_assign_matches_numpy_and_plans_without_shuffle(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = [int(r["vec_id"]) for r in rows]
    Q = [[math.floor(float(x) * clustering.QUANTIZE) for x in r["embedding"]]
         for r in rows]
    sids, sQ, cent = _numpy_kmeans(ids, Q, k=4, iters=3)
    ks = sorted(cent)
    D = np.stack([((sQ - cent[j]) ** 2).sum(axis=1) for j in ks], axis=1)
    want = {
        int(i): (int(np.array(ks)[a]), int(d))
        for i, a, d in zip(sids, np.argmin(D, axis=1), D.min(axis=1))
    }

    out = clustering.kmeans_assign(emb, clustering.kmeans_fit(emb, k=4, iters=3))
    got = {int(r["vec_id"]): (int(r["cluster"]), int(r["dist"]))
           for r in out.collect()}
    assert got == want

    # assignment is a pure projection: no Exchange, no Python eval
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_empty_cluster_drops_out(spark):
    # ids 0 and 1 share a vector -> centroids 0 and 1 start identical,
    # ties assign everything to cluster 0, cluster 1 must disappear.
    data = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.001, 0.001]),
            (3, [1.0, 1.0]), (4, [1.0, 1.0])]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    cent = clustering.kmeans_fit(df, k=2, iters=2)
    assert list(cent) == [0]
    out = clustering.kmeans_assign(df, cent)
    assert {r["cluster"] for r in out.collect()} == {0}


def test_cells_counts_sum_to_corpus(spark, emb):
    cells = clustering.kmeans_cells(spark, emb, k=4, iters=3)
    rows = cells.collect()
    d = max(int(r["pos"]) for r in rows) + 1
    total = sum(int(r["n_vecs"]) for r in rows) // d
    assert total == emb.count()
