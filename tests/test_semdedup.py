"""SemDeDup (operators/semdedup.py): exactness vs an independent numpy
replication, clamp/threshold/keeper semantics, the int64 headroom
guard, partitioning invariance, and the no-cartesian plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import clustering, semdedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return clustering.kmeans_fit(emb, k=4, iters=3)


def _numpy_pairs(rows, centroids, num, den):
    """Independent replication: fine-grid assignment (smallest-id tie),
    coarse-grid clamp+floor, exact integer threshold test."""
    ids = np.array([int(r["vec_id"]) for r in rows])
    M = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    QF = np.floor(M * clustering.QUANTIZE).astype(np.int64)
    ks = sorted(centroids)
    D = np.stack(
        [((QF - np.array(centroids[j], dtype=np.int64)) ** 2).sum(axis=1)
         for j in ks], axis=1)
    cl = np.array(ks)[np.argmin(D, axis=1)]
    C = np.floor(np.clip(M, -1.0, 1.0) * semdedup.SIM_QUANTIZE).astype(np.int64)
    n2 = (C * C).sum(axis=1)
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cl[i] == cl[j]:
                dot = int(C[i] @ C[j])
                if dot > 0 and dot * dot * den * den >= num * num * int(n2[i]) * int(n2[j]):
                    want.add((int(cl[i]), int(ids[i]), int(ids[j]), dot))
    return want, {int(i): int(c) for i, c in zip(ids, cl)}


def test_pairs_match_numpy_replication(spark, emb, centroids):
    # tau=2/5 so the sf0.001 slice yields a non-empty pair set
    rows = emb.select("vec_id", "embedding").collect()
    want, _ = _numpy_pairs(rows, centroids, 2, 5)
    assert want, "test corpus lost its sub-0.45 similarity structure"
    got = {
        (int(r["cluster"]), int(r["id_a"]), int(r["id_b"]), int(r["dot_q"]))
        for r in semdedup.semantic_dup_pairs(emb, centroids, tau=(2, 5)).collect()
    }
    assert got == want


def test_keep_is_all_minus_junior_pair_members(spark, emb, centroids):
    rows = emb.select("vec_id", "embedding").collect()
    want_pairs, want_cl = _numpy_pairs(rows, centroids, 2, 5)
    dropped = {b for _, _, b, _ in want_pairs}
    keep = semdedup.semantic_dedup_keep(emb, centroids, tau=(2, 5)).collect()
    assert {int(r["vec_id"]) for r in keep} == set(want_cl) - dropped
    for r in keep:
        assert int(r["cluster"]) == want_cl[int(r["vec_id"])]


def test_chain_drops_every_junior_witnessed_member(spark):
    # a~b and b~c above threshold, a!~c: keep-first greedy drops BOTH b
    # and c (each has a senior witness) — documented non-CC semantics.
    data = [
        (0, [1.0, 0.0]),
        (1, [0.9701, 0.2425]),   # cos(0,1) ~ 0.97
        (2, [0.8, 0.6]),          # cos(1,2) ~ 0.92, cos(0,2) = 0.8
        (3, [-1.0, 0.0]),         # far from everything
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    cent = {0: [0, 0]}  # single cluster: blocking out of the way
    pairs = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in semdedup.semantic_dup_pairs(df, cent, tau=(9, 10)).collect()
    }
    assert pairs == {(0, 1), (1, 2)}
    keep = semdedup.semantic_dedup_keep(df, cent, tau=(9, 10))
    assert {int(r["vec_id"]) for r in keep.collect()} == {0, 3}


def test_clamp_bounds_out_of_range_components(spark):
    # components beyond [-1, 1] clamp BEFORE quantization: (7, 0) and
    # (2, 0) both land on (1000, 0), an exact duplicate pair.
    data = [(0, [7.0, 0.0]), (1, [2.0, 0.0])]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    out = semdedup.semantic_dup_pairs(df, {0: [0, 0]}, tau=(99, 100)).collect()
    assert [(int(r["id_a"]), int(r["id_b"]), int(r["dot_q"])) for r in out] \
        == [(0, 1, 1000 * 1000)]


def test_headroom_guard_rejects_overflowable_dims(spark):
    d = 2000  # (d * q^2)^2 * den^2 over 2^63 at q=1000, den=20
    df = spark.createDataFrame(
        [(0, [0.0] * d)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="headroom"):
        semdedup.semantic_dup_pairs(df, {0: [0] * d}, tau=(19, 20))


def test_pairs_are_partitioning_invariant(spark, emb, centroids):
    a = semdedup.semantic_dup_pairs(emb.repartition(1), centroids, tau=(2, 5))
    b = semdedup.semantic_dup_pairs(emb.repartition(7), centroids, tau=(2, 5))
    key = lambda r: (r["cluster"], r["id_a"], r["id_b"], r["dot_q"])
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_plan_blocks_on_cluster_never_cartesian(spark, emb, centroids):
    df = semdedup.semantic_dup_pairs(emb, centroids)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the pair search is an equi-join keyed on the cluster id
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan), plan
