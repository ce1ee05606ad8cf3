"""Unit tests for the round-5 search/anomaly/centroid operators:
bm25_topk, rolling_anomalies, centroid_cells/label_centroids,
take_per_group."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_ranking_and_rounding(spark):
    from redeye_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([
        Row(doc_id="a", text="spark spark spark filler"),
        Row(doc_id="b", text="spark filler filler filler"),
        Row(doc_id="c", text="filler filler filler filler"),
        Row(doc_id="d", text="SPARK shout"),          # case-folded match
    ])
    out = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert set(ids) == {"a", "b", "d"}          # c has no hit -> score 0 dropped
    assert ids[0] == "a"                        # highest tf wins
    # shorter doc with one hit beats longer doc with one hit (dl norm)
    assert ids.index("d") < ids.index("b")
    assert all(r["score"] > 0 for r in out)


def test_bm25_k_cut_and_empty_terms(spark):
    from redeye_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [Row(doc_id=f"d{i}", text="hit " + "pad " * i) for i in range(6)]
    )
    assert bm25_topk(docs, ["hit"], k=3).count() == 3
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


# ---------------------------------------------------------------------------
# rolling anomalies
# ---------------------------------------------------------------------------

def _val_events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=_ts(t), value=float(v))
         for i, (u, t, v) in enumerate(rows)]
    )


def test_rolling_anomalies_flags_spike(spark):
    from redeye_spark.operators.timeseries import rolling_anomalies

    rows = [(1, f"2024-01-01T00:{m:02d}:00", 10.0) for m in range(10)]
    rows.append((1, "2024-01-01T00:10:00", 500.0))           # the spike
    rows += [(2, f"2024-01-01T00:{m:02d}:00", 10.0 + m) for m in range(10)]
    out = rolling_anomalies(
        _val_events(spark, rows), "user_id", "ts", "value",
        window_s=3600, threshold=2.5, min_window=5,
    ).collect()
    assert [(r["user_id"], r["value"]) for r in out] == [(1, 500.0)]
    assert out[0]["n_window"] == 11


def test_rolling_anomalies_threshold_strict(spark):
    from redeye_spark.operators.timeseries import rolling_anomalies

    # constant series: variance 0 and deviation 0 -> 0 > 0 is false,
    # so NOTHING flags (the all-equal window must not divide by zero
    # or flag everything)
    rows = [(1, f"2024-01-01T00:{m:02d}:00", 7.0) for m in range(10)]
    out = rolling_anomalies(
        _val_events(spark, rows), "user_id", "ts", "value",
        window_s=3600, threshold=2.5, min_window=2,
    )
    assert out.count() == 0


def test_rolling_anomalies_min_window_gate(spark):
    from redeye_spark.operators.timeseries import rolling_anomalies

    # spike arrives as the 2nd point: window too small to flag
    rows = [(1, "2024-01-01T00:00:00", 10.0), (1, "2024-01-01T00:01:00", 500.0)]
    out = rolling_anomalies(
        _val_events(spark, rows), "user_id", "ts", "value",
        window_s=3600, threshold=2.5, min_window=5,
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# centroids
# ---------------------------------------------------------------------------

def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=lab)
         for i, (lab, v) in enumerate(rows)]
    )


def test_centroid_cells_exact_and_mergeable(spark):
    from redeye_spark.operators.similarity import centroid_cells

    df = _emb(spark, [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [-1.5, 0.25])])
    out = {(r["label"], r["pos"]): (r["sum_q"], r["n_vecs"])
           for r in centroid_cells(df).collect()}
    assert out == {
        (0, 0): (4_000_000, 2), (0, 1): (6_000_000, 2),
        (1, 0): (-1_500_000, 1), (1, 1): (250_000, 1),
    }
    # mergeability: cells of two halves sum to the cells of the union
    h1, h2 = df.filter("vec_id < 1"), df.filter("vec_id >= 1")
    merged = (
        centroid_cells(h1).unionByName(centroid_cells(h2))
        .groupBy("label", "pos")
        .agg(F.sum("sum_q").alias("sum_q"), F.sum("n_vecs").alias("n_vecs"))
    )
    re = {(r["label"], r["pos"]): (r["sum_q"], r["n_vecs"])
          for r in merged.collect()}
    assert re == out


def test_label_centroids_means(spark):
    from redeye_spark.operators.similarity import label_centroids

    df = _emb(spark, [(0, [1.0, 2.0]), (0, [3.0, 4.0])])
    [row] = label_centroids(df).collect()
    assert row["label"] == 0
    assert row["centroid"] == pytest.approx([2.0, 3.0])


# ---------------------------------------------------------------------------
# take_per_group
# ---------------------------------------------------------------------------

def test_take_per_group_counts_and_determinism(spark):
    from redeye_spark.operators.sampling import take_per_group

    df = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 3}") for i in range(40)]
    )
    out = take_per_group(df, n=4, strata_col="source", id_col="doc_id")
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in
                  take_per_group(df, n=4, strata_col="source", id_col="doc_id").collect())
    assert ids1 == ids2
    # n larger than the stratum: whole stratum survives, no error
    assert take_per_group(df, n=100, strata_col="source", id_col="doc_id").count() == 40
    with pytest.raises(ValueError):
        take_per_group(df, n=0)


# ---------------------------------------------------------------------------
# round-5 batch 3: resample agg_fn, transitions, profiling
# ---------------------------------------------------------------------------

def test_resample_ffill_exact_agg(spark):
    from redeye_spark.operators.timeseries import resample_ffill

    rows = [
        (1, "2024-01-01T00:10:00", 1.25),
        (1, "2024-01-01T00:40:00", 2.75),   # same bucket: sums to 400 cents
        (1, "2024-01-01T03:30:00", 10.0),   # 2-hour gap -> 2 filled buckets
    ]
    df = _val_events(spark, rows)
    out = resample_ffill(
        df, "user_id", "ts", "value", step_seconds=3600,
        agg_fn=lambda c: F.sum(F.round(c.cast("double") * 100).cast("long")),
    ).orderBy("bucket").collect()
    assert [(str(r["bucket"]), r["value_ffill"], r["n_events"]) for r in out] == [
        ("2024-01-01 00:00:00", 400, 2),
        ("2024-01-01 01:00:00", 400, 0),
        ("2024-01-01 02:00:00", 400, 0),
        ("2024-01-01 03:00:00", 1000, 1),
    ]


def test_event_transitions_counts(spark):
    from redeye_spark.queries.eventsq import q_event_transitions
    import duckdb

    # hand graph via the real query at the smallest sf, pinned against
    # a direct lag computation in DuckDB
    sd = "/root/testdata/sf0.001"
    sp = q_event_transitions(spark, sd).toPandas()
    total = int(sp["n_transitions"].sum())
    n_events = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM read_parquet('{sd}/events.parquet')"
    ).fetchone()
    # every event except each user's first contributes one transition
    assert total == n_events[0] - n_events[1]


def test_profile_events_shape(spark):
    from redeye_spark.queries.eventsq import q_profile_events

    out = {r["column_name"]: (r["n_nulls"], r["n_distinct"])
           for r in q_profile_events(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert out["event_type"] == (0, 5)
    assert out["event_id"][1] > 0 and out["event_id"][0] == 0


# ---------------------------------------------------------------------------
# round-5 batch 6: exact covariance + PCA
# ---------------------------------------------------------------------------

def test_covariance_cells_exact(spark):
    from redeye_spark.operators.similarity import covariance_cells

    df = _emb(spark, [(0, [1.0, 2.0]), (0, [3.0, 5.0])])
    out = {(r["i"], r["j"]): (r["sum_xy_q"], r["sum_x_q"], r["sum_y_q"], r["n"])
           for r in covariance_cells(df).collect()}
    q = 1_000_000
    assert out == {
        (0, 0): (10 * q * q, 4 * q, 4 * q, 2),
        (0, 1): (17 * q * q, 4 * q, 7 * q, 2),
        (1, 1): (29 * q * q, 7 * q, 7 * q, 2),
    }


def test_pca_project_matches_numpy(spark):
    import numpy as np
    from redeye_spark.operators.similarity import pca_project

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 6))
    df = _emb(spark, [(0, list(map(float, x))) for x in X])
    proj, evr = pca_project(df, k=2)
    got = np.array([r["pca"] for r in proj.orderBy("vec_id").collect()])
    Xc = X - X.mean(0)
    w, v = np.linalg.eigh(np.cov(X.T, bias=True))
    order = np.argsort(w)[::-1][:2]
    ref = Xc @ v[:, order]
    # eigenvector sign is arbitrary: compare per-column up to sign
    for c in range(2):
        assert (np.allclose(got[:, c], ref[:, c], atol=1e-4)
                or np.allclose(got[:, c], -ref[:, c], atol=1e-4))
    assert evr[0] >= evr[1] > 0
    with pytest.raises(ValueError):
        pca_project(df, k=0)
