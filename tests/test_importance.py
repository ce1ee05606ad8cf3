"""DSIR importance weighting (operators/importance.py): exactness vs an
independent Python replication, merge invariance of the ratio cells,
and the broadcast/no-row-Python plan shape."""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import importance

SF = "/root/testdata/sf0.001"


def _bucket(w: str) -> int:
    return int(hashlib.md5(f"dsir42:{w}".encode()).hexdigest()[:2], 16)


def _replicate(docs):
    """(ratios, lr_q, scores) computed independently in pure Python."""
    nt, nr, feats = Counter(), Counter(), {}
    for did, text, lang in docs:
        ws = [x for x in re.split(r"\s+", text or "") if x]
        bs = [_bucket(x) for x in ws]
        feats[did] = Counter(bs)
        for b in bs:
            nr[b] += 1
            if lang == "en":
                nt[b] += 1
    T, R = sum(nt.values()), sum(nr.values())
    lr = {
        b: round(
            (math.log((nt.get(b, 0) + 1) / (T + 256))
             - math.log((nr[b] + 1) / (R + 256))) * 1e6
        )
        for b in nr
    }
    scores = {d: sum(c * lr[b] for b, c in f.items()) for d, f in feats.items()}
    return nt, nr, lr, scores


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_scores_match_python_replication(spark, docs):
    rows = [(int(r["doc_id"]), r["text"], r["lang"])
            for r in docs.select("doc_id", "text", "lang").collect()]
    _, _, _, want = _replicate(rows)
    got = {
        int(r["doc_id"]): int(r["score_q"])
        for r in importance.dsir_scores(docs, F.col("lang") == "en").collect()
    }
    assert got == want


def test_ratio_cells_merge_across_shards(spark, docs):
    """bucket_ratios is mergeable: cells from two disjoint halves sum to
    the full-corpus cells (the fit-once-reuse contract)."""
    full = {
        (int(r["bucket"])): (int(r["n_target"]), int(r["n_raw"]))
        for r in importance.bucket_ratios(docs, F.col("lang") == "en").collect()
    }
    merged: dict[int, tuple[int, int]] = {}
    for pred in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        part = docs.filter(pred)
        for r in importance.bucket_ratios(part, F.col("lang") == "en").collect():
            t, n = merged.get(int(r["bucket"]), (0, 0))
            merged[int(r["bucket"])] = (t + int(r["n_target"]), n + int(r["n_raw"]))
    assert merged == full


def test_top_docs_deterministic_and_ordered(spark, docs):
    top = importance.dsir_top_docs(docs, F.col("lang") == "en", n=10).collect()
    assert len(top) == 10
    keys = [(-int(r["score_q"]), int(r["doc_id"])) for r in top]
    assert keys == sorted(keys)
    # repeatable under different partitioning
    top2 = importance.dsir_top_docs(
        docs.repartition(5), F.col("lang") == "en", n=10
    ).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in top2]


def test_score_plan_broadcasts_and_stays_jvm(spark, docs):
    plan = importance.dsir_scores(docs, F.col("lang") == "en") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
