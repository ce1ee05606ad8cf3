"""Tests: sessionization (batch + stateful streaming), sequence packing,
length histogram, embedding cosine near-dup."""

import os
from functools import partial

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import sequences as seq_op
from redeye_spark.operators import sessionize as sess_op


@pytest.fixture(scope="module")
def req_df(spark):
    # host A: bursts at t=0..2min, then t=100min (2 sessions)
    # host B: single request (1 session)
    import datetime as dt

    rows = [("hostA", dt.datetime(2024, 1, 1, 0, m)) for m in [0, 1, 2]]
    rows += [("hostA", dt.datetime(2024, 1, 1, 1, 40)), ("hostA", dt.datetime(2024, 1, 1, 1, 41))]
    rows.append(("hostB", dt.datetime(2024, 1, 1, 0, 0)))
    return spark.createDataFrame(rows, "remote_host string, timestamp timestamp")


class TestSessionize:
    def test_batch_sessions(self, spark, req_df):
        got = sess_op.session_stats(req_df, gap_minutes=30).toPandas().sort_values(
            ["remote_host", "session_id"]).reset_index(drop=True)
        assert len(got) == 3
        a = got[got["remote_host"] == "hostA"]
        assert sorted(a["n_requests"]) == [2, 3]
        assert sorted(a["duration_sec"]) == [60, 120]
        b = got[got["remote_host"] == "hostB"]
        assert list(b["n_requests"]) == [1] and list(b["duration_sec"]) == [0]

    def test_streaming_stateful_sessions(self, spark, req_df, tmp_path_factory):
        base = str(tmp_path_factory.mktemp("sess"))
        req_df.repartition(2).write.mode("overwrite").parquet(base + "/in")
        stream = (
            spark.readStream.schema(req_df.schema).parquet(base + "/in")
            .groupBy(F.col("remote_host"))
            .applyInPandasWithState(
                partial(sess_op.session_update, gap_minutes=30),
                outputStructType=sess_op.SESSION_OUT_SCHEMA,
                stateStructType=sess_op.SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="ProcessingTimeTimeout",
            )
        )
        q = (stream.writeStream.format("parquet")
             .option("path", base + "/out")
             .option("checkpointLocation", base + "/ckpt")
             .trigger(availableNow=True).start())
        # a stateful query with ProcessingTimeTimeout may keep running to
        # serve timeouts even under availableNow — poll for the closed-
        # session output, then stop
        import time

        deadline = time.time() + 180
        while time.time() < deadline:
            done = q.awaitTermination(5)
            files = (os.path.exists(base + "/out")
                     and [f for f in os.listdir(base + "/out") if f.endswith(".parquet")])
            if done or (files and spark.read.parquet(base + "/out").count() > 0):
                break
        q.stop()
        out_files = [f for f in os.listdir(base + "/out") if f.endswith(".parquet")]
        got = spark.read.parquet(base + "/out").toPandas() if out_files else pd.DataFrame()
        # all of hostA's first session closes within the batch (gap seen);
        # open sessions (hostA#2, hostB#1) stay in state awaiting timeout
        assert len(got) >= 1
        first = got[got["key"] == "hostA"].iloc[0]
        assert first["n_requests"] == 3 and first["duration_sec"] == 120


class TestSequences:
    @pytest.fixture()
    def toks_df(self, spark):
        rows = [
            ("d1", list(range(100)), 100),
            ("d2", list(range(50)), 50),
            ("d3", list(range(200)), 200),
            ("d4", list(range(300)), 300),  # > max alone
            ("d5", list(range(10)), 10),
        ]
        return spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int").coalesce(1)

    def test_pack_respects_budget_and_covers_all_docs(self, spark, toks_df):
        packed = seq_op.pack_sequences(toks_df, max_tokens=256, sep_token=0).toPandas()
        all_docs = [d for ds in packed["doc_ids"] for d in ds]
        assert sorted(all_docs) == ["d1", "d2", "d3", "d4", "d5"]
        for _, r in packed.iterrows():
            assert r["n_tok"] == len(r["tokens"])
            if r["n_docs"] > 1:
                assert r["n_tok"] <= 256
            # separator count == docs-1
            assert sum(1 for t in r["tokens"] if t == 0) >= r["n_docs"] - 1

    def test_pack_token_content_preserved(self, spark, toks_df):
        packed = seq_op.pack_sequences(toks_df, max_tokens=256, sep_token=-1).toPandas()
        for _, r in packed.iterrows():
            # split on separator -> original sequences in order
            toks = np.array(r["tokens"])
            splits = np.split(toks, np.where(toks == -1)[0])
            parts = [s[s != -1] for s in splits if len(s[s != -1])]
            assert len(parts) == r["n_docs"]

    def test_length_histogram(self, spark, toks_df):
        h = {r["len_bucket"]: (r["n"], r["total_tok"])
             for r in seq_op.length_histogram(toks_df, bucket=100).collect()}
        assert h[0] == (2, 60)      # 50, 10
        assert h[100] == (1, 100)
        assert h[200] == (1, 200)
        assert h[300] == (1, 300)

    def test_cosine_near_dup(self, spark):
        rng = np.random.default_rng(1)
        base = rng.normal(size=8)
        rows = [
            (0, [float(x) for x in base]),
            (1, [float(x) for x in base * 2.0]),            # same direction -> cos 1
            (2, [float(x) for x in base + rng.normal(scale=0.01, size=8)]),  # near dup
            (3, [float(x) for x in rng.normal(size=8)]),    # unrelated
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = seq_op.cosine_near_dup_pairs(df, threshold=0.98).toPandas()
        got = set(map(tuple, pairs[["id_a", "id_b"]].values))
        assert (0, 1) in got and (0, 2) in got and (1, 2) in got
        assert not any(3 in p for p in got)
