"""As-of join semantics (operators/asof.py): edge cases hand-built,
bulk behavior cross-checked against pandas merge_asof."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from redeye_spark.operators.asof import asof_join


def _join(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k long, ts long, lbl string")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double, rid long")
    kw.setdefault("tie_col", "rid")
    out = asof_join(
        left, right,
        left_on="k", right_on="k", left_ts="ts", right_ts="ts",
        right_cols=["v", "rid"], **kw,
    )
    return {(r["k"], r["ts"]): (r["v"], r["rid"]) for r in out.collect()}


class TestAsofSemantics:
    def test_backward_basic(self, spark):
        got = _join(
            spark,
            [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")],
            [(1, 5, 100.0, 1), (1, 12, 200.0, 2), (2, 99, 300.0, 3)],
        )
        assert got[(1, 10)] == (100.0, 1)   # latest at-or-before 10 is ts=5
        assert got[(1, 20)] == (200.0, 2)   # ts=12 supersedes ts=5
        assert got[(2, 15)] == (None, None)  # only future right rows: no match

    def test_exact_ts_inclusive_by_default_strict_excludes(self, spark):
        left = [(1, 10, "a")]
        right = [(1, 10, 50.0, 1), (1, 3, 40.0, 2)]
        assert _join(spark, left, right)[(1, 10)] == (50.0, 1)
        assert _join(spark, left, right, strict=True)[(1, 10)] == (40.0, 2)

    def test_tie_highest_tie_col_wins(self, spark):
        got = _join(
            spark,
            [(1, 10, "a")],
            [(1, 7, 1.0, 11), (1, 7, 2.0, 99), (1, 7, 3.0, 42)],
        )
        assert got[(1, 10)] == (2.0, 99)

    def test_payload_struct_never_stitches_rows(self, spark):
        """The matched right row's legitimate NULL must not be filled
        from an older right row (per-column last(IGNORE NULLS) would)."""
        left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, lbl string")
        right = spark.createDataFrame(
            [(1, 2, 9.0, 100), (1, 8, None, 200)],
            "k long, ts long, v double, rid long",
        )
        row = asof_join(
            left, right, "k", "k", "ts", "ts", ["v", "rid"], tie_col="rid"
        ).collect()[0]
        assert row["rid"] == 200 and row["v"] is None

    def test_null_keys_and_ts_never_match(self, spark):
        left = spark.createDataFrame(
            [(None, 10, "nullkey"), (1, None, "nullts"), (1, 10, "ok")],
            "k long, ts long, lbl string",
        )
        right = spark.createDataFrame(
            [(None, 1, 7.0, 1), (1, None, 8.0, 2), (1, 4, 9.0, 3)],
            "k long, ts long, v double, rid long",
        )
        out = {r["lbl"]: r["v"] for r in
               asof_join(left, right, "k", "k", "ts", "ts", ["v"], tie_col="rid").collect()}
        assert out == {"nullkey": None, "nullts": None, "ok": 9.0}

    def test_collision_raises(self, spark):
        df = spark.createDataFrame([(1, 2)], "k long, ts long")
        with pytest.raises(ValueError, match="collide"):
            asof_join(df, df, "k", "k", "ts", "ts", ["ts"])

    def test_left_row_count_preserved(self, spark):
        left = spark.createDataFrame([(i % 3, i, "x") for i in range(50)],
                                     "k long, ts long, lbl string")
        right = spark.createDataFrame([(0, 10, 1.0, 1)],
                                      "k long, ts long, v double, rid long")
        assert asof_join(left, right, "k", "k", "ts", "ts", ["v"],
                         tie_col="rid").count() == 50


class TestAsofBulk:
    def test_matches_pandas_merge_asof(self, spark):
        rng = np.random.default_rng(7)
        n_l, n_r = 400, 300
        lpd = pd.DataFrame({
            "k": rng.integers(0, 12, n_l),
            "ts": rng.choice(np.arange(0, 10_000, 3), n_l, replace=False).astype("int64"),
        })
        # unique (k, ts) on the right so merge_asof's tie rule can't differ
        rpd = pd.DataFrame({
            "k": rng.integers(0, 12, n_r),
            "ts": rng.choice(np.arange(1, 10_000, 7), n_r, replace=False).astype("int64"),
            "v": rng.normal(size=n_r).round(6),
        }).drop_duplicates(["k", "ts"])
        rpd["rid"] = np.arange(len(rpd))

        exp = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"),
            on="ts", by="k", direction="backward",
        ).sort_values(["k", "ts"]).reset_index(drop=True)

        left = spark.createDataFrame(lpd)
        right = spark.createDataFrame(rpd)
        got = (
            asof_join(left, right, "k", "k", "ts", "ts", ["v", "rid"], tie_col="rid")
            .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "ts", "v", "rid"]], exp[["k", "ts", "v", "rid"]],
            check_dtype=False,
        )


class TestAsofPlan:
    def test_single_exchange_no_join_node(self, spark):
        """The whole as-of is ONE hash exchange + window — never a join
        operator (a range join would amplify rows) and never a second
        shuffle."""
        from tests.test_plans import plan_of

        left = spark.range(100).select(
            (F.col("id") % 5).alias("k"), F.col("id").alias("ts"),
            F.lit("x").alias("lbl"))
        right = spark.range(50).select(
            (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"),
            F.col("id").cast("double").alias("v"))
        import re

        out = asof_join(left, right, "k", "k", "ts", "ts", ["v"])
        plan = plan_of(out)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert "Window" in plan, plan
        assert "Join" not in plan, plan


class TestReviewRegressions:
    def test_tie_col_keeps_64bit_precision(self, spark):
        """Two right rows at the same (key, ts) with bigint ids above
        2^53 must tie-break exactly (a double cast would collapse them
        into partition-order nondeterminism)."""
        big = (1 << 60) + 0  # 2^60: adjacent values are equal as doubles
        left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, lbl string")
        right = spark.createDataFrame(
            [(1, 7, 1.0, big), (1, 7, 2.0, big + 1)],
            "k long, ts long, v double, rid long",
        )
        rows = []
        from redeye_spark.operators.asof import asof_join
        for _ in range(3):
            rows.append(asof_join(left, right, "k", "k", "ts", "ts",
                                  ["v", "rid"], tie_col="rid").collect()[0])
        assert all(r["rid"] == big + 1 and r["v"] == 2.0 for r in rows), rows

    def test_string_tie_col_works(self, spark):
        from redeye_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, lbl string")
        right = spark.createDataFrame(
            [(1, 7, 1.0, "aaa"), (1, 7, 2.0, "zzz")],
            "k long, ts long, v double, rid string",
        )
        row = asof_join(left, right, "k", "k", "ts", "ts", ["v"],
                        tie_col="rid").collect()[0]
        assert row["v"] == 2.0

    def test_tie_col_must_be_right_column(self, spark):
        from redeye_spark.operators.asof import asof_join

        df = spark.createDataFrame([(1, 2, 3.0)], "k long, ts long, v double")
        with pytest.raises(ValueError, match="not a column of right"):
            asof_join(df, df.select("k", "ts"), "k", "k", "ts", "ts", [],
                      tie_col="nope")


class TestAsofForward:
    def test_forward_basic(self, spark):
        got = _join(
            spark,
            [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")],
            [(1, 12, 200.0, 2), (1, 25, 300.0, 3), (2, 5, 100.0, 1)],
            direction="forward",
        )
        assert got[(1, 10)] == (200.0, 2)    # earliest at-or-after 10 is 12
        assert got[(1, 20)] == (300.0, 3)
        assert got[(2, 15)] == (None, None)  # only earlier right rows

    def test_forward_exact_and_strict(self, spark):
        left = [(1, 10, "a")]
        right = [(1, 10, 50.0, 1), (1, 30, 60.0, 2)]
        assert _join(spark, left, right, direction="forward")[(1, 10)] == (50.0, 1)
        assert _join(spark, left, right, direction="forward",
                     strict=True)[(1, 10)] == (60.0, 2)

    def test_forward_null_ts_left_matches_nothing(self, spark):
        """desc sort defaults to NULLS LAST, which would hand a NULL-ts
        left row the whole right history — pinned to match nothing."""
        left = spark.createDataFrame([(1, None, "nullts")],
                                     "k long, ts long, lbl string")
        right = spark.createDataFrame([(1, 5, 9.0, 1)],
                                      "k long, ts long, v double, rid long")
        row = asof_join(left, right, "k", "k", "ts", "ts", ["v"],
                        tie_col="rid", direction="forward").collect()[0]
        assert row["v"] is None

    def test_forward_matches_pandas_merge_asof(self, spark):
        rng = np.random.default_rng(11)
        lpd = pd.DataFrame({
            "k": rng.integers(0, 10, 300),
            "ts": rng.choice(np.arange(0, 9_000, 3), 300, replace=False).astype("int64"),
        })
        rpd = pd.DataFrame({
            "k": rng.integers(0, 10, 250),
            "ts": rng.choice(np.arange(1, 9_000, 7), 250, replace=False).astype("int64"),
            "v": rng.normal(size=250).round(6),
        }).drop_duplicates(["k", "ts"])
        rpd["rid"] = np.arange(len(rpd))
        exp = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"),
            on="ts", by="k", direction="forward",
        ).sort_values(["k", "ts"]).reset_index(drop=True)
        got = (
            asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                      "k", "k", "ts", "ts", ["v", "rid"], tie_col="rid",
                      direction="forward")
            .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "ts", "v", "rid"]], exp[["k", "ts", "v", "rid"]],
            check_dtype=False,
        )

    def test_bad_direction_raises(self, spark):
        df = spark.createDataFrame([(1, 2, 3.0)], "k long, ts long, v double")
        with pytest.raises(ValueError, match="direction"):
            asof_join(df, df.select("k", "ts"), "k", "k", "ts", "ts", [],
                      direction="nearest")


class TestAsofProperty:
    def test_random_inputs_with_ties_match_reference(self, spark):
        """Property check vs a brute-force reference that handles what
        merge_asof leaves ambiguous: duplicate right timestamps per key
        (max-tie_col wins) and duplicate left rows."""
        rng = np.random.default_rng(99)
        for trial in range(3):
            lpd = pd.DataFrame({
                "k": rng.integers(0, 5, 120),
                "ts": rng.integers(0, 80, 120),   # dense -> many exact ties
            })
            rpd = pd.DataFrame({
                "k": rng.integers(0, 5, 90),
                "ts": rng.integers(0, 80, 90),
                "v": rng.normal(size=90).round(4),
                "rid": np.arange(90),
            })

            def ref_row(lk, lt):
                cand = rpd[(rpd["k"] == lk) & (rpd["ts"] <= lt)]
                if cand.empty:
                    return (None, None)
                best = cand.sort_values(["ts", "rid"]).iloc[-1]
                return (best["v"], best["rid"])

            exp = {
                (r.k, r.ts): ref_row(r.k, r.ts)
                for r in lpd.drop_duplicates(["k", "ts"]).itertuples()
            }
            got_rows = asof_join(
                spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                "k", "k", "ts", "ts", ["v", "rid"], tie_col="rid",
            ).collect()
            assert len(got_rows) == len(lpd)  # duplicates preserved
            for r in got_rows:
                ev, er = exp[(r["k"], r["ts"])]
                assert (r["v"], r["rid"]) == (ev, er), (trial, r)


class TestAsofBucketed:
    """bucket= must be a pure plan change: identical results to the
    plain path for any bucket size, while the fill window partitions by
    (key, bucket) so one hot key spreads across its time buckets."""

    def _both(self, spark, left, right, bucket, **kw):
        plain = _join(spark, left, right, **kw)
        buck = _join(spark, left, right, bucket=bucket, **kw)
        assert buck == plain, (bucket, kw)

    def test_equivalence_matrix(self, spark):
        rng = np.random.default_rng(11)
        left = [(int(k), int(t), "x")
                for k, t in zip(rng.integers(0, 4, 120), rng.integers(0, 500, 120))]
        right = [(int(k), int(t), float(v), int(i))
                 for i, (k, t, v) in enumerate(
                     zip(rng.integers(0, 4, 80), rng.integers(0, 500, 80),
                         rng.normal(size=80).round(3)))]
        for bucket in (7, 50, "100 seconds", 10_000):  # incl. one-bucket case
            for direction in ("backward", "forward"):
                for strict in (False, True):
                    self._both(spark, left, right, bucket,
                               direction=direction, strict=strict)

    def test_cross_bucket_carry(self, spark):
        # right row in bucket 0 must serve a left row in bucket 3 with
        # empty buckets 1-2 in between (carry over bucket gaps)
        got = _join(spark, [(1, 35, "a")], [(1, 2, 9.0, 1)], bucket=10)
        assert got[(1, 35)] == (9.0, 1)

    def test_same_ts_strictness_across_boundary(self, spark):
        # equal timestamps always share a bucket, so strict semantics
        # survive bucketing even AT a bucket boundary ts
        left = [(1, 10, "a")]
        right = [(1, 10, 5.0, 1), (1, 3, 4.0, 2)]
        assert _join(spark, left, right, bucket=10)[(1, 10)] == (5.0, 1)
        assert _join(spark, left, right, bucket=10, strict=True)[(1, 10)] == (4.0, 2)

    def test_nulls_and_ties_match_plain(self, spark):
        left = spark.createDataFrame(
            [(None, 10, "nullkey"), (1, None, "nullts"), (1, 10, "ok")],
            "k long, ts long, lbl string")
        right = spark.createDataFrame(
            [(1, 7, 1.0, 11), (1, 7, 2.0, 99), (1, 4, 9.0, 3)],
            "k long, ts long, v double, rid long")
        for bucket in (5, 1000):
            out = {r["lbl"]: (r["v"], r["rid"]) for r in asof_join(
                left, right, "k", "k", "ts", "ts", ["v", "rid"],
                tie_col="rid", bucket=bucket).collect()}
            assert out == {"nullkey": (None, None), "nullts": (None, None),
                           "ok": (2.0, 99)}

    def test_timestamp_type_buckets(self, spark):
        left = spark.createDataFrame(
            [(1, "2024-01-03 00:00:05", "a")],
            "k long, ts string, lbl string").withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00", 7.0, 1)],
            "k long, ts string, v double, rid long").withColumn("ts", F.col("ts").cast("timestamp"))
        row = asof_join(left, right, "k", "k", "ts", "ts", ["v"],
                        tie_col="rid", bucket="1 day").collect()[0]
        assert row["v"] == 7.0

    def test_hot_key_parallelizes(self, spark):
        """ONE key, many buckets: the fill window's partition spec must
        include the bucket column (that is what lets >1 task touch the
        hot key), and the carry window must stay tiny (per-bucket)."""
        import re
        from tests.test_plans import plan_of

        left = spark.range(2000).select(
            F.lit(7).alias("k"), F.col("id").alias("ts"), F.lit("x").alias("lbl"))
        right = spark.range(500).select(
            F.lit(7).alias("k"), (F.col("id") * 4).alias("ts"),
            F.col("id").cast("double").alias("v"))
        out = asof_join(left, right, "k", "k", "ts", "ts", ["v"], bucket=100)
        plan = plan_of(out)
        assert re.search(r"windowspecdefinition\(_asof_key\S*, _asof_bkt", plan), plan
        # and the data actually spans many buckets for this hot key
        n_parts = out.selectExpr("count(distinct floor(ts / 100)) AS c").collect()[0][0]
        assert n_parts == 20
        # correctness spot: last left row sees right ts<=1999 -> 499*4=1996
        last = {r["ts"]: r["v"] for r in out.collect()}
        assert last[1999] == 499.0 and last[3] == 0.0

    def test_bad_bucket_rejected(self, spark):
        df = spark.createDataFrame([(1, 2, "x")], "k long, ts long, lbl string")
        r = spark.createDataFrame([(1, 2, 3.0)], "k long, ts long, v double")
        for bad in (0, -5, "soon", "1 fortnight"):
            with pytest.raises(ValueError):
                asof_join(df, r, "k", "k", "ts", "ts", ["v"], bucket=bad)
