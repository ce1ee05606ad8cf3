"""Tests for the snapshot-diff operator and Z-order interleaving."""

import duckdb
import pytest
from pyspark.sql import functions as F

from redeye_spark.functions.zorder import with_zorder, zorder_sql, zorder_value
from redeye_spark.operators.diff import snapshot_diff


class TestSnapshotDiff:
    def test_insert_delete_update_detected(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long")
        new = spark.createDataFrame(
            [(2, "b", 20), (3, "c", 31), (4, "d", 40)], "k long, s string, v long")
        got = {(r["k"], r["change"]) for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {(1, "delete"), (3, "update"), (4, "insert")}

    def test_null_transitions_detected(self, spark):
        """xxhash64 skips NULL inputs; without per-column null flags,
        swapping a value between two columns through NULL would hash
        identically and the update would vanish."""
        old = spark.createDataFrame([(1, "x", None), (2, None, None)],
                                    "k long, a string, b string")
        new = spark.createDataFrame([(1, None, "x"), (2, None, None)],
                                    "k long, a string, b string")
        got = {(r["k"], r["change"]) for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {(1, "update")}  # key 2 unchanged, key 1 NULL-swap caught

    def test_schema_evolution_ignores_new_columns(self, spark):
        old = spark.createDataFrame([(1, 10)], "k long, v long")
        new = spark.createDataFrame([(1, 10, "extra")], "k long, v long, note string")
        assert snapshot_diff(old, new, ["k"]).count() == 0

    def test_duplicate_and_null_keys_refused(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        old = spark.createDataFrame([(1, 10), (1, 11)], "k long, v long")
        new = spark.createDataFrame([(1, 10)], "k long, v long")
        with pytest.raises(ValueError, match="duplicate keys"):
            snapshot_diff(old, new, ["k"]).collect()
        # NULL keys raise at RUNTIME on every path — including
        # check_unique=False, where the r5 review found the refusal was
        # silently disabled (NULL keys never equi-join: an unchanged
        # NULL-keyed row would diff as a spurious insert+delete pair)
        old2 = spark.createDataFrame([(None, 10)], "k string, v long")
        with pytest.raises((PySparkException, Py4JJavaError),
                           match="NULL key"):
            snapshot_diff(old2, old2, ["k"], check_unique=False).collect()

    def test_compare_cols_subset(self, spark):
        old = spark.createDataFrame([(1, 10, "meta1")], "k long, v long, m string")
        new = spark.createDataFrame([(1, 10, "meta2")], "k long, v long, m string")
        assert snapshot_diff(old, new, ["k"], compare_cols=["v"]).count() == 0
        assert snapshot_diff(old, new, ["k"]).count() == 1


def _py_morton(vals, bits):
    z = 0
    n = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


class TestZorder:
    def test_matches_python_reference(self, spark):
        rows = [(x, y) for x in (0, 1, 5, 1023) for y in (0, 2, 7, 1023)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {(r["x"], r["y"]): r["_z"]
               for r in with_zorder(df, ["x", "y"], bits=10).collect()}
        for (x, y), z in got.items():
            assert z == _py_morton([x, y], 10), (x, y)

    def test_sql_twin_agrees(self, spark):
        df = spark.createDataFrame([(i * 37 % 1024, i * 91 % 1024)
                                    for i in range(200)], "x long, y long")
        spark_z = sorted(r["_z"] for r in with_zorder(df, ["x", "y"], bits=10).collect())
        con = duckdb.connect()
        con.sql("CREATE TABLE t AS SELECT (range * 37) % 1024 AS x,"
                " (range * 91) % 1024 AS y FROM range(200)")
        duck_z = sorted(r[0] for r in con.sql(
            f"SELECT {zorder_sql(['x', 'y'], 10)} FROM t").fetchall())
        assert spark_z == duck_z

    def test_zorder_locality_both_dims(self, spark):
        """The quadtree property parquet footer skipping exploits after
        compact_table(cluster_by=['_z']): every ALIGNED z-prefix group
        (here z >> 8, i.e. the top bits) is exactly one 16x16 tile of
        the 64x64 grid — bounded range in BOTH dimensions
        simultaneously, which no single-column sort achieves."""
        n = 1 << 12
        df = spark.range(n).select(
            (F.col("id") * 2654435761 % 64).alias("x"),
            (F.col("id") * 40503 % 64).alias("y"),
        )
        rows = with_zorder(df, ["x", "y"], bits=6).collect()
        tiles: dict[int, list] = {}
        for r in rows:
            tiles.setdefault(r["_z"] >> 8, []).append((r["x"], r["y"]))
        assert len(tiles) > 1
        for tid, pts in tiles.items():
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            assert max(xs) - min(xs) <= 15, tid
            assert max(ys) - min(ys) <= 15, tid

    def test_bits_validation(self, spark):
        with pytest.raises(ValueError, match="fit a signed long"):
            zorder_value(["a", "b", "c", "d"], bits=16)


class TestTextRound5:
    def test_normalize_text(self, spark):
        from redeye_spark.operators.text import normalize_text

        df = spark.createDataFrame(
            [("Hello,   WORLD!!",), ("hello world",), (None,)], "t string")
        got = [r["n"] for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
        assert got == ["hello world", "hello world", ""]

    def test_repetition_metrics(self, spark):
        from redeye_spark.operators.text import repetition_metrics

        df = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "all words unique here"), (3, "x"), (4, "")],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_bigrams"], r["dup_bigram_ratio"])
               for r in repetition_metrics(df).collect()}
        # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> 5 total, 2 distinct
        assert got[1] == (5, round((5 - 2) / 5, 4))
        assert got[2] == (3, 0.0)
        assert got[3] == (0, None)
        assert got[4] == (0, None)
