"""Span-level dedup tests: first-occurrence-wins semantics, ordered
reassembly, full-duplicate disappearance, intra-document repeats, and
the no-per-span-window plan shape."""

import pytest
from pyspark.sql import functions as F

from redeye_spark.operators.spans import segmentize, span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestSegmentize:
    def test_slices_and_tail(self, spark):
        df = _docs(spark, [(1, "a b c d e f g")])
        segs = sorted(
            segmentize(df, "text", "doc_id", span_words=3).collect(),
            key=lambda r: r["seg_idx"],
        )
        assert [(r["seg_idx"], r["seg"]) for r in segs] == [
            (0, "a b c"), (1, "d e f"), (2, "g")]


class TestSpanDedup:
    def test_first_occurrence_wins_across_docs(self, spark):
        df = _docs(spark, [
            (1, "x y z p q r"),          # spans: "x y z", "p q r"
            (2, "p q r a b c"),          # "p q r" seen in doc 1 -> dropped
        ])
        out = {r["doc_id"]: r for r in
               span_dedup(df, "text", "doc_id", span_words=3).collect()}
        assert out[1]["clean_text"] == "x y z p q r"
        assert out[1]["n_dropped"] == 0
        assert out[2]["clean_text"] == "a b c"
        assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)

    def test_fully_duplicated_doc_disappears(self, spark):
        df = _docs(spark, [(1, "x y z"), (2, "x y z")])
        out = span_dedup(df, "text", "doc_id", span_words=3).collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_intra_doc_repeat_deduped(self, spark):
        df = _docs(spark, [(1, "a b c a b c d e f")])
        out = span_dedup(df, "text", "doc_id", span_words=3).collect()[0]
        assert out["clean_text"] == "a b c d e f"
        assert (out["n_kept"], out["n_dropped"]) == (2, 1)

    def test_reassembly_preserves_order(self, spark):
        # doc 2's middle span is dropped; remaining spans keep order
        df = _docs(spark, [
            (1, "m m m"),
            (2, "a a a m m m z z z"),
        ])
        out = {r["doc_id"]: r["clean_text"] for r in
               span_dedup(df, "text", "doc_id", span_words=3).collect()}
        assert out[2] == "a a a z z z"

    def test_tie_break_is_doc_then_index(self, spark):
        # same span twice in doc 1 AND in doc 0: doc 0's FIRST copy wins
        df = _docs(spark, [
            (0, "k k k k k k"),
            (1, "k k k"),
        ])
        out = {r["doc_id"]: r for r in
               span_dedup(df, "text", "doc_id", span_words=3).collect()}
        assert set(out) == {0}
        assert out[0]["clean_text"] == "k k k"

    def test_plan_has_no_window(self, spark):
        """The keeper is a partial-aggregatable min, never a per-span
        window — a degenerate hot span must not serialize onto one
        task."""
        df = _docs(spark, [(1, "a b c"), (2, "a b c")])
        out = span_dedup(df, "text", "doc_id", span_words=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "HashAggregate" in plan
