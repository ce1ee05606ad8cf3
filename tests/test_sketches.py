"""HLL distinct-sketch tests: accuracy band vs exact, merge-equals-
whole (the property that makes incremental refresh correct), and
determinism across partitionings."""

from pyspark.sql import functions as F

from redeye_spark.operators.sketches import (
    distinct_estimate, distinct_sketches, merge_sketches,
)


def _events(spark, n=20000):
    return spark.range(n).select(
        (F.col("id") % 7).alias("g"),
        F.concat(F.lit("u"), (F.col("id") * 2654435761 % 3000)).alias("v"),
    )


class TestHllSketches:
    def test_estimate_within_error_band(self, spark):
        df = _events(spark)
        exact = {r["g"]: r["n"] for r in
                 df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
        est = {r["g"]: r["n_distinct"] for r in
               distinct_estimate(df, "v", ["g"]).collect()}
        for g, n in exact.items():
            assert abs(est[g] - n) <= max(3, 0.05 * n), (g, n, est[g])

    def test_merged_chunks_match_whole_within_band(self, spark):
        """The incremental-refresh contract: sketch per chunk, union of
        chunk sketches estimates the same cardinality as sketching the
        whole. NOT bit-for-bit — DataSketches HLL unions transition
        sparse->dense at merge-order-dependent points, so the estimate
        may move by a fraction of a percent; the band pins that drift."""
        df = _events(spark)
        whole = {r["g"]: r["n_distinct"] for r in
                 distinct_estimate(df, "v", ["g"]).collect()}
        chunks = [
            distinct_sketches(df.filter(F.col("id") % 3 == i), "v", ["g"])
            for i in range(3)
        ]
        all_sketches = chunks[0].unionByName(chunks[1]).unionByName(chunks[2])
        merged = {r["g"]: r["n_distinct"] for r in
                  merge_sketches(all_sketches, ["g"]).collect()}
        for g, n in whole.items():
            assert abs(merged[g] - n) <= max(3, 0.02 * n), (g, n, merged[g])

    def test_partitioning_drift_bounded(self, spark):
        df = _events(spark)
        a = {r["g"]: r["n_distinct"] for r in
             distinct_estimate(df.repartition(32), "v", ["g"]).collect()}
        b = {r["g"]: r["n_distinct"] for r in
             distinct_estimate(df.coalesce(1), "v", ["g"]).collect()}
        for g, n in b.items():
            assert abs(a[g] - n) <= max(3, 0.02 * n), (g, n, a[g])

    def test_global_ungrouped(self, spark):
        df = _events(spark)
        est = distinct_estimate(df, "v").collect()[0]["n_distinct"]
        exact = df.select("v").distinct().count()
        assert abs(est - exact) <= 0.05 * exact


class TestBitmapDistinct:
    """Exact bitmap path: partials+merge must EQUAL count(DISTINCT),
    not approximate it, for any chunking and partitioning."""

    def _ints(self, spark, n=50000):
        # ids span many 32768-bit buckets; 7 groups, ~3000 distinct values
        return spark.range(n).select(
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 2654435761 % 3000 * 97 + 1).alias("v"),
            (F.col("id") % 5).alias("chunk"),
        )

    def test_one_shot_equals_exact(self, spark):
        from redeye_spark.operators.sketches import bitmap_distinct

        df = self._ints(spark)
        exact = {r["g"]: r["n"] for r in
                 df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
        got = {r["g"]: r["n_distinct"] for r in
               bitmap_distinct(df, "v", ["g"]).collect()}
        assert got == exact

    def test_chunked_partials_merge_equals_whole(self, spark):
        from redeye_spark.operators.sketches import (
            bitmap_distinct, bitmap_distinct_partials, bitmap_merge_distinct,
        )

        df = self._ints(spark)
        partials = bitmap_distinct_partials(df, "v", ["g"], chunk_col="chunk")
        # the persisted-partials round trip: chunk column present, merge drops it
        assert set(partials.columns) == {"g", "chunk", "_bucket", "bitmap"}
        merged = {r["g"]: r["n_distinct"] for r in
                  bitmap_merge_distinct(partials, ["g"]).collect()}
        whole = {r["g"]: r["n_distinct"] for r in
                 bitmap_distinct(df, "v", ["g"]).collect()}
        assert merged == whole

    def test_partitioning_invariance(self, spark):
        from redeye_spark.operators.sketches import bitmap_distinct

        df = self._ints(spark)
        a = sorted(bitmap_distinct(df.repartition(1), "v", ["g"]).collect())
        b = sorted(bitmap_distinct(df.repartition(37, "v"), "v", ["g"]).collect())
        assert a == b

    def test_ungrouped(self, spark):
        from redeye_spark.operators.sketches import bitmap_distinct

        df = self._ints(spark)
        n = bitmap_distinct(df, "v").collect()[0]["n_distinct"]
        assert n == df.select("v").distinct().count()


class TestQuantileHistogram:
    def _vals(self, spark, vals):
        from pyspark.sql import functions as F

        return spark.createDataFrame([(int(v),) for v in vals], "v long")

    def test_cells_exact_counts(self, spark):
        from pyspark.sql import functions as F

        from redeye_spark.operators.sketches import hist_cells

        df = self._vals(spark, [0, 1, 9, 10, 19, 20, -1, -10])
        cells = {r["bin"]: r["cnt"] for r in
                 hist_cells(df, F.col("v"), 10).collect()}
        # floor division: -1 and -10 land in bin -1 (floor, not trunc)
        assert cells == {0: 3, 1: 2, 2: 1, -1: 2}

    def test_merge_equals_whole(self, spark):
        from pyspark.sql import functions as F

        from redeye_spark.operators.sketches import hist_cells, hist_merge

        import random
        rng = random.Random(7)
        vals = [rng.randrange(-500, 5000) for _ in range(4000)]
        df = self._vals(spark, vals)
        whole = sorted(hist_cells(df, F.col("v"), 100).collect())
        a = hist_cells(df.filter(F.col("v") % 2 == 0), F.col("v"), 100)
        b = hist_cells(df.filter(F.col("v") % 2 != 0), F.col("v"), 100)
        assert sorted(hist_merge(a, b).collect()) == whole

    def test_quantiles_match_exact_lower_quantile(self, spark):
        import math

        from pyspark.sql import functions as F

        from redeye_spark.operators.sketches import hist_cells, hist_quantiles

        import random
        rng = random.Random(13)
        vals = sorted(rng.randrange(0, 10000) for _ in range(5003))
        df = self._vals(spark, vals)
        width = 250
        cells = hist_cells(df, F.col("v"), width)
        out = {r["q"]: r for r in hist_quantiles(cells, width, (0.5, 0.9, 0.99)).collect()}
        n = len(vals)
        for q in (0.5, 0.9, 0.99):
            exact = vals[math.ceil(q * n) - 1]  # lower quantile, 1-based rank
            r = out[q]
            assert r["lo"] <= exact <= r["hi"], (q, exact, r)
            assert r["bin"] == exact // width
            assert r["est"] == (r["lo"] + r["hi"]) / 2.0

    def test_quantile_window_runs_on_cells_not_corpus(self, spark):
        """The plan's Window input must be the aggregated cells frame:
        its Sort/Window appear ABOVE the HashAggregate, so window state
        is bins-sized at any corpus size."""
        from pyspark.sql import functions as F

        from redeye_spark.operators.sketches import hist_cells, hist_quantiles

        df = self._vals(spark, range(1000))
        plan = hist_quantiles(hist_cells(df, F.col("v"), 50), 50)._sc._jvm \
            .PythonSQLUtils.explainString(
                hist_quantiles(hist_cells(df, F.col("v"), 50), 50)
                ._jdf.queryExecution(), "simple")
        cells_agg = plan.rfind("HashAggregate")  # the bin-cells aggregate
        win_pos = plan.find("Window")
        assert win_pos != -1 and cells_agg != -1
        # upper operators print first: the Window consumes the cells
        # AGGREGATE's output (prints above it), not the raw value scan
        assert win_pos < cells_agg, plan
