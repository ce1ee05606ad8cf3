"""Physical-plan quality gates: assert the optimizations the 100 TB
design depends on are actually in the plan, so refactors can't silently
regress them (.explain-driven, no data execution)."""

import re

import pytest
from pyspark.sql import functions as F

from redeye_spark.functions.logparse import FORMAT_COMBINED
from redeye_spark.operators import aggregate as agg_op
from redeye_spark.operators import enrich as enrich_op
from redeye_spark.operators import parse_op, route as route_op
from redeye_spark.plans.pipeline import PipelineConfig, build_tagged
from redeye_spark.schema import RAW_SEQUENCES
from redeye_spark.sources.datagen import gen_frame
from redeye_spark.sources.io import ParquetIO


@pytest.fixture(scope="module")
def raw_path(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("plans"))
    pdf = gen_frame(500, fmt=FORMAT_COMBINED, seed=5)
    spark.createDataFrame(pdf.drop(columns=["line"]), schema=RAW_SEQUENCES) \
        .write.mode("overwrite").parquet(base + "/raw")
    return base


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_pipeline_static_enrich_is_join_free(spark, raw_path):
    """The static dims (status class, ua family) are deterministic
    functions of the row — the pipeline computes them as codegen
    expressions (enrich_expr), so the tagged plan must carry NO join at
    all; only a genuinely tabular source_dim may add one (broadcast)."""
    from redeye_spark.sources.datagen import source_meta_frame

    raw = spark.read.parquet(raw_path + "/raw")
    tagged = build_tagged(spark, raw, PipelineConfig(fmt=FORMAT_COMBINED))
    plan = plan_of(tagged)
    assert "Join" not in plan, plan
    assert "status_class" in plan and "ua_family" in plan, plan
    # with a real dim table, exactly one broadcast join, never a shuffle
    src = spark.createDataFrame(source_meta_frame())
    tagged2 = build_tagged(spark, raw, PipelineConfig(fmt=FORMAT_COMBINED), src)
    plan2 = plan_of(tagged2)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan2)) == 1, plan2
    assert "SortMergeJoin" not in plan2, "enrichment must never shuffle the fact stream"


def test_enrich_expr_matches_join_path(spark, raw_path):
    """Value-identity of the expression enrich with the broadcast-join
    enrich on parsed rows (incl. NULL status/ua, out-of-range status)."""
    from redeye_spark.operators import enrich as enrich_op

    raw = spark.read.parquet(raw_path + "/raw")
    parsed = parse_op.parse_sequences(raw, fmt=FORMAT_COMBINED, carry_tokens=False)
    cols = ["doc_id", "status_class", "ua_family"]
    a = (
        enrich_op.enrich(
            parsed, enrich_op.dim_status_class(spark), enrich_op.dim_ua_family(spark)
        )
        .select(*cols).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        enrich_op.enrich_expr(parsed)
        .select(*cols).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_parse_has_no_shuffle_without_repartition(spark, raw_path):
    raw = spark.read.parquet(raw_path + "/raw")
    parsed = parse_op.parse_sequences(raw, fmt=FORMAT_COMBINED, carry_tokens=False)
    plan = plan_of(parsed)
    assert "Exchange" not in plan, plan  # scan splits feed the UDF directly


def test_parse_explicit_repartition_is_roundrobin(spark, raw_path):
    raw = spark.read.parquet(raw_path + "/raw")
    parsed = parse_op.parse_sequences(raw, fmt=FORMAT_COMBINED, num_partitions=8)
    plan = plan_of(parsed)
    assert "RoundRobinPartitioning" in plan, plan  # never keyed by skewed source


def test_agg_on_sink_prunes_columns_and_partitions(spark, raw_path):
    raw = spark.read.parquet(raw_path + "/raw")
    tagged = build_tagged(spark, raw, PipelineConfig(fmt=FORMAT_COMBINED))
    io = ParquetIO(raw_path + "/out")
    io.write(tagged, "events", partition_by=["sink"])

    ev = io.read(spark, "events")
    counts = agg_op.sink_counts(ev)
    plan = plan_of(counts)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # count needs exactly these data columns (sink is a partition col)
    assert read_cols <= {"timestamp", "status_class", "method", "source"}, read_cols
    assert "message" not in read_cols and "tokens" not in read_cols

    pruned = ev.filter(F.col("sink") == "sink_2xx").select("doc_id")
    plan2 = plan_of(pruned)
    assert re.search(r"PartitionFilters: \[[^\]]*sink", plan2), plan2


def test_filter_pushdown_reaches_scan(spark, raw_path):
    raw = spark.read.parquet(raw_path + "/raw").filter(F.col("source") == "web-hot")
    plan = plan_of(raw)
    assert re.search(r"PushedFilters: \[[^\]]*(IsNotNull|EqualTo)\(source", plan), plan


def test_salted_agg_is_two_phase(spark, raw_path):
    raw = spark.read.parquet(raw_path + "/raw")
    tagged = build_tagged(spark, raw, PipelineConfig(fmt=FORMAT_COMBINED))
    salted = agg_op.salted_counts(tagged, salt_buckets=8)
    plan = plan_of(salted)
    # partial+final for phase 1 (salted keys) and phase 2 (real keys):
    # at least 3 HashAggregate nodes and an exchange between phases
    assert plan.count("HashAggregate") >= 3, plan
    assert "xxhash64" in plan, plan  # salt derivation present


def test_route_tag_is_pure_projection(spark, raw_path):
    raw = spark.read.parquet(raw_path + "/raw")
    tagged = build_tagged(spark, raw, PipelineConfig(fmt=FORMAT_COMBINED))
    plan = plan_of(tagged)
    # tagging must add no SHUFFLE (broadcast exchanges for dims are fine)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_minhash_shuffles_signatures_not_text(spark, raw_path):
    """The LSH band join must shuffle (id, band, signature) — the raw
    text column must not appear below any Exchange."""
    from redeye_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "text " * 50) for i in range(10)], ["doc_id", "text"]
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    plan = plan_of(pairs)
    exchanges = plan.split("Exchange")
    assert len(exchanges) > 1
    # 'text' never crosses an exchange: inspect hashpartitioning args
    for frag in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in frag, frag


def test_cosine_lsh_shuffles_bands_not_vectors(spark):
    """The hyperplane band join must shuffle (id, band_idx, band_val)
    only — the embedding column must never appear in a band-bucket
    exchange (it re-enters solely through the candidate id joins, where
    AQE broadcasts the small candidate side at runtime)."""
    from redeye_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    pairs = dedup.cosine_lsh_pairs(df, threshold=0.9)
    plan = plan_of(pairs)
    # formatted plans carry partitioning in 'Arguments: hashpartitioning(...)'
    frags = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    band_frags = [f for f in frags if "band" in f]
    assert band_frags, plan
    for f in band_frags:
        assert "embedding" not in f, f
    # the self-join's two signature subtrees dedupe at runtime
    # (ReusedExchange under AQE) — signatures are computed once.


def test_top_orders_is_take_ordered_not_full_sort(spark):
    """Global sort+limit must plan as TakeOrderedAndProject (local top-k
    per partition + tiny driver merge), never a full global Sort."""
    from redeye_spark import entry_queries as EQ

    df = EQ.q_top_orders(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_dedup_filter_anti_join_broadcasts_drop_list(spark):
    """The near-dup drop list is tiny vs. the corpus: at runtime AQE must
    broadcast it so the corpus scan side never shuffles."""
    from pyspark.sql import functions as F
    from redeye_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, ("dup " * 30) if i < 10 else f"unique text number {i} " * 10)
         for i in range(200)],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    kept = dedup.drop_near_duplicates(docs, pairs)
    kept.collect()
    executed = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed and "LeftAnti" in executed, executed


def test_fact_fact_join_is_sort_merge(spark):
    """lineitem JOIN orders (both fact-sized at scale) must plan as a
    shuffle SortMergeJoin semi-join — never a broadcast (the dim-join
    gate above asserts the OPPOSITE for enrichment joins; this is the
    other join shape a 100 TB user hits daily)."""
    from redeye_spark import entry_queries as EQ

    df = EQ.q_order_priority_counts(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "SortMergeJoin" in plan and "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # both sides exchange on the join key (the co-partitioning SMJ needs)
    assert len(re.findall(r"hashpartitioning\((?:o_orderkey|l_orderkey)", plan)) >= 2, plan


def test_aqe_splits_skewed_shuffle_join(spark):
    """AQE skew-join smoke: a sort-merge join with one pathological hot
    key must be split at runtime (executed plan shows skew=true) and
    still return exact results. This is the runtime half of the skew
    story — the write-side half (salted aggregation) is gated above."""
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        pad = "x" * 64
        left = spark.range(0, 30_000).select(
            F.when(F.col("id") < 27_000, F.lit(0)).otherwise(F.col("id") - 26_999).alias("k"),
            F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 4_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.hint("merge").join(right.hint("merge"), "k")
        got = joined.collect()  # executes THIS plan (so its final adaptive
        # plan is inspectable below); ~2 MB at the driver, test-only
        from collections import Counter

        by_key = Counter(r["k"] for r in got)
        # exactness under the split: hot key 0 has 27k rows, others 1 each
        assert by_key[0] == 27_000 and by_key[1] == 1, by_key.most_common(3)
        assert len(got) == 30_000
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Bucketing is the 100 TB shuffle-reuse story: two fact tables
    bucketed by the join key co-locate, so the join plans with NO
    Exchange on either side (scan -> sort -> merge). Gates that the
    engine is configured to exploit it (bucketing enabled, bucket scan
    not disabled by AQE) and that the layout actually removes both
    exchanges that test_fact_fact_join_is_sort_merge shows for the
    unbucketed layout."""
    wh = str(tmp_path_factory.mktemp("warehouse"))  # external-table paths
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for name, df, key in [("b_orders", orders, "o_orderkey"), ("b_lineitem", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.mode("overwrite").bucketBy(8, key).sortBy(key)
         .option("path", f"{wh}/{name}").saveAsTable(name))
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.hint("merge").join(bl, F.col("o_orderkey") == F.col("l_orderkey"))
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "Bucketed: true" in plan, plan
        # and it computes the same thing as the shuffled layout
        n_bucketed = joined.count()
        n_plain = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert n_bucketed == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval gram set must broadcast: the 10^12-row train corpus
    streams through a map-side LeftSemi with ZERO exchanges."""
    from redeye_spark import entry_queries as EQ

    p = plan_of(EQ.q_decontaminate(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    assert "Exchange hashpartitioning" not in p, p


def test_decontaminate_falls_back_to_shuffle_join_when_eval_huge(spark):
    """Past max_broadcast_grams the build side no longer fits an
    executor, so the semi-join must degrade to a shuffle SMJ instead of
    OOMing the broadcast — and both paths must agree row-for-row."""
    from redeye_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    ev = docs.limit(40).select((F.col("doc_id") + 10_000).alias("doc_id"), "text")

    small = dedup.contaminated_ids(docs, ev, n=5)  # default: broadcast
    forced = dedup.contaminated_ids(docs, ev, n=5, max_broadcast_grams=10)
    pf = plan_of(forced)
    assert "SortMergeJoin" in pf and "LeftSemi" in pf, pf
    assert "BroadcastHashJoin" not in pf, pf
    a = sorted(r["doc_id"] for r in small.collect())
    b = sorted(r["doc_id"] for r in forced.collect())
    assert a == b and len(a) > 0


def test_split_and_sample_are_shuffle_free_projections(spark):
    """Deterministic split/sample must stay a codegen projection/filter —
    any Exchange here would mean the assignment reshuffles the corpus."""
    from redeye_spark import entry_queries as EQ

    for q in (EQ.q_train_val_split, EQ.q_stratified_sample):
        p = plan_of(q(spark, "/root/testdata/sf0.001"))
        assert "Exchange" not in p, p


def test_range_enrich_is_broadcast_nested_loop(spark):
    """A non-equi band join must broadcast the dim: without the hint it
    degenerates to a cartesian shuffle of the fact stream."""
    from redeye_spark import entry_queries as EQ

    p = plan_of(EQ.q_value_band_counts(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_regional_revenue_mixed_join_strategy(spark):
    """TPC-H Q5 shape: exactly one sort-merge edge (the fact x fact
    lineitem-orders join) and every dimension edge broadcast."""
    from redeye_spark import entry_queries as EQ

    p = plan_of(EQ.q_regional_revenue(spark, "/root/testdata/sf0.001"))
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 1, p
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 3, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_chunk_tokens_is_shuffle_free(spark):
    """Context-window chunking is scan-shaped: explode + slice with no
    Exchange — amplification must not cross a shuffle."""
    from redeye_spark import entry_queries as EQ

    p = plan_of(EQ.q_chunk_tokens(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in p, p
    assert "Generate" in p, p  # the explode


def test_hopping_counts_partial_aggregates_before_shuffle(spark):
    """The 2x window replication must be absorbed by the map-side
    partial aggregate: plan shows partial then final HashAggregate with
    one exchange between them."""
    from redeye_spark import entry_queries as EQ

    p = plan_of(EQ.q_hopping_counts(spark, "/root/testdata/sf0.001"))
    assert p.count("HashAggregate") >= 2, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


class TestSaltedJoin:
    def test_equivalence_and_hot_key_spread(self, spark):
        """salted_join must return exactly the plain join's rows (incl.
        duplicate multiplicities) while its shuffle keys include the
        salt column, spreading one hot key over `salt` reducers."""
        from redeye_spark.operators.enrich import salted_join

        left = spark.range(5000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 'hot' ELSE CAST(id % 7 AS STRING) END AS k",
            "id AS lv")
        right = spark.range(40).selectExpr(
            "CASE WHEN id % 4 = 0 THEN 'hot' ELSE CAST(id % 7 AS STRING) END AS k",
            "id AS rv")
        import pandas as pd

        for l in (left, left.select("k")):  # incl. byte-identical dup rows
            for how in ("inner", "left", "left_semi", "left_anti"):
                for spread in (False, True):
                    a = l.join(right, "k", how).toPandas()
                    b = salted_join(l, right, "k", how=how, salt=6,
                                    spread_duplicates=spread).toPandas()
                    cols = list(a.columns)
                    a = a.sort_values(cols).reset_index(drop=True)
                    b = b[cols].sort_values(cols).reset_index(drop=True)
                    pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # the shuffle-spread claim needs a shuffle join: disable the
        # auto-broadcast (a broadcast join has no exchange to salt)
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            p = plan_of(salted_join(left, right, "k", salt=6))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        assert "_salt" in p and "hashpartitioning(k" in p, p

    def test_salted_join_rejects_right_joins_and_collisions(self, spark):
        from redeye_spark.operators.enrich import salted_join

        df = spark.range(3).selectExpr("CAST(id AS STRING) AS k", "id AS v")
        with pytest.raises(ValueError, match="how must be"):
            salted_join(df, df.selectExpr("k", "v AS w"), "k", how="right")
        with pytest.raises(ValueError, match="both sides"):
            salted_join(df, df, "k")


def test_runtime_bloom_filter_prunes_fact_side(spark, tmp_path):
    """Spark's runtime bloom-filter join optimization must fire on this
    repo's fact x filtered-dim SMJ shape: the filtered creation side
    builds a bloom_filter_agg and the fact scan gains a might_contain
    filter BEFORE its shuffle — at 100 TB this is shuffled-bytes
    reduction proportional to dim selectivity, for free. The
    application-side size threshold (default 10 GB) is what keeps it
    off at test scale, so the test zeroes it; production defaults
    trigger automatically once the fact scan is big enough."""
    d = str(tmp_path)
    spark.range(200_000).selectExpr("id AS k", "id % 100 AS v") \
        .write.mode("overwrite").parquet(d + "/fact")
    spark.range(5_000).selectExpr("id * 17 AS k", "id AS w") \
        .write.mode("overwrite").parquet(d + "/dim")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.read.parquet(d + "/fact")
        dim = spark.read.parquet(d + "/dim").filter("w % 3 = 0")
        j = fact.join(dim.hint("merge"), "k")
        p = plan_of(j)
        assert "bloom_filter_agg" in p, p
        assert "might_contain" in p, p
        assert j.count() == 1667  # correctness unchanged by the filter
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


# Queries whose construction EXECUTES work (streams run to completion,
# iterative algorithms collect, sinks write) — their plans are audited
# by their own tests; calling them here would re-run minutes of work.
_EAGER_QUERIES = {
    "stream_counts", "stream_counts_multibatch", "json_roundtrip",
    "dedup_cc", "dedup_cc_star", "decontaminate_shuffle", "part_rank",
    "ivf_topk_indexed",
    "stream_error_correlation", "stream_dedup", "stream_upsert",
    "stream_sessions", "stream_templates",
}


def test_no_registry_query_plans_cartesian_or_row_python(spark):
    """Structural floor for the WHOLE registry: no query may plan a
    CartesianProduct (unbounded row blow-up) or a row-at-a-time Python
    eval (BatchEvalPython/PythonUDF — the 10-100x-slower UDF path; all
    Python in this repo goes through Arrow-batched mapInPandas/
    mapInArrow). Catches a regressing operator the day it lands, for
    every current and future queries() entry."""
    from redeye_spark import entry_queries as EQ

    bad = {}
    for name, q in sorted(EQ.QUERIES.items()):
        if name in _EAGER_QUERIES:
            continue
        plan = plan_of(q(spark, "/root/testdata/sf0.001"))
        hits = [pat for pat in ("CartesianProduct", "BatchEvalPython")
                if pat in plan]
        if hits:
            bad[name] = hits
    assert not bad, bad
