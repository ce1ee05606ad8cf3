"""Window-function and as-of-join queries: last-per-key, rolling
and hopping windows, quartiles, pivot/unpivot, cube, as-of joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ..functions.logparse import FORMAT_COMMON  # noqa: F401
from ..operators import enrich as enrich_op  # noqa: F401
from ..operators import parse_op, route as route_op, tokenize_op  # noqa: F401
from ..operators import aggregate as agg_op  # noqa: F401
from ._shared import (  # noqa: F401
    _OFFS, _STATUS, _frags, _oracle_base, _parsed, _spark_lines, _spread,
    _utc, _PARSE_COLS,
)



def q_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: latest event per user (deterministic tie-break)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


SQL_LAST_EVENT_PER_USER = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""



# ---------------------------------------------------------------------------
# Round 3: deterministic splits/sampling, TF-IDF, decontamination
# ---------------------------------------------------------------------------

def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: every event picks up the latest order
    of the same user placed at-or-before the event time — the temporal
    enrichment shape Spark has no native operator for. Implemented as
    union + running last(IGNORE NULLS) window (operators/asof.py): ONE
    exchange, no row amplification, vs the naive range-join that
    shuffles |events| x orders-per-user rows (the oracle does exactly
    that, as ground truth). Ties broken by highest orderkey; users with
    no prior order stay NULL (left semantics)."""
    from ..operators.asof import asof_join

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    out = asof_join(
        ev, od,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["last_orderkey", "last_totalprice"],
        tie_col="last_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "last_orderkey",
        "last_totalprice",
    )


def q_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join as asof_last_order but through the
    time-bucketed hot-key plan (bucket="30 days"): the fill window
    partitions by (user, 30-day bucket) and bucket-closing orders are
    carried forward by a per-(user, bucket) window, so one user with a
    pathological event count would spread across tasks instead of
    serializing one reducer. Sharing asof_last_order's oracle pins the
    bucketed path to the exact naive-range-join ground truth."""
    from ..operators.asof import asof_join

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    out = asof_join(
        ev, od,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["last_orderkey", "last_totalprice"],
        tie_col="last_orderkey",
        bucket="30 days",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "last_orderkey",
        "last_totalprice",
    )


SQL_ASOF_LAST_ORDER = """
WITH m AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       m.o_orderkey AS last_orderkey, m.o_totalprice AS last_totalprice
FROM events e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
"""




def q_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event picks up the EARLIEST order of
    the same user placed at-or-after the event time ("next purchase
    after the session") — the time-reversed twin of asof_last_order,
    same single-exchange union+window plan with the sort flipped.
    Ties (same user, same order date) break to the highest orderkey,
    matching the backward query's convention."""
    from ..operators.asof import asof_join

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )
    out = asof_join(
        ev, od,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["next_orderkey", "next_totalprice"],
        tie_col="next_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "next_orderkey",
        "next_totalprice",
    )


SQL_ASOF_NEXT_ORDER = """
WITH m AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate ASC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       m.o_orderkey AS next_orderkey, m.o_totalprice AS next_totalprice
FROM events e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
"""


def q_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD window shape: per-user inter-event gaps (time-to-next-event
    — the retention/engagement primitive), aggregated as exact integer
    microseconds (sum/max/count, division left to the consumer) so
    microsecond-precision timestamps at sf0.1 can't float-flap the
    hash. Deterministic tiebreak on event_id for equal timestamps."""
    from pyspark.sql.window import Window

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    # parquet timestamps are NTZ; session TZ is pinned UTC, so the
    # TIMESTAMP cast is instant-preserving and unix_micros stays exact
    mic = lambda c: F.unix_micros(c.cast("timestamp"))
    gap = mic(F.lead("ts").over(w)) - mic(F.col("ts"))
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


SQL_USER_GAP_STATS = """
WITH g AS (
  SELECT user_id,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       MAX(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


def q_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the INVERSE of q_status_pivot: the wide
    per-method status-class counts fold back into long
    (method, status_class, n) rows via the stack() table generator, a
    pure projection-time expansion (no shuffle beyond the pivot's own
    aggregate). Zero-filled wide cells survive as explicit n=0 rows —
    the round-trip keeps the full method x class matrix."""
    # literally the pivot query's output — the whole point is the
    # round-trip, so the wide frame must come from ONE definition
    wide = q_status_pivot(spark, sf_dir)
    classes = ["2xx", "3xx", "4xx", "5xx"]
    stack_args = ", ".join(f"'{c}', n_{c}" for c in classes)
    return wide.selectExpr(
        "method",
        f"stack({len(classes)}, {stack_args}) AS (status_class, n)",
    )


SQL_STATUS_UNPIVOT = f"""
WITH {_oracle_base()}
, ok AS (
  SELECT method, CAST(floor(status_code / 100) AS INT) AS sc
  FROM expected WHERE error_kind IS NULL AND status_code IS NOT NULL
),
m AS (SELECT DISTINCT method FROM ok),
c AS (SELECT unnest(['2xx', '3xx', '4xx', '5xx']) AS status_class)
SELECT m.method, c.status_class,
       CAST(COUNT(ok.method) AS BIGINT) AS n
FROM m CROSS JOIN c
LEFT JOIN ok ON ok.method = m.method
            AND (CAST(ok.sc AS VARCHAR) || 'xx') = c.status_class
GROUP BY m.method, c.status_class
"""




def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): per-method request counts spread into
    one column per status class. The pivot value list is EXPLICIT, which
    matters twice at scale: Spark skips the extra distinct-scan pass it
    otherwise runs to discover the values, and the output schema is
    stable whatever slice of data a partition sees. Built on the full
    tokenize -> parse -> broadcast-enrich pipeline output, so the
    parser feeds it end to end."""
    parsed = _parsed(spark, sf_dir)
    # status dim only: the UA join would survive into the physical plan
    # (Catalyst can't prune an unused left join) and is not consumed here
    enriched = enrich_op.enrich(parsed, enrich_op.dim_status_class(spark))
    classes = ["2xx", "3xx", "4xx", "5xx"]
    return (
        enriched.filter(F.col("error_kind").isNull() & F.col("status_code").isNotNull())
        .groupBy("method")
        .pivot("status_class", classes)
        .agg(F.count(F.lit(1)))
        .select(
            "method",
            *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in classes],
        )
    )


def _status_pivot_oracle() -> str:
    cases = ",\n       ".join(
        f"COUNT(CASE WHEN CAST(floor(status_code / 100) AS BIGINT) || 'xx' "
        f"= '{c}' THEN 1 END) AS n_{c}"
        for c in ["2xx", "3xx", "4xx", "5xx"]
    )
    return f"""
WITH {_oracle_base()}
SELECT method, {cases}
FROM expected WHERE error_kind IS NULL AND status_code IS NOT NULL
GROUP BY method
"""


def q_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window counts (1h window, 30min slide — every event in
    exactly two windows): the overlapping-window aggregate, computed
    with F.window so the 2x row replication happens inside the map-side
    partial aggregate and never crosses the shuffle."""
    from ..operators import aggregate as agg

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = agg.hopping_counts(ev, "ts", ["event_type"])
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start_str"),
        "event_type",
        "n",
    )


SQL_HOPPING_COUNTS = """
WITH s AS (
  SELECT event_type,
         make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k) * 1800)
                        * 1000000) AS wstart
  FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS t(k)
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start_str,
       event_type, COUNT(*) AS n
FROM s
GROUP BY wstart, event_type
"""


def q_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning (curriculum-bucket shape): ntile(4) per
    event_type over a deterministic (value, event_id) order, then
    per-bin count and exact value range. This is the exact-sort path —
    one reducer per event_type holds that type's full order, fine for
    bounded type cardinality; the sketch path for unbounded groups is
    latency_percentiles_approx. min/max are raw parquet doubles,
    bit-exact across engines."""
    from pyspark.sql import Window

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


SQL_VALUE_QUARTILES = """
WITH q AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value ASC, event_id ASC) AS quartile
  FROM events
)
SELECT event_type, quartile, COUNT(*) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM q
GROUP BY event_type, quartile
"""


def q_rolling_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling time-range window: for every event, the user's event
    count and integer-cents value sum over the PRECEDING hour (range
    frame over epoch seconds, not a row frame — gaps and bursts are
    handled correctly). The sum is over exact integers (cents), so both
    engines agree bit-for-bit regardless of their internal accumulation
    order — a float sum over a sliding frame is evaluation-order-
    sensitive and would flap the hash. The frame orders by WHOLE
    seconds on both sides (Spark unix_timestamp truncates; the oracle
    must floor(epoch(ts)), not CAST, which rounds half-up in DuckDB
    and shifts sub-second rows across the 3600s boundary)."""
    _utc(spark)
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.floor(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(cents).over(w).alias("cents_1h"),
    )


SQL_ROLLING_USER_ACTIVITY = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""




def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE multi-grouping — all 2^k grouping sets in ONE Expand-based
    pass (the companion to rollup_counts' hierarchy sets). grouping_id
    disambiguates a genuine NULL key from a subtotal row, which matters
    once the cube keys are nullable (method is NULL on dead-letter rows
    if they weren't filtered — they are, but the id column keeps the
    contract explicit and engine-portable)."""
    parsed = _parsed(spark, sf_dir)
    return (
        parsed.filter(F.col("error_kind").isNull())
        .cube("method", "protocol")
        .agg(F.count(F.lit(1)).alias("n"),
             F.grouping_id().alias("gid"))
    )


SQL_CUBE_COUNTS = f"""
WITH {_oracle_base()}
SELECT method, protocol, COUNT(*) AS n,
       CAST(GROUPING(method, protocol) AS BIGINT) AS gid
FROM expected WHERE error_kind IS NULL
GROUP BY CUBE(method, protocol)
"""


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (top 3 parts by retail price per brand) — the
    grouped-limit shape. row_number + filter plans as a partial
    TOP-K sort per partition under AQE, never a global sort; the
    partkey tiebreak makes equal-price groups deterministic."""
    from pyspark.sql import Window

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey",
                F.col("rk").cast("long").alias("rk"))
    )


SQL_TOP_PARTS_PER_BRAND = """
SELECT p_brand, p_partkey, CAST(rk AS BIGINT) AS rk FROM (
  SELECT p_brand, p_partkey,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
) WHERE rk <= 3
"""


def q_order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist within order priority — the rank-based
    window pair (deterministic under ties, unlike row_number without a
    tiebreak). Ranks are computed over the FULL partition, then a
    key-sampled slice is emitted so the oracle hash stays small."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        orders.select(
            "o_orderkey", "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter("pmod(o_orderkey, 97) = 0")
    )


SQL_ORDER_PRICE_PERCENTILES = """
SELECT o_orderkey, o_orderpriority, pct_rank, cume FROM (
  SELECT o_orderkey, o_orderpriority,
         round(percent_rank() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice), 6) AS pct_rank,
         round(cume_dist() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice), 6) AS cume
  FROM orders
) WHERE o_orderkey % 97 = 0
"""


def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct sketch: distinct users per event type via
    dense-bitmap partials (operators/sketches.py bitmap_* family).

    Deliberately runs the two-step operational shape — partials built
    independently per ingest chunk (chunk := event_id % 3, a stand-in
    for daily batches), then bitmap_or_agg-merged WITHOUT revisiting raw
    rows — so the oracle equality proves partials+merge == one-shot
    count(DISTINCT). State per (type, chunk, bucket) is a fixed 4 KB
    bitmap; the merge shuffle carries bitmaps, never raw user ids.
    Unlike the HLL sketches (pytest-banded, not oracle-able), this path
    is exact and DuckDB-hashable."""
    from ..operators.sketches import bitmap_distinct_partials, bitmap_merge_distinct

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("chunk", (F.col("event_id") % 3).cast("int")))
    partials = bitmap_distinct_partials(
        ev, "user_id", group_cols=["event_type"], chunk_col="chunk")
    return bitmap_merge_distinct(partials, group_cols=["event_type"])


SQL_BITMAP_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


QUERIES = {
    "last_event_per_user": q_last_event_per_user,
    "bitmap_distinct_users": q_bitmap_distinct_users,
    "asof_last_order": q_asof_last_order,
    "asof_bucketed": q_asof_bucketed,
    "asof_next_order": q_asof_next_order,
    "user_gap_stats": q_user_gap_stats,
    "status_unpivot": q_status_unpivot,
    "status_pivot": q_status_pivot,
    "hopping_counts": q_hopping_counts,
    "value_quartiles": q_value_quartiles,
    "rolling_user_activity": q_rolling_user_activity,
    "cube_counts": q_cube_counts,
    "top_parts_per_brand": q_top_parts_per_brand,
    "order_price_percentiles": q_order_price_percentiles,
}

ORACLES = {
    "last_event_per_user": SQL_LAST_EVENT_PER_USER,
    "bitmap_distinct_users": SQL_BITMAP_DISTINCT_USERS,
    "asof_last_order": SQL_ASOF_LAST_ORDER,
    "asof_bucketed": SQL_ASOF_LAST_ORDER,
    "asof_next_order": SQL_ASOF_NEXT_ORDER,
    "user_gap_stats": SQL_USER_GAP_STATS,
    "status_unpivot": SQL_STATUS_UNPIVOT,
    "status_pivot": _status_pivot_oracle(),
    "hopping_counts": SQL_HOPPING_COUNTS,
    "value_quartiles": SQL_VALUE_QUARTILES,
    "rolling_user_activity": SQL_ROLLING_USER_ACTIVITY,
    "cube_counts": SQL_CUBE_COUNTS,
    "top_parts_per_brand": SQL_TOP_PARTS_PER_BRAND,
    "order_price_percentiles": SQL_ORDER_PRICE_PERCENTILES,
}
