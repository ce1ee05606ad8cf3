"""TPC-H-shaped relational queries over the testdata star schema:
joins (broadcast/SMJ/as-of/range), set ops, windows, pivot,
ROLLUP/CUBE, FULL OUTER coverage."""

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

def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate; decimal sums for cross-engine exactness."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)")
                 * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )  # decimal sums are exact at 2-4dp; the final double cast is lossless (< 2^53)


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast join: customer x orders x nation -> revenue."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_NATION_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort/limit top-k: orderBy+limit plans as
    TakeOrderedAndProject — per-partition local top-k then a driver-side
    merge of n_partitions*k rows, the only scale-correct global top-k
    (never a full sort). Deterministic tie-break on the unique key."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join over the supplier + nation dims with a HAVING-style
    post-aggregation filter (exercises the remaining TPC-H-ish tables)."""
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .filter(F.col("n_suppliers") >= 1)
    )


SQL_SUPPLIER_BALANCE = """
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name HAVING COUNT(*) >= 1
"""


def q_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-level aggregate with a pushed filter over the part table."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        part.filter(F.col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


SQL_PARTS_BY_BRAND = """
SELECT p_brand, COUNT(*) AS n_parts,
       round(AVG(p_retailprice), 2) AS avg_price,
       MAX(p_size) AS max_size
FROM part WHERE p_size >= 10 GROUP BY p_brand
"""


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


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape large x large SHUFFLE join: orders semi-joined to
    lineitem on orderkey plus a non-equi lateness condition (a lineitem
    shipped >60 days after the order date). Neither side of a fact x fact
    join fits a broadcast at scale, so the lineitem side carries an
    explicit MERGE hint: both sides shuffle-partition on the key and
    sort-merge — the plan a 100 TB lineitem JOIN orders actually runs
    (and what AQE would pick once both sides exceed the broadcast
    threshold; the hint makes the shape deterministic across SFs).
    Plan-gated in tests/test_plans.py: SortMergeJoin + LeftSemi, no
    BroadcastHashJoin; AQE skew-split over this shape is smoke-tested
    separately."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    late = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li.hint("merge"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_ORDER_PRIORITY_COUNTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set-op (SURVEY §2.2 'Set ops'): customers who ordered in
    1995 but not in 1996. subtract() is EXCEPT DISTINCT — plans as a
    left-anti aggregate over the two scans, the corpus-delta shape
    (yesterday's ids minus today's) a training pipeline diffs snapshots
    with."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


SQL_CUSTOMER_CHURN = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_customer_retained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set-op: customers active in both 1995 and 1996."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


SQL_CUSTOMER_RETAINED = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_shipping_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape fact x fact INNER shuffle join (the companion to
    order_priority_counts' semi-join): lineitem JOIN orders on orderkey
    (MERGE hint — both sides fact-sized at scale), date-filtered on both
    sides (filters push to both scans BEFORE the shuffle), then a
    two-column aggregate and top-10 by revenue. Decimal sums for
    cross-engine exactness; TakeOrderedAndProject for the limit."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01"))
    l = li.filter(F.col("l_shipdate") >= F.lit("1996-01-01"))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        o.join(l.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_SHIPPING_REVENUE = """
SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate < TIMESTAMP '1996-01-01'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
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


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly k orders —
    LEFT OUTER join with an extra join-side predicate (urgent orders
    excluded IN the join condition, so order-less customers still count
    with k=0), then a two-level aggregate (per-customer count ->
    count-of-counts). The outer join shuffles both sides on custkey;
    the second aggregate is a near-free rollup of the first's output."""
    _utc(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cond = (cust.c_custkey == orders.o_custkey) & (
        orders.o_orderpriority != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q_top_balance_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape, THROUGH THE SQL API (spark.sql over temp
    views): customers with above-average positive balance and no orders
    since 2000 (every customer has SOME order in this corpus, so the
    recency cut keeps the anti-join non-trivial — 55 rows at sf0.01) —
    a scalar aggregate subquery (planned as a one-row broadcast) plus
    NOT EXISTS (planned as a left-anti join), the two classic
    decorrelation shapes. Money compared in integer cents with
    an exact cross-multiplied mean test (bal*n > total), because a
    float average threshold could flip rows by one ulp between engines
    — and Spark CAST(double AS BIGINT) truncates while DuckDB rounds,
    so the cents conversion uses an explicit floor()."""
    _utc(spark)
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    return spark.sql(SQL_TOP_BALANCE_INACTIVE)


# identical ANSI text runs on both engines: the strongest cross-engine
# statement of SQL-surface parity this suite can make
SQL_TOP_BALANCE_INACTIVE = """
WITH cents AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
thr AS (
  SELECT SUM(bal_cents) AS total, COUNT(*) AS n
  FROM cents WHERE bal_cents > 0
)
SELECT c_nationkey AS nation,
       COUNT(*) AS numcust,
       CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
FROM cents, thr
WHERE bal_cents * n > total
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey
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


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two specific nations,
    by supplier nation, customer nation, and ship year — the two-fact
    chain (lineitem SMJ orders) with THREE broadcast dims, one of them
    (nation) joined TWICE under different roles, plus a symmetric
    either-direction pair filter. Exercises dim aliasing / multi-role
    broadcast, and exact decimal revenue."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)")
                 * (F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
)
GROUP BY supp_nation, cust_nation, l_year
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


def q_value_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast range join: events bucketed by which [lo, hi) band
    contains `value` (latency-tier shape). The band dim is broadcast, so
    the non-equi join is a map-side BroadcastNestedLoopJoin — no
    shuffle of the fact stream, no cartesian exchange (which is what an
    unhinted non-equi join degenerates to). min/max are raw parquet
    doubles (no arithmetic), bit-exact across engines."""
    from ..operators.enrich import range_enrich

    _utc(spark)
    bands = spark.createDataFrame(
        [("micro", 0.0, 10.0), ("small", 10.0, 25.0), ("mid", 25.0, 50.0),
         ("large", 50.0, 100.0), ("huge", 100.0, 1e9)],
        "band string, lo double, hi double",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        range_enrich(ev, bands, "value")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


SQL_VALUE_BAND_COUNTS = """
WITH bands(band, lo, hi) AS (
  VALUES ('micro', 0.0, 10.0), ('small', 10.0, 25.0), ('mid', 25.0, 50.0),
         ('large', 50.0, 100.0), ('huge', 100.0, 1e9)
)
SELECT band, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
FROM events e LEFT JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape multi-way join — the mixed-strategy plan a 100 TB
    star query needs: lineitem JOIN orders is the one fact x fact edge
    (MERGE-hinted sort-merge), every dimension edge (customer, and the
    supplier->nation->region chain) is an explicit broadcast hash join,
    including the non-key c_nationkey = s_nationkey condition that makes
    Q5 famous. Date filter pushes to the orders scan, r_name filter
    prunes the dim chain before broadcast. Decimal revenue for
    cross-engine exactness."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    dim = supplier.join(
        F.broadcast(
            nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        li.hint("merge")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dim),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REGIONAL_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
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


def q_user_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type nothing else exercises:
    per-user event counts x per-customer order counts, keeping users
    with no orders AND customers with no events (both sides pre-
    aggregated, so the join itself is key-unique and the outer NULLs
    are meaningful). Bucketed into a 3-way coverage tally."""
    _utc(spark)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.col("user_id").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    both = ev.join(od, on="uid", how="full_outer")
    side = (
        F.when(F.col("n_events").isNull(), F.lit("orders_only"))
        .when(F.col("n_orders").isNull(), F.lit("events_only"))
        .otherwise(F.lit("both"))
    )
    return both.groupBy(side.alias("side")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.coalesce("n_events", F.lit(0))).alias("total_events"),
        F.sum(F.coalesce("n_orders", F.lit(0))).alias("total_orders"),
    )


SQL_USER_ORDER_COVERAGE = """
WITH ev AS (
  SELECT user_id AS uid, COUNT(*) AS n_events FROM events GROUP BY user_id
),
od AS (
  SELECT o_custkey AS uid, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
),
j AS (
  SELECT CASE WHEN ev.n_events IS NULL THEN 'orders_only'
              WHEN od.n_orders IS NULL THEN 'events_only'
              ELSE 'both' END AS side,
         ev.n_events, od.n_orders
  FROM ev FULL OUTER JOIN od ON ev.uid = od.uid
)
SELECT side, COUNT(*) AS n_keys,
       CAST(SUM(COALESCE(n_events, 0)) AS BIGINT) AS total_events,
       CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders
FROM j GROUP BY side
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






QUERIES = {
    "lineitem_pricing": q_lineitem_pricing,
    "nation_revenue": q_nation_revenue,
    "top_orders": q_top_orders,
    "supplier_balance": q_supplier_balance,
    "parts_by_brand": q_parts_by_brand,
    "last_event_per_user": q_last_event_per_user,
    "order_priority_counts": q_order_priority_counts,
    "customer_churn": q_customer_churn,
    "customer_retained": q_customer_retained,
    "shipping_revenue": q_shipping_revenue,
    "asof_last_order": q_asof_last_order,
    "asof_bucketed": q_asof_bucketed,
    "customer_order_distribution": q_customer_order_distribution,
    "top_balance_inactive": q_top_balance_inactive,
    "user_gap_stats": q_user_gap_stats,
    "volume_shipping": q_volume_shipping,
    "status_unpivot": q_status_unpivot,
    "value_band_counts": q_value_band_counts,
    "regional_revenue": q_regional_revenue,
    "hopping_counts": q_hopping_counts,
    "value_quartiles": q_value_quartiles,
    "status_pivot": q_status_pivot,
    "rolling_user_activity": q_rolling_user_activity,
    "cube_counts": q_cube_counts,
    "user_order_coverage": q_user_order_coverage,
    "asof_next_order": q_asof_next_order,
}

ORACLES = {
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "nation_revenue": SQL_NATION_REVENUE,
    "top_orders": SQL_TOP_ORDERS,
    "supplier_balance": SQL_SUPPLIER_BALANCE,
    "parts_by_brand": SQL_PARTS_BY_BRAND,
    "last_event_per_user": SQL_LAST_EVENT_PER_USER,
    "order_priority_counts": SQL_ORDER_PRIORITY_COUNTS,
    "customer_churn": SQL_CUSTOMER_CHURN,
    "customer_retained": SQL_CUSTOMER_RETAINED,
    "shipping_revenue": SQL_SHIPPING_REVENUE,
    "asof_last_order": SQL_ASOF_LAST_ORDER,
    "asof_bucketed": SQL_ASOF_LAST_ORDER,
    "customer_order_distribution": SQL_CUSTOMER_ORDER_DISTRIBUTION,
    "top_balance_inactive": SQL_TOP_BALANCE_INACTIVE,
    "user_gap_stats": SQL_USER_GAP_STATS,
    "volume_shipping": SQL_VOLUME_SHIPPING,
    "status_unpivot": SQL_STATUS_UNPIVOT,
    "value_band_counts": SQL_VALUE_BAND_COUNTS,
    "regional_revenue": SQL_REGIONAL_REVENUE,
    "hopping_counts": SQL_HOPPING_COUNTS,
    "value_quartiles": SQL_VALUE_QUARTILES,
    "status_pivot": _status_pivot_oracle(),
    "rolling_user_activity": SQL_ROLLING_USER_ACTIVITY,
    "cube_counts": SQL_CUBE_COUNTS,
    "user_order_coverage": SQL_USER_ORDER_COVERAGE,
    "asof_next_order": SQL_ASOF_NEXT_ORDER,
}
