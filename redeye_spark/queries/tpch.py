"""TPC-H-shaped relational queries: scans, aggregations, joins,
set ops, star schemas over the driver testdata tables."""

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


# GROUPING SETS: the general form of ROLLUP/CUBE — IDENTICAL ANSI text
# through spark.sql and DuckDB (the Q22 pattern), including GROUPING()
# disambiguation of "real NULL vs subtotal row".
SQL_GROUPING_SETS_COUNTS = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def q_grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the shape ROLLUP/CUBE compile to, with a
    hand-picked set list): Spark plans ONE Expand + hash aggregate — a
    single scan serves all three granularities, which is the whole point
    at 100 TB vs three separate groupBys."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    return spark.sql(SQL_GROUPING_SETS_COUNTS)


def q_zorder_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order interleave of two bucketed dimensions — the value
    compact_table(cluster_by=) sorts on for multi-dimensional file
    skipping. The oracle recomputes the interleave with plain
    floor-div/mod arithmetic, pinning the bit layout exactly."""
    from ..functions.zorder import zorder_value

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.filter("pmod(event_id, 101) = 0").select(
        "event_id",
        zorder_value(
            [F.pmod(F.col("user_id"), F.lit(1024)),
             F.pmod(F.col("event_id"), F.lit(1024))],
            bits=10,
        ).alias("z"),
    )


def _zorder_oracle() -> str:
    from ..functions.zorder import zorder_sql

    z = zorder_sql(["user_id % 1024", "event_id % 1024"], bits=10)
    return (
        f"SELECT event_id, {z} AS z FROM events WHERE event_id % 101 = 0"
    )


SQL_ZORDER_SAMPLE = _zorder_oracle()


QUERIES = {
    "lineitem_pricing": q_lineitem_pricing,
    "nation_revenue": q_nation_revenue,
    "top_orders": q_top_orders,
    "supplier_balance": q_supplier_balance,
    "parts_by_brand": q_parts_by_brand,
    "order_priority_counts": q_order_priority_counts,
    "customer_churn": q_customer_churn,
    "customer_retained": q_customer_retained,
    "shipping_revenue": q_shipping_revenue,
    "customer_order_distribution": q_customer_order_distribution,
    "top_balance_inactive": q_top_balance_inactive,
    "volume_shipping": q_volume_shipping,
    "value_band_counts": q_value_band_counts,
    "regional_revenue": q_regional_revenue,
    "user_order_coverage": q_user_order_coverage,
    "grouping_sets_counts": q_grouping_sets_counts,
    "zorder_sample": q_zorder_sample,
}

ORACLES = {
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "nation_revenue": SQL_NATION_REVENUE,
    "top_orders": SQL_TOP_ORDERS,
    "supplier_balance": SQL_SUPPLIER_BALANCE,
    "parts_by_brand": SQL_PARTS_BY_BRAND,
    "order_priority_counts": SQL_ORDER_PRIORITY_COUNTS,
    "customer_churn": SQL_CUSTOMER_CHURN,
    "customer_retained": SQL_CUSTOMER_RETAINED,
    "shipping_revenue": SQL_SHIPPING_REVENUE,
    "customer_order_distribution": SQL_CUSTOMER_ORDER_DISTRIBUTION,
    "top_balance_inactive": SQL_TOP_BALANCE_INACTIVE,
    "volume_shipping": SQL_VOLUME_SHIPPING,
    "value_band_counts": SQL_VALUE_BAND_COUNTS,
    "regional_revenue": SQL_REGIONAL_REVENUE,
    "user_order_coverage": SQL_USER_ORDER_COVERAGE,
    "grouping_sets_counts": SQL_GROUPING_SETS_COUNTS,
    "zorder_sample": SQL_ZORDER_SAMPLE,
}
