"""Classic TPC-H query shapes (Q8/Q14/Q15/Q17/Q18/Q19/Q21/Q22 analogs)
over the driver testdata tables.

These cover the relational patterns the round-4 registry still lacked:
scalar subqueries (global max / global avg), decorrelated per-group
correlated subqueries (Q17's avg-per-part), semi-joins from a HAVING
subquery (Q18), anti-joins (Q22), disjunctive join predicates (Q19),
EXISTS/NOT-EXISTS folded into one aggregation (Q21), and a multi-year
share-of-total star join (Q8). The testdata has no `partsupp` table, so
Q2/Q11/Q16/Q20 (which require it) are out of scope; the lineitem table
carries only `l_shipdate`, so Q12/Q21's commit/receipt-date predicates
are re-expressed on shipdate.

Spark-first notes: every scalar subquery is a 1-row aggregate joined
back with an explicit `F.broadcast` cross join (never a window over a
single partition); per-group subqueries become partial aggregates
semi-restricted to the filtered dimension BEFORE the join back, so the
broadcast side stays bounded by the dimension selectivity at any scale.
All money sums are decimal(18,2) for cross-engine exactness, cast to
double only at the output edge (< 2^53, lossless); ratios divide the
two doubles in the same operation order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._shared import _utc


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _revenue() -> F.Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")


# ---------------------------------------------------------------------------
# Q14: promo revenue ratio — conditional aggregation over a broadcast join.
# ---------------------------------------------------------------------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one ship-month.

    Plan: month filter pushes to the lineitem scan; part (2k rows, and
    only partkey+type after pruning) broadcasts; both sums come out of
    ONE HashAggregate pass (conditional sum, not two scans)."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01")))
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _revenue())
                  .otherwise(F.lit(0).cast("decimal(18,2)"))).alias("_promo"),
            F.sum(_revenue()).alias("_total"),
        )
    )
    return agg.select(
        (F.lit(100.0) * F.col("_promo").cast("double") / F.col("_total").cast("double"))
        .alias("promo_pct"),
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
    )


SQL_PROMO_REVENUE = f"""
SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_pct,
       CAST(promo AS DOUBLE) AS promo_revenue,
       CAST(total AS DOUBLE) AS total_revenue
FROM (
  SELECT SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
         SUM({_REV_SQL}) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
)
"""


# ---------------------------------------------------------------------------
# Q15: top supplier — global-max scalar subquery joined back by broadcast.
# ---------------------------------------------------------------------------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in one quarter.

    The global max is a 1-row aggregate-of-aggregate broadcast back onto
    the per-supplier revenue (never a single-partition window; the
    revenue relation itself stays distributed). Equality compares the
    exact decimals, so ties resolve identically in both engines."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01")))
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("_rev"))
    mx = rev.agg(F.max("_rev").alias("_mx"))
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        rev.join(F.broadcast(mx), rev._rev == mx._mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey"), F.col("s_name"),
            F.col("_rev").cast("double").alias("total_revenue"),
        )
    )


SQL_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS r
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity revenue — decorrelated avg-per-part subquery.
# ---------------------------------------------------------------------------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lines whose quantity is below 20% of the
    part's average quantity, for one brand.

    Decorrelation: the correlated `avg(l_quantity) where same part`
    becomes a partial aggregate computed ONLY over the brand's lineitems
    (brand parts broadcast-semi-restrict lineitem first), then broadcast
    back — the join-back side is bounded by the brand's part count, not
    the full part table, at any scale. The 20%-of-avg comparison is done
    as `qty * cnt * 5 < sum_qty` in exact decimal, avoiding cross-engine
    float-division boundary flips."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    brand = (spark.read.parquet(f"{sf_dir}/part.parquet")
             .filter(F.col("p_brand") == "Brand#23").select("p_partkey"))
    li_b = li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey).drop("p_partkey")
    stats = li_b.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_dec("l_quantity")).alias("_sq"), F.count(F.lit(1)).alias("_cnt"))
    return (
        li_b.join(F.broadcast(stats), li_b.l_partkey == stats._pk)
        .filter(_dec("l_quantity") * F.col("_cnt") * F.lit(5) < F.col("_sq"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
             .alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_lines"))
    )


SQL_SMALL_QTY_REVENUE = """
WITH li_b AS (
  SELECT l.* FROM lineitem l
  JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
), stats AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         COUNT(*) AS cnt
  FROM li_b GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM li_b JOIN stats ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,2)) * cnt * 5 < sq
"""


# ---------------------------------------------------------------------------
# Q18: large-volume customers — HAVING subquery as an aggregate semi-join.
# ---------------------------------------------------------------------------

def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders total > 300 units.

    The `o_orderkey IN (SELECT ... HAVING sum(qty) > 300)` subquery is
    the aggregate itself: group lineitem once, filter, and join orders
    to the (small, post-filter) aggregate — the qualifying-order set
    shrinks with the threshold, so it broadcasts; orders and customer
    never shuffle on a synthetic key."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("_qty"))
           .filter(F.col("_qty") > F.lit(300).cast("decimal(18,2)")))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("_qty").cast("double").alias("total_qty"),
        )
    )


SQL_LARGE_VOLUME_CUSTOMERS = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice AS totalprice,
       CAST(q AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive join predicate — OR-of-ANDs across both join sides.
# ---------------------------------------------------------------------------

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three OR'd brand/size/quantity bands.

    The equi-join key (partkey) still drives a broadcast hash join; the
    disjunction stays a post-join filter Catalyst can't split, but the
    common `l_quantity <= 30` and `p_size >= 1` bounds are factored out
    so each side prunes before the join (visible as PushedFilters)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    band = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30)))
    )
    return (
        li.filter(F.col("l_quantity") <= 30)
        .join(F.broadcast(part.filter(F.col("p_size") <= 15)),
              li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


SQL_DISJUNCTIVE_REVENUE = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 analog: sole suppliers — EXISTS/NOT-EXISTS folded into one aggregate.
# ---------------------------------------------------------------------------

def q_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped EXISTS/NOT-EXISTS: suppliers who were the ONLY
    supplier on finished multi-line orders.

    The correlated pair (`EXISTS another line in this order` AND `NOT
    EXISTS a line from a different supplier`) collapses into one
    grouped aggregate per order — count(*) >= 2 AND count(distinct
    suppkey) = 1 — a single shuffle on the order key instead of two
    correlated probes. (The reference schema's commit/receipt-date
    lateness predicate has no analog here; lineitem carries only
    l_shipdate.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    sole = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"),
             F.countDistinct("l_suppkey").alias("_ns"),
             F.max("l_suppkey").alias("_supp"))
        .filter((F.col("_n") >= 2) & (F.col("_ns") == 1))
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        sole.join(orders, sole.l_orderkey == orders.o_orderkey)
        .groupBy("_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("_supp") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


SQL_SOLE_SUPPLIER_ORDERS = """
SELECT s_suppkey, s_name, numwait
FROM (
  SELECT supp, COUNT(*) AS numwait
  FROM (
    SELECT l_orderkey, MAX(l_suppkey) AS supp
    FROM lineitem GROUP BY l_orderkey
    HAVING COUNT(*) >= 2 AND COUNT(DISTINCT l_suppkey) = 1
  ) sole
  JOIN orders ON o_orderkey = sole.l_orderkey AND o_orderstatus = 'F'
  GROUP BY supp
) w
JOIN supplier ON supp = s_suppkey
"""


# ---------------------------------------------------------------------------
# Q22: idle rich customers — global-avg scalar subquery + anti-join.
# ---------------------------------------------------------------------------

def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers in selected "country codes" with an
    above-average balance and no RECENT orders, grouped by code.

    (The testdata has no phone column, so country code := c_nationkey
    % 5; and every customer has at least one lifetime order, so the
    dormancy cut is "no order since 1999-01-01" — same anti-join shape,
    nonempty result.) The global positive-balance average is a 1-row
    broadcast; the date filter pushes into the orders scan BEFORE the
    left_anti join, so the anti side shrinks to recent custkeys only.
    The avg comparison happens in double on both engines with identical
    operand order."""
    _utc(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "cc", (F.col("c_nationkey") % 5).cast("int")).filter(
        F.col("cc").isin(0, 2, 3))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("_avg")))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
              .select("o_custkey"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cc")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"))
    )


SQL_IDLE_RICH_CUSTOMERS = """
WITH c AS (
  SELECT *, CAST(c_nationkey % 5 AS INT) AS cc FROM customer
  WHERE CAST(c_nationkey % 5 AS INT) IN (0, 2, 3)
)
SELECT cc, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM c WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '1999-01-01')
GROUP BY cc
"""


# ---------------------------------------------------------------------------
# Q8: national market share — multi-dimension star join + share-of-total.
# ---------------------------------------------------------------------------

def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of ECONOMY-part revenue sold to
    region-2 customers, per order year.

    Star shape: lineitem is the only fact; part (type filter), supplier,
    and customer⋈nation (region filter) all broadcast, so the plan is
    one scan + N broadcast hash joins + one final groupBy(year) —
    exactly one shuffle regardless of scale. Share = conditional
    decimal sum / total decimal sum, divided as doubles."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", F.col("s_nationkey").alias("_supp_nation"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust_r = (spark.read.parquet(f"{sf_dir}/customer.parquet")
              .join(F.broadcast(nation.filter(F.col("n_regionkey") == 2)
                                .select("n_nationkey")),
                    F.col("c_nationkey") == F.col("n_nationkey"))
              .select("c_custkey"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_r), orders.o_custkey == cust_r.c_custkey)
    )
    agg = (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("_supp_nation") == 2, _revenue())
                  .otherwise(F.lit(0).cast("decimal(18,2)"))).alias("_nat"),
            F.sum(_revenue()).alias("_tot"),
        )
    )
    return agg.select(
        "o_year",
        (F.col("_nat").cast("double") / F.col("_tot").cast("double"))
        .alias("mkt_share"),
        F.col("_tot").cast("double").alias("total_revenue"),
    )


SQL_NATIONAL_MARKET_SHARE = f"""
SELECT CAST(yr AS BIGINT) AS o_year,
       CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE) AS mkt_share,
       CAST(tot AS DOUBLE) AS total_revenue
FROM (
  SELECT year(o_orderdate) AS yr,
         SUM(CASE WHEN s_nationkey = 2 THEN {_REV_SQL}
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS nat,
         SUM({_REV_SQL}) AS tot
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey AND n_regionkey = 2
  GROUP BY year(o_orderdate)
) t
"""


QUERIES = {
    "promo_revenue": q_promo_revenue,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "large_volume_customers": q_large_volume_customers,
    "disjunctive_revenue": q_disjunctive_revenue,
    "sole_supplier_orders": q_sole_supplier_orders,
    "idle_rich_customers": q_idle_rich_customers,
    "national_market_share": q_national_market_share,
}

ORACLES = {
    "promo_revenue": SQL_PROMO_REVENUE,
    "top_supplier": SQL_TOP_SUPPLIER,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "large_volume_customers": SQL_LARGE_VOLUME_CUSTOMERS,
    "disjunctive_revenue": SQL_DISJUNCTIVE_REVENUE,
    "sole_supplier_orders": SQL_SOLE_SUPPLIER_ORDERS,
    "idle_rich_customers": SQL_IDLE_RICH_CUSTOMERS,
    "national_market_share": SQL_NATIONAL_MARKET_SHARE,
}
