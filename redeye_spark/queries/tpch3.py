"""Third batch of classic decision-support shapes (Q9/Q10/Q11/Q16/Q20
analogs, adapted to the testdata schema — there is no partsupp table,
so supply cost is a declared fraction of p_retailprice and
supplier-part relationships come from lineitem). All monetary
arithmetic follows the repo's exact-decimal convention: cast to
DECIMAL(18,2) BEFORE summing, compare via integer/decimal
cross-multiplication instead of division, cast to DOUBLE only in the
final projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

_D = "decimal(18,2)"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(_D) * (
        F.lit(1).cast(_D) - F.col("l_discount").cast(_D)
    )


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: profit per supplier nation per ship year for one part
    type, profit = revenue - 60% of retail price x quantity (declared
    pseudo supply cost; the schema has no partsupp). Plan: lineitem is
    the only fact — part, supplier, nation all broadcast — so the single
    shuffle is the final (nation, year) aggregate at any scale."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type") == "PROMO"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cost = (
        F.col("p_retailprice").cast(_D)
        * F.lit(0.60).cast("decimal(3,2)")
        * F.col("l_quantity").cast(_D)
    )
    profit = _rev() - cost
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"),
             F.count(F.lit(1)).alias("n_items"))
    )


SQL_NATION_PROFIT = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.60 AS DECIMAL(3,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 analog: top-20 customers by revenue lost to returns
    (l_returnflag = 'R'), with nation. orders x lineitem is the
    fact x fact shuffle join; customer + nation broadcast; the top-k is
    a TakeOrderedAndProject with deterministic custkey tie-break."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_REVENUE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog: parts whose lineitem revenue exceeds 1.5x the MEAN
    per-part revenue. The global (total, part count) is a 1-row
    aggregate broadcast back (never a single-partition window over the
    fact); the threshold compare is the exact-decimal cross-multiply
    rev * nparts * 2 > total * 3 — no division, no float boundary
    flips. Mean-relative (not total-relative) so the predicate stays
    discriminating at every scale factor: a fixed share-of-total cut
    selects nothing once the catalog outgrows it (ADVICE r5 — the old
    rev*1000 > total matched 0 rows at sf0.1 and validated vacuously),
    while "top sellers vs the average part" is scale-free."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("_rev"))
    total = per_part.agg(
        F.sum("_rev").alias("_total"), F.count(F.lit(1)).alias("_nparts")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_rev") * F.col("_nparts") * 2 > F.col("_total") * 3)
        .select(
            "l_partkey",
            F.col("_rev").cast("double").alias("part_revenue"),
        )
    )


SQL_IMPORTANT_PARTS = """
WITH r AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem GROUP BY 1
),
t AS (SELECT SUM(rev) AS total, COUNT(*) AS nparts FROM r)
SELECT l_partkey, CAST(rev AS DOUBLE) AS part_revenue
FROM r, t WHERE rev * nparts * 2 > total * 3
"""


def q_supplier_attr_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: how many distinct suppliers ship each
    (brand, type, size) combination — supplier-part relationships come
    from lineitem (no partsupp table), one brand excluded. Part
    broadcasts into the fact; the count-distinct rides the (attrs)
    shuffle as a two-phase expand."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_brand") != "Brand#1"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_ATTR_COUNTS = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY 1, 2, 3
"""


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: suppliers that shipped MORE THAN double their fair
    share of some part's total quantity (dominant-source detection,
    fair share = total / supplier count for that part). Per-(part,
    supp) quantities re-aggregate to per-part totals on the key they
    are already partitioned by (AQE: no second exchange of the fact);
    threshold is the exact cross-multiply qty * nsupp > total * 2.
    Grouped + emitted by s_suppkey (the entity key), with s_name
    attached for display: grouping by name is wrong the moment two
    suppliers share one (the sf1 replicated corpus exposed exactly
    that — a name-grouped oracle merged 10 key-distinct copies).
    Fair-share-relative rather than a fixed fraction-of-total so the
    predicate discriminates at every scale: with ~26-30 suppliers per
    part in this corpus, the old qty * 3 > total (a >1/3 share) matched
    0 rows and validated vacuously (ADVICE r5). Output is the distinct
    supplier set with how many parts each dominates."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(_D)).alias("_qty")
    )
    totals = ps.groupBy("l_partkey").agg(
        F.sum("_qty").alias("_total"), F.count(F.lit(1)).alias("_nsupp")
    )
    dom = ps.join(totals, "l_partkey").filter(
        F.col("_qty") * F.col("_nsupp") > F.col("_total") * 2
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "n_dominated_parts")
    )


SQL_DOMINANT_SUPPLIERS = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY 1, 2
),
t AS (SELECT l_partkey, SUM(qty) AS total, COUNT(*) AS nsupp FROM ps GROUP BY 1)
SELECT s_suppkey, s_name, COUNT(*) AS n_dominated_parts
FROM ps JOIN t USING (l_partkey) JOIN supplier ON l_suppkey = s_suppkey
WHERE qty * nsupp > total * 2
GROUP BY 1, 2
"""


QUERIES = {
    "nation_profit": q_nation_profit,
    "returned_revenue": q_returned_revenue,
    "important_parts": q_important_parts,
    "supplier_attr_counts": q_supplier_attr_counts,
    "dominant_suppliers": q_dominant_suppliers,
}

ORACLES = {
    "nation_profit": SQL_NATION_PROFIT,
    "returned_revenue": SQL_RETURNED_REVENUE,
    "important_parts": SQL_IMPORTANT_PARTS,
    "supplier_attr_counts": SQL_SUPPLIER_ATTR_COUNTS,
    "dominant_suppliers": SQL_DOMINANT_SUPPLIERS,
}
