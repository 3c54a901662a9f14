"""Third relational wave: the remaining TPC-H query *shapes* the testdata
schema can express — correlated EXISTS semi-joins (Q4), value-share
scalar subqueries (Q11), outer-join count distributions (Q13),
correlated-average small-quantity filters (Q17), HAVING-gated IN
subqueries (Q20), and the semi+anti self-join combo (Q21).

The testdata has no partsupp / commitdate / receiptdate / container
columns, so each query keeps the reference pattern's *plan shape*
(what Catalyst must optimize) while substituting available columns.

Scale notes: part/supplier/nation stay broadcast; the lineitem
self-joins in q21 are equi-joins on l_orderkey so they co-partition in
one shuffle exchange that AQE can reuse; scalar subqueries (q11, q17
thresholds) become one-row or small broadcast joins, never driver
collects; q13's left join keys on c_custkey so the customer side never
duplicates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table


# ---------------------------------------------------------------------------
# Q4 shape — order-priority checking via correlated EXISTS (semi-join with a
# non-equi residual: a lineitem shipped >60 days after the order date)
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    sql="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q11 shape — per-part revenue share vs a global-total scalar subquery
# (broadcast one-row threshold, not a driver collect)
# ---------------------------------------------------------------------------
@register(
    "q11_value_share",
    sql="""
WITH pv AS (SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS value
            FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, ROUND(value, 2) AS value
FROM pv WHERE value > (SELECT 0.0006 * SUM(value) FROM pv)
ORDER BY ROUND(value, 2) DESC, l_partkey
""",
)
def q11_value_share(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    thr = pv.agg((F.sum("value") * F.lit(0.0006)).alias("thr"))
    return (
        pv.join(F.broadcast(thr))
        .where(F.col("value") > F.col("thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution via conditional left outer
# join followed by a double aggregation
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    sql="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    return (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity revenue below a per-part correlated average
# (threshold rounded to 4 dp on both engines so float sum order can't flip
# row membership at the boundary)
# ---------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    sql="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly, COUNT(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk, ROUND(0.5 * AVG(l_quantity), 4) AS thr
      FROM lineitem GROUP BY l_partkey) ON pk = p_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < thr
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    part_f = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    # per-part avg over *all* lineitems of brand-filtered parts (partkey
    # determines brand, so pre-filtering through the broadcast join is
    # equivalent to the unrestricted correlated subquery — and scans less)
    li_b = li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li_b.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(F.lit(0.5) * F.avg("l_quantity"), 4).alias("thr")
    )
    return (
        li_b.join(F.broadcast(thr), F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.col("thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape — suppliers of heavily-shipped 'red' parts: IN subquery gated
# by a HAVING on an aggregated fact scan
# ---------------------------------------------------------------------------
@register(
    "q20_red_part_suppliers",
    sql="""
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
                    WHERE p_name LIKE '%red%'
                    GROUP BY l_suppkey HAVING ROUND(SUM(l_quantity), 2) > 2000)
ORDER BY s_name
""",
)
def q20_red_part_suppliers(spark: SparkSession, sf_dir: str):
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    red_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    heavy = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .where(F.col("qty") > 2000)
    )
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who were the *sole* late shipper on multi-supplier
# orders: one fact self-semi-join plus one self-anti-join, both equi on
# l_orderkey (single co-partitioned exchange; AQE reuses it)
# ---------------------------------------------------------------------------
@register(
    "q21_sole_late_supplier",
    sql="""
WITH late AS (SELECT l_orderkey, l_suppkey
              FROM lineitem JOIN orders ON o_orderkey = l_orderkey
              WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
     sups AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_name, COUNT(*) AS numwait
FROM supplier JOIN late l1 ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM sups a
              WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
""",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str):
    # Single-pass rewrite of the classic semi+anti self-join plan: per
    # order, one hash-agg computes (#distinct suppliers, #distinct late
    # suppliers, the late supplier, its late-line count). Qualifying
    # orders have exactly one late supplier among ≥2 suppliers — the
    # EXISTS/NOT-EXISTS pair collapses into two countDistincts. ONE
    # lineitem scan + ONE orderkey shuffle instead of two scans plus
    # semi and anti joins; equivalent because the anti-join condition
    # "no OTHER late supplier" ≡ n_late_supp == 1 for late rows, and
    # late-line multiplicity is preserved by summing per-order counts.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    flagged = li.join(
        orders, F.col("o_orderkey") == F.col("l_orderkey")
    ).select("l_orderkey", "l_suppkey", late.alias("is_late"))
    # two distinct-free hash aggs instead of countDistinct pairs: the
    # multi-countDistinct form plans an Expand (3× row multiplication
    # before the shuffle) — measured ~35% slower at sf0.1.
    # ONE exchange for both agg levels: hash-partitioning by l_orderkey
    # satisfies the clustering requirement of the (l_orderkey,
    # l_suppkey) agg AND of the per-order agg, so the explicit
    # repartition replaces the two ENSURE_REQUIREMENTS exchanges the
    # planner would otherwise insert (pair-level partial aggregation
    # barely reduces lineitem — ~4 lines/order, suppliers mostly
    # distinct within an order — so shuffling raw flagged rows moves
    # almost the same bytes once instead of twice).
    flagged = flagged.repartition("l_orderkey")
    per_pair = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("any_late"),
        F.sum(F.col("is_late").cast("int")).alias("late_lines"),
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
        F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("any_late") == 1, F.col("late_lines")).otherwise(0)).alias(
            "late_lines"
        ),
    )
    qualifying = per_order.where((F.col("n_late_supp") == 1) & (F.col("n_supp") >= 2))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qualifying.join(F.broadcast(sup), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
