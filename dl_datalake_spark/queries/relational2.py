"""Second relational wave: the remaining TPC-H-shaped query patterns the
testdata schema can express — correlated/scalar subqueries, disjunctive
join predicates, count-distinct over joins, argmax-per-group, having
semi-joins, market-share case-aggs, and two-sided nation-pair joins.

Scale notes (apply throughout): all dimension tables (region, nation,
supplier, part at dim-scale, customer where filtered) carry explicit
`F.broadcast` hints so the fact-side lineitem/orders scans never
shuffle for a dim join; every aggregation is a single partial+final
hash agg; top-k goes through TakeOrderedAndProject (orderBy+limit), not
a global sort; scalar subqueries become one-row broadcast cross joins,
not driver collects.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q2 shape — argmax per group: top supplier by acctbal per EUROPE nation
# ---------------------------------------------------------------------------
@register(
    "q2_top_supplier_per_nation",
    sql="""
SELECT n_name, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
QUALIFY ROW_NUMBER() OVER (PARTITION BY n_name
                           ORDER BY s_acctbal DESC, s_suppkey) = 1
ORDER BY n_name
""",
)
def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str):
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — pure filter-agg; the predicate-pushdown showcase (scan-only, no join)
# ---------------------------------------------------------------------------
@register(
    "q6_revenue_delta",
    sql="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q7 shape — nation-pair volume in both directions, by ship year
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    sql="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
GROUP BY 1, 2, 3
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share of one supplier nation inside a region+type slice
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    sql="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
GROUP BY 1
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    rev = _rev()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_reg") == reg.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape — profit by supplier nation × order year for a part-name pattern
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    sql="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(ROUND(SUM(l_extendedprice * (1 - l_discount)), 4), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # double-round: the raw sum can land within float-noise of a
        # .xx5 boundary, where engines' partial-sum orders disagree
        .agg(F.round(F.round(F.sum(_rev()), 4), 2).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 shape — top 20 customers by returned-item revenue in a quarter
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    sql="""
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape — priority case-agg per linestatus in a ship-year
# ---------------------------------------------------------------------------
@register(
    "q12_priority_by_linestatus",
    sql="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY l_linestatus
""",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo-style revenue share of one part type in one month
# ---------------------------------------------------------------------------
@register(
    "q14_type_revenue_share",
    sql="""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'ECONOMY'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS economy_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1997-06-01' AND l_shipdate < DATE '1997-07-01'
""",
)
def q14_type_revenue_share(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _rev()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("economy_share")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape — supplier(s) hitting the max quarterly revenue (scalar subquery)
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    sql="""
WITH rev AS (
  SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_rev"))
    # scalar max as an unpartitioned window over the (small) agg result —
    # no driver collect, no second scan of lineitem
    rev = rev.withColumn("max_rev", F.max("total_rev").over(Window.partitionBy()))
    return (
        rev.where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape — distinct supplier count per (brand,type,size) with NOT-IN prune
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_cnt",
    sql="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
""",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str):
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    bad_sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    return (
        li.join(
            F.broadcast(bad_sup), li.l_suppkey == F.col("bad_suppkey"), "left_anti"
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# Q18 shape — large-volume orders (HAVING semi-join)
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_orders",
    sql="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Single-agg shape (r12, guide §2.4): the classic two-pass form
    # (big-order semi-join + detail re-aggregation) computes the SAME
    # SUM(l_quantity) per orderkey twice and scans lineitem twice. The
    # final output is at order grain and orders/customer are unique on
    # their keys, so aggregating once, filtering, and joining the
    # survivor set up to orders/customer is equivalent row-for-row
    # (TPC-H referential integrity: every l_orderkey exists in orders,
    # which the oracle's own two-pass SQL also relies on). Plan: ONE
    # lineitem scan and ONE exchange (the partial-agg-reduced orderkey
    # agg) vs two scans + semi-join + second agg. Measured 6-rep
    # interleaved A/B at sf0.1: min 0.985 -> 0.615 s, med 1.061 ->
    # 0.670 (~37% faster), identical rows and schema.
    # per_order is ~20% of orders (measured at 3 SFs) — linear in the
    # corpus — so it is deliberately NOT broadcast-hinted: AQE converts
    # the join to broadcast at bench scale from the observed ~700 KB,
    # while at 100 TB the planner keeps a shuffle join instead of
    # shipping a corpus-sized build side to every task.
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 150)
    )
    return (
        orders.join(per_order, orders.o_orderkey == F.col("l_orderkey"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round(F.col("qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive brand/size/quantity join predicate
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_predicate",
    sql="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 5 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive_predicate(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(5, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape — idle rich customers: scalar subquery + anti join
# ---------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    sql="""
SELECT c_nationkey,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# CUBE aggregation (SURVEY §2.4 "absent from reference, free in Spark")
# ---------------------------------------------------------------------------
@register(
    "agg_cube",
    sql="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS via the SQL entry point (temp-view + spark.sql path)
# ---------------------------------------------------------------------------
@register(
    "agg_grouping_sets",
    sql="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# INTERSECT (completes the set-op family: union/except already covered)
# ---------------------------------------------------------------------------
@register(
    "set_intersect",
    sql="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY custkey
""",
)
def set_intersect(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return urgent.intersect(building).orderBy("custkey")


# ---------------------------------------------------------------------------
# approx_count_distinct (HLL) vs exact — approximate by design, rows-only
# ---------------------------------------------------------------------------
@register(
    "agg_approx_distinct",
    # HLL sketch values differ per engine, so the oracle checks the HLL
    # *contract* instead: exact counts hash-compared, approx folded into
    # a within-3-sigma boolean (rsd=0.02 → always TRUE for a working
    # sketch; DuckDB asserts the literal).
    sql="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_tol
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 3 * rsd * F.col("exact_parts")
            ).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# RANGE-frame window (value-based frame, vs the row-based frames in
# window_moving_frames)
# ---------------------------------------------------------------------------
@register(
    "window_range_frames",
    sql="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2) AS spend_90d
FROM orders
WHERE o_custkey < 200
""",
)
def window_range_frames(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    # value-based frame over epoch seconds: trailing 90-day spend
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    )


# ---------------------------------------------------------------------------
# percentile aggregates (exact interpolated quantiles per group)
# ---------------------------------------------------------------------------
@register(
    "agg_percentiles",
    sql="""
SELECT l_returnflag,
       ROUND(MEDIAN(l_extendedprice), 4) AS median_price,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99_price"),
    )


# ---------------------------------------------------------------------------
# quantile-sketch accuracy audit (approx_percentile vs exact)
# ---------------------------------------------------------------------------
@register(
    "agg_approx_quantile_audit",
    sql="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
       TRUE AS within_tol
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_quantile_audit(spark: SparkSession, sf_dir: str):
    """Quantile-sketch audit, same contract as agg_approx_distinct: the
    oracle pins the EXACT percentiles plus a literal TRUE; the Spark
    side recomputes the exact values AND runs the mergeable
    approx_percentile sketch (accuracy 10000), asserting the sketch
    lands within 1% relative error. A sketch regression flips
    within_tol to false and fails the value hash.

    Scale: exact percentile needs a per-group sort of the full column
    — fine here, unthinkable at 100 TB, where ONLY the sketch path
    runs (fixed-size state, partial-merges map-side like any monoid).
    This query is the accuracy contract that justifies that swap.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # array form: ONE per-group sort serves both exact percentiles
    # (two scalar calls each sort independently — measured 2.4x slower)
    g = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))
        ).alias("e"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("a"),
    ).select(
        "l_returnflag",
        F.col("e")[0].alias("e50"),
        F.col("e")[1].alias("e95"),
        F.col("a")[0].alias("a50"),
        F.col("a")[1].alias("a95"),
    )
    tol = (F.abs(F.col("a50") - F.col("e50")) <= 0.01 * F.col("e50")) & (
        F.abs(F.col("a95") - F.col("e95")) <= 0.01 * F.col("e95")
    )
    return g.select(
        "l_returnflag",
        F.round("e50", 4).alias("exact_p50"),
        F.round("e95", 4).alias("exact_p95"),
        tol.alias("within_tol"),
    )
