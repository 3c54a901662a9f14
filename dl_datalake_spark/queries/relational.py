"""Relational query surface: scans, filters, joins (all types), aggs
(incl. rollup/distinct), windows (ranking/frames), set ops, sort/limit/
offset, scalar functions — SURVEY §2.2-§2.8 coverage over the TPC-H-ish
testdata.

Scale notes are per-query; the common ones: dimension joins carry
explicit broadcast hints, aggregations are single hash-agg passes
(partial+final map-side combine for free), top-k is
TakeOrderedAndProject not a global sort, window functions partition on
high-cardinality keys so no single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table


# ---------------------------------------------------------------------------
# Q1 — pricing summary (filter → hash agg; the TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                            AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                       AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
       ((2 * CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) * 10000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 10000.0 AS avg_qty,
       ((2 * CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) * 10000 + CAST(100 * COUNT(*) AS BIGINT)) // (2 * CAST(100 * COUNT(*) AS BIGINT))) / 10000.0 AS avg_price,
       ((2 * CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) * 10000 + CAST(100 * COUNT(*) AS BIGINT)) // (2 * CAST(100 * COUNT(*) AS BIGINT))) / 10000.0 AS avg_disc,
       COUNT(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            ratio_round(
                F.sum(F.col("l_quantity").cast("long")), F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            ratio_round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
                F.count(F.lit(1)) * 100,
                4,
            ).alias("avg_price"),
            ratio_round(
                F.sum(F.round(F.col("l_discount") * 100).cast("long")),
                F.count(F.lit(1)) * 100,
                4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (3-way join → agg → top-k)
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    sql="""
SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS DATE)                          AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate > DATE '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join; dims broadcast)
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier",
    sql="""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str):
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# semi/anti joins — customers with vs without orders, per segment
# ---------------------------------------------------------------------------
@register(
    "join_semi_anti",
    sql="""
SELECT 'with_orders' AS side, c_mktsegment, COUNT(*) AS n
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
UNION ALL
SELECT 'without_orders' AS side, c_mktsegment, COUNT(*) AS n
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    on = cust.c_custkey == orders.o_custkey
    semi = (
        cust.join(orders, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("side"), "c_mktsegment", "n")
    )
    anti = (
        cust.join(orders, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("side"), "c_mktsegment", "n")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# rollup aggregation
# ---------------------------------------------------------------------------
@register(
    "agg_rollup",
    sql="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# distinct aggregates
# ---------------------------------------------------------------------------
@register(
    "agg_distinct",
    sql="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# mode per group (A3 generalization: argmax by count)
# ---------------------------------------------------------------------------
@register(
    "agg_mode_per_group",
    sql="""
SELECT o_orderstatus, o_orderpriority AS top_priority, n
FROM (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str):
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("top_priority"), "n")
    )


# ---------------------------------------------------------------------------
# window: ranking (top-3 orders per customer)
# ---------------------------------------------------------------------------
@register(
    "window_rank_topn",
    sql="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_rank_topn(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# window: analytic frames (moving avg + running sum per customer)
# ---------------------------------------------------------------------------
@register(
    "window_moving_frames",
    sql="""
SELECT o_custkey, o_orderkey,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS run_sum,
       ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
FROM orders
""",
)
def window_moving_frames(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("mov_avg3"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "run_sum"
        ),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
        ).alias("delta_prev"),
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------
@register(
    "set_operations",
    sql="""
SELECT 'cust_only' AS side, nationkey FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
UNION ALL
SELECT 'supp_only' AS side, nationkey FROM (
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
  EXCEPT
  SELECT DISTINCT c_nationkey AS nationkey FROM customer)
UNION ALL
SELECT 'both' AS side, nationkey FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
""",
)
def set_operations(spark: SparkSession, sf_dir: str):
    cn = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    tag = lambda df, side: df.select(F.lit(side).alias("side"), "nationkey")  # noqa: E731
    return (
        tag(cn.exceptAll(sn), "cust_only")
        .unionByName(tag(sn.exceptAll(cn), "supp_only"))
        .unionByName(tag(cn.intersect(sn), "both"))
    )


# ---------------------------------------------------------------------------
# sort + offset/limit pagination (O1/O2)
# ---------------------------------------------------------------------------
@register(
    "sort_offset_limit",
    sql="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
FROM orders ORDER BY o_orderkey OFFSET 100 LIMIT 50
""",
)
def sort_offset_limit(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# top-k (TakeOrderedAndProject, not a global sort)
# ---------------------------------------------------------------------------
@register(
    "topk_orders",
    sql="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def topk_orders(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# scalar string functions (F6/F7/P6)
# ---------------------------------------------------------------------------
@register(
    "scalar_string_funcs",
    sql="""
SELECT p_partkey,
       UPPER(p_name)                              AS up_name,
       CAST(LENGTH(p_name) AS INTEGER)            AS name_len,
       SUBSTR(p_type, 1, 5)                       AS type_prefix,
       REPLACE(p_brand, 'Brand', 'B')             AS brand_short,
       CONCAT_WS('|', p_brand, p_type)            AS brand_type,
       ROUND(p_retailprice * 1.1, 2)              AS up_price,
       p_size % 7                                 AS size_mod
FROM part WHERE p_partkey <= 500
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("brand_short"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("up_price"),
            (F.col("p_size") % 7).alias("size_mod"),
        )
    )


# ---------------------------------------------------------------------------
# scalar date functions (F1-F5)
# ---------------------------------------------------------------------------
@register(
    "scalar_date_funcs",
    sql="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INTEGER)             AS order_year,
       CAST(MONTH(o_orderdate) AS INTEGER)            AS order_month,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       STRFTIME(o_orderdate, '%Y-%m')                 AS ym
FROM orders WHERE o_orderkey <= 1000
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
    )


# ---------------------------------------------------------------------------
# CASE WHEN bucketing + conditional aggregation (manual pivot)
# ---------------------------------------------------------------------------
@register(
    "case_bucket_pivot",
    sql="""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS bal_bucket,
       COUNT(*) AS n,
       ROUND(SUM(c_acctbal), 2) AS total_bal,
       COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')  AS n_building,
       COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS n_machinery
FROM customer
GROUP BY 1
""",
)
def case_bucket_pivot(spark: SparkSession, sf_dir: str):
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(bucket.alias("bal_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n_building"),
            F.count(F.when(F.col("c_mktsegment") == "MACHINERY", 1)).alias("n_machinery"),
        )
    )


# ---------------------------------------------------------------------------
# orders above their customer's average (decorrelated as a join)
# ---------------------------------------------------------------------------
@register(
    "above_avg_orders",
    sql="""
WITH cust_avg AS (
  -- avg rounded to 6 BEFORE the subtraction: the raw averages differ
  -- between engines in the last float bits, which would flip the final
  -- 2-digit rounding on boundary values
  SELECT o_custkey AS k, ((2 * CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) * 1000000 + CAST(100 * COUNT(*) AS BIGINT)) // (2 * CAST(100 * COUNT(*) AS BIGINT))) / 1000000.0 AS avg_price FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice,
       ROUND(o_totalprice - avg_price, 6) AS above_by
FROM orders JOIN cust_avg ON o_custkey = k
WHERE o_totalprice > avg_price * 1.5
""",
)
def above_avg_orders(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    cust_avg = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        ratio_round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
            F.count(F.lit(1)) * 100,
        ).alias("avg_price")
    )
    return (
        orders.join(cust_avg, orders.o_custkey == cust_avg.k)
        .where(F.col("o_totalprice") > F.col("avg_price") * 1.5)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round(F.col("o_totalprice") - F.col("avg_price"), 6).alias("above_by"),
        )
    )
