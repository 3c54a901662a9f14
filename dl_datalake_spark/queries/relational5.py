"""Product-analytics shapes: funnel conversion, retention cohorts,
market-basket co-occurrence. Beyond the reference's surface (its only
aggregate is the per-file stat pass, SURVEY §2.4) but standard for an
analytics engine over event/order data, and each stays a hash-agg /
equi-join plan that shards by user/order key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu

US_PER_HOUR = 3_600_000_000


# ---------------------------------------------------------------------------
# funnel: of users who clicked, how many purchased within 1h of their
# FIRST click, how many ever purchased after it. One row out; the
# per-user flags are a min-agg + two boolean aggregates — no joins
# that multiply, conversion windows in integer µs.
# ---------------------------------------------------------------------------
@register(
    "events_funnel_conversion",
    sql=f"""
WITH c AS (SELECT user_id, MIN(epoch_us(ts)) AS first_click
           FROM events WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT user_id, epoch_us(ts) AS tsu
      FROM events WHERE event_type = 'purchase'),
per_user AS (
  SELECT c.user_id,
         MAX(CASE WHEN p.tsu >= c.first_click
                   AND p.tsu < c.first_click + {US_PER_HOUR}
                  THEN 1 ELSE 0 END) AS within_1h,
         MAX(CASE WHEN p.tsu >= c.first_click THEN 1 ELSE 0 END) AS ever_after
  FROM c LEFT JOIN p ON c.user_id = p.user_id
  GROUP BY c.user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_clickers,
       CAST(SUM(within_1h) AS BIGINT) AS converted_1h,
       CAST(SUM(ever_after) AS BIGINT) AS converted_ever,
       ((2 * CAST(SUM(within_1h) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS rate_1h,
       ((2 * CAST(SUM(ever_after) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS rate_ever
FROM per_user
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("tsu").alias("first_click"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "tsu")
    within = F.when(
        (F.col("tsu") >= F.col("first_click"))
        & (F.col("tsu") < F.col("first_click") + US_PER_HOUR),
        1,
    ).otherwise(0)
    after = F.when(F.col("tsu") >= F.col("first_click"), 1).otherwise(0)
    per_user = (
        clicks.join(purchases, "user_id", "left")
        .groupBy("user_id")
        .agg(F.max(within).alias("within_1h"), F.max(after).alias("ever_after"))
    )
    n = F.count(F.lit(1))
    return per_user.agg(
        n.alias("n_clickers"),
        F.sum("within_1h").alias("converted_1h"),
        F.sum("ever_after").alias("converted_ever"),
        ratio_round(F.sum("within_1h"), n).alias("rate_1h"),
        ratio_round(F.sum("ever_after"), n).alias("rate_ever"),
    )


# ---------------------------------------------------------------------------
# retention cohorts: customers grouped by first-order month, activity
# counted per month-age. Month arithmetic is integer (year*12 + month)
# on both engines — no interval/datediff semantics to disagree on.
# ---------------------------------------------------------------------------
@register(
    "orders_retention_cohort",
    sql="""
WITH m AS (SELECT o_custkey,
                  CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS ym
           FROM orders),
f AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM m GROUP BY o_custkey)
SELECT f.cohort_ym, CAST(m.ym - f.cohort_ym AS INTEGER) AS month_age,
       CAST(COUNT(DISTINCT m.o_custkey) AS BIGINT) AS active_customers
FROM m JOIN f ON m.o_custkey = f.o_custkey
GROUP BY f.cohort_ym, month_age
""",
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("int")
        .alias("ym"),
    )
    f = m.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    return (
        m.join(f, "o_custkey")
        .groupBy("cohort_ym", (F.col("ym") - F.col("cohort_ym")).cast("int").alias("month_age"))
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


# ---------------------------------------------------------------------------
# market basket: brand co-occurrence within an order. The pair join is
# blocked on l_orderkey (orders have bounded line counts, so the
# within-order pair fan-out is a small constant — linear at any scale);
# part is broadcast into the line scan.
# ---------------------------------------------------------------------------
@register(
    "orders_brand_basket",
    sql="""
WITH l AS (SELECT li.l_orderkey, p.p_brand
           FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS n_orders
FROM l a JOIN l b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY brand_a, brand_b
""",
)
def orders_brand_basket(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lines = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    a, b = lines.alias("a"), lines.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct(F.col("a.l_orderkey")).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# statistical moments: stddev/variance/correlation/covariance per group.
# skewness/kurtosis are deliberately absent — Spark computes population
# moments, DuckDB bias-corrected sample moments, so they can never
# hash-match; the four below have identical standard definitions.
# ---------------------------------------------------------------------------
@register(
    "agg_stats_moments",
    sql="""
SELECT l_linestatus,
       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
       ROUND(var_samp(l_extendedprice), 2) AS var_price,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
FROM lineitem GROUP BY l_linestatus
""",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
    )


# ---------------------------------------------------------------------------
# distribution windows: ntile quartiles + percent_rank/cume_dist of
# order prices within each priority. ntile is NOT tie-aware, so the
# window orders by (price, orderkey) to pin tie order identically on
# both engines; percent_rank/cume_dist are tie-aware by definition.
# ---------------------------------------------------------------------------
@register(
    "window_distribution_ranks",
    sql="""
WITH r AS (
  SELECT o_orderpriority,
         CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         o_totalprice
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
)
SELECT o_orderpriority, quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo_price,
       ROUND(MAX(o_totalprice), 2) AS hi_price,
       ((2 * CAST(SUM(CAST(FLOOR(pr * 1000000 + 0.5) AS BIGINT)) AS BIGINT) * 1000000 + CAST(COUNT(*) * 1000000 AS BIGINT)) // (2 * CAST(COUNT(*) * 1000000 AS BIGINT))) / 1000000.0 AS avg_pct_rank,
       ((2 * CAST(SUM(CAST(FLOOR(cd * 1000000 + 0.5) AS BIGINT)) AS BIGINT) * 1000000 + CAST(COUNT(*) * 1000000 AS BIGINT)) // (2 * CAST(COUNT(*) * 1000000 AS BIGINT))) / 1000000.0 AS avg_cume_dist
FROM r GROUP BY o_orderpriority, quartile
""",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    r = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return r.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo_price"),
        F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        ratio_round(
            F.sum(F.floor(F.col("pr") * 1_000_000 + 0.5).cast("long")),
            F.count(F.lit(1)) * 1_000_000,
        ).alias("avg_pct_rank"),
        ratio_round(
            F.sum(F.floor(F.col("cd") * 1_000_000 + 0.5).cast("long")),
            F.count(F.lit(1)) * 1_000_000,
        ).alias("avg_cume_dist"),
    )


# ---------------------------------------------------------------------------
# ordered string aggregation: per region, its nations as one sorted
# comma-joined string. Implemented engine-agnostically as
# sort_array(collect_list(...)) -> array_join, which is deterministic
# under any partitioning (the oracle's string_agg ORDER BY equivalent).
# ---------------------------------------------------------------------------
@register(
    "region_nation_list",
    sql="""
SELECT r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def region_nation_list(spark: SparkSession, sf_dir: str):
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        )
    )


# ---------------------------------------------------------------------------
# event-transition matrix: per (event_type → next event_type) counts
# over each user's time-ordered stream — first-order journey mining.
# One lead() window partitioned by user (shards by key at scale), one
# hash-agg; ties in ts broken by event_id for a total order.
# ---------------------------------------------------------------------------
@register(
    "events_transition_matrix",
    sql="""
WITH o AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM o WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    ev = with_tsu(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        o.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# linear-regression aggregates: OLS slope/intercept/R² of extendedprice
# on quantity per linestatus. Spark regr_* and DuckDB regr_* implement
# the same closed-form sums; rounding absorbs accumulation-order drift.
# ---------------------------------------------------------------------------
@register(
    "agg_regression_stats",
    sql="""
SELECT l_linestatus,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_qty,
       ROUND(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_price
FROM lineitem GROUP BY l_linestatus
""",
)
def agg_regression_stats(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_linestatus").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_qty"),
        F.round(F.regr_avgy(y, x), 2).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# conditional aggregates: count_if / bool_and / bool_or per priority —
# the guard-rail aggregation shapes (data-quality assertions compile to
# exactly these) over one scan, all partial/final hash agg.
# ---------------------------------------------------------------------------
@register(
    "agg_conditional",
    sql="""
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
       BOOL_AND(o_totalprice > 900) AS all_above_floor,
       BOOL_OR(o_totalprice > 400000) AS any_jumbo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_above_floor"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# forward-looking gaps via LEAD: per event type, the distribution of
# time-to-next-event within (user, type) — the mirror of the LAG gap
# scan, same single hash partitioning on the window keys.
# ---------------------------------------------------------------------------
@register(
    "events_next_gap",
    sql="""
WITH t AS (SELECT event_type, user_id, epoch_us(ts) AS tsu FROM events),
d AS (
  SELECT event_type,
         LEAD(tsu) OVER (PARTITION BY user_id, event_type ORDER BY tsu) - tsu AS fwd
  FROM t
)
SELECT event_type,
       CAST(COUNT(fwd) AS BIGINT) AS n_gaps,
       CAST(MIN(fwd) AS BIGINT) AS min_gap_us,
       CAST(MAX(fwd) AS BIGINT) AS max_gap_us,
       CAST(SUM(fwd) AS BIGINT) AS total_gap_us
FROM d GROUP BY event_type
""",
)
def events_next_gap(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    ev = with_tsu(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id", "event_type").orderBy("tsu")
    gaps = ev.withColumn("fwd", F.lead("tsu").over(w) - F.col("tsu"))
    return gaps.groupBy("event_type").agg(
        F.count("fwd").alias("n_gaps"),
        F.min("fwd").alias("min_gap_us"),
        F.max("fwd").alias("max_gap_us"),
        F.sum("fwd").alias("total_gap_us"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC analysis: smallest set of customers covering 50% of
# revenue — per-customer agg, revenue-desc cumulative share window,
# keep rows until the running share crosses the threshold. The window
# is over the AGGREGATE (one row per customer), not the fact table.
# ---------------------------------------------------------------------------
@register(
    "orders_pareto_share",
    sql="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(ROUND(ROUND(SUM(o_totalprice), 2) * 100) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, rev_c,
         SUM(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum_c,
         SUM(rev_c) OVER () AS tot_c,
         CAST(ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS rnk
  FROM per_cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MAX(rnk) AS BIGINT) AS deepest_rank,
       ROUND(MAX(cum_c) / 100.0, 2) AS covered_revenue
FROM ranked
WHERE (cum_c - rev_c) * 2 < tot_c
""",
)
def orders_pareto_share(spark: SparkSession, sf_dir: str):
    """How deep into the customer ranking (by revenue, desc) the first
    50% of total revenue reaches — ABC/Pareto analysis.

    The cumulative sum uses bucketed_cumsum (operators/windows.py): a
    distributed prefix sum — range-bucket by revenue, per-bucket
    running sums in parallel, bucket-prefix offsets from a
    num_buckets-row table — instead of the textbook global ORDER BY
    window, which executes on ONE partition and dies at 100 TB
    customer counts.

    The prefix sum runs over INTEGER CENTS (round(revenue*100) as
    long), not doubles: bucketed doubles associate additions in a
    different order than the oracle's sequential running SUM, and the
    strict boundary filter can flip the marginal customer on a last-ulp
    difference. Integers make the cumulative sum exact and the
    threshold comparison (2*(cum-rev) < tot) integer-only on both
    engines.
    """
    from dl_datalake_spark.operators.windows import bucketed_cumsum

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.round(F.sum("o_totalprice"), 2) * 100).cast("long").alias("rev_c")
    )
    ranked = bucketed_cumsum(per_cust, "rev_c", "o_custkey", num_buckets=32)
    return ranked.where(
        (F.col("cum_sum") - F.col("rev_c")) * 2 < F.col("tot_sum")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.max("rnk").alias("deepest_rank"),
        F.round(F.max("cum_sum") / 100.0, 2).alias("covered_revenue"),
    )


# ---------------------------------------------------------------------------
# incremental materialized-view maintenance: mergeable partial aggregates
# ---------------------------------------------------------------------------
@register(
    "agg_partial_merge",
    sql="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ((2 * CAST(SUM(l_quantity) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS avg_qty,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_order
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_partial_merge(spark: SparkSession, sf_dir: str):
    """Incremental materialized-view maintenance: per-shard PARTIAL
    aggregate states (sum/count/max — all mergeable monoids) merged
    into the final view, proving state merge == direct aggregation
    (the oracle computes the direct form). avg is derived from merged
    sum/count, never averaged across shards.

    This is the 100 TB refresh shape: each ingest batch / partition
    maintains its own partial state; a view refresh merges states
    instead of rescanning history. The shard key here (l_orderkey % 32)
    stands in for the ingest-batch id; at scale the partial table is
    O(groups x shards), orders of magnitude smaller than the fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    partial = li.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 32).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum("l_quantity").alias("p_sum"),
        F.max("l_orderkey").alias("p_max"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("p_count").alias("n_rows"),
        F.round(F.sum("p_sum"), 2).alias("sum_qty"),
        ratio_round(F.sum("p_sum"), F.sum("p_count")).alias("avg_qty"),
        F.max("p_max").alias("max_order"),
    )


# ---------------------------------------------------------------------------
# year-over-year growth: monthly revenue joined to the same month -1y
# ---------------------------------------------------------------------------
@register(
    "orders_yoy_growth",
    sql="""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
         ROUND(SUM(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
)
SELECT cur.ym, cur.rev,
       prev.rev AS rev_prev_year,
       ROUND((cur.rev - prev.rev) / prev.rev, 6) AS yoy
FROM m cur LEFT JOIN m prev ON prev.ym = cur.ym - 100
""",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str):
    """Year-over-year growth per calendar month. The -1y lookup is a
    self-JOIN on the yyyymm key, not LAG(12): a lag assumes twelve
    CONTIGUOUS prior rows and silently compares the wrong months the
    first time a month has no orders. The join is exact under gaps.

    Scale: both sides are the monthly AGGREGATE (84 rows for 7 years)
    — the fact table is scanned once; the self-join broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("ym")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    prev = m.select((F.col("ym") + 100).alias("ym_next"), F.col("rev").alias("rev_prev_year"))
    return (
        m.join(F.broadcast(prev), m.ym == prev.ym_next, "left")
        .select(
            "ym",
            "rev",
            "rev_prev_year",
            F.round((F.col("rev") - F.col("rev_prev_year")) / F.col("rev_prev_year"), 6).alias("yoy"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary)
# ---------------------------------------------------------------------------
@register(
    "orders_rfm_segments",
    sql="""
WITH now AS (SELECT MAX(o_orderdate) AS mx FROM orders),
per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate), (SELECT mx FROM now)) AS BIGINT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(SUM(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT CASE WHEN recency_days <= 90 THEN 'hot'
              WHEN recency_days <= 365 THEN 'warm' ELSE 'cold' END AS r_seg,
         CASE WHEN frequency >= 20 THEN 'loyal'
              WHEN frequency >= 8 THEN 'repeat' ELSE 'occasional' END AS f_seg,
         CASE WHEN monetary >= 1000000 THEN 'platinum'
              WHEN monetary >= 100000 THEN 'gold' ELSE 'standard' END AS m_seg,
         monetary
  FROM per_cust
)
SELECT r_seg, f_seg, m_seg,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(monetary), 2) AS segment_revenue
FROM seg GROUP BY 1, 2, 3
""",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str):
    """RFM segmentation with FIXED thresholds, not ntile quartiles —
    deliberate at scale twice over: quantile cuts need either a global
    ntile window (single-partition) or percentile thresholds whose
    interpolated values make borderline membership engine-dependent;
    fixed business thresholds are a broadcast-free projection and mean
    the same segment names mean the same thing across runs and corpus
    sizes. 'now' anchors to max(o_orderdate) — a 1-row broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    now = orders.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(now))
        .withColumn("recency_days", F.datediff(F.col("mx"), F.col("last_order")).cast("long"))
    )
    r_seg = (
        F.when(F.col("recency_days") <= 90, "hot")
        .when(F.col("recency_days") <= 365, "warm")
        .otherwise("cold")
    )
    f_seg = (
        F.when(F.col("frequency") >= 20, "loyal")
        .when(F.col("frequency") >= 8, "repeat")
        .otherwise("occasional")
    )
    m_seg = (
        F.when(F.col("monetary") >= 1_000_000, "platinum")
        .when(F.col("monetary") >= 100_000, "gold")
        .otherwise("standard")
    )
    return (
        per_cust.select(
            r_seg.alias("r_seg"), f_seg.alias("f_seg"), m_seg.alias("m_seg"), "monetary"
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("segment_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# distribution drift: month-over-month order-priority mix shift (L1)
# ---------------------------------------------------------------------------
@register(
    "orders_priority_mix_shift",
    sql="""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
         o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT ym, CAST(SUM(n) AS BIGINT) AS t FROM m GROUP BY ym),
share AS (
  SELECT m.ym, m.prio,
         (2 * m.n * 1000000 + tot.t) // (2 * tot.t) AS micros
  FROM m JOIN tot ON m.ym = tot.ym
),
l1 AS (
  SELECT cur.ym,
         CAST(SUM(ABS(cur.micros - COALESCE(prev.micros, 0))) AS BIGINT) AS l1_micros
  FROM share cur
  LEFT JOIN share prev ON prev.ym = CASE WHEN cur.ym % 100 = 1
                                         THEN cur.ym - 89 ELSE cur.ym - 1 END
                      AND prev.prio = cur.prio
  GROUP BY cur.ym
)
SELECT ym, l1_micros FROM l1
""",
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str):
    """Distribution-drift monitor: the L1 distance between consecutive
    months' order-priority mix, in EXACT integer micros end-to-end —
    shares are integer half-up micro-ratios (functions/exact), so the
    drift metric never touches a float and hash-matches bit-for-bit.
    This is the ingest-monitoring shape that catches a source changing
    its composition (a crawler suddenly over-delivering one domain)
    one aggregation downstream of the raw counts.

    Plan: one fact scan → (month, priority) hash agg; everything after
    runs on the month-level aggregate (dozens of rows).
    """
    from dl_datalake_spark.functions.exact import ratio_units

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("ym"),
        F.col("o_orderpriority").alias("prio"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = m.groupBy("ym").agg(F.sum("n").alias("t"))
    share = m.join(tot, "ym").select(
        "ym", "prio", ratio_units(F.col("n"), F.col("t")).alias("micros")
    )
    prev_ym = F.when(F.col("ym") % 100 == 1, F.col("ym") - 89).otherwise(
        F.col("ym") - 1
    )
    cur = share.select("ym", "prio", "micros", prev_ym.alias("prev_ym"))
    prev = share.select(
        F.col("ym").alias("p_ym"), F.col("prio").alias("p_prio"),
        F.col("micros").alias("p_micros"),
    )
    return (
        cur.join(
            prev,
            (F.col("prev_ym") == F.col("p_ym")) & (F.col("prio") == F.col("p_prio")),
            "left",
        )
        .groupBy("ym")
        .agg(
            F.sum(
                F.abs(F.col("micros") - F.coalesce(F.col("p_micros"), F.lit(0)))
            ).alias("l1_micros")
        )
    )


# ---------------------------------------------------------------------------
# chi-square independence: is part type independent of brand?
# ---------------------------------------------------------------------------
@register(
    "part_brand_type_chi2",
    sql="""
WITH obs AS (
  SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS o
  FROM part GROUP BY 1, 2
),
rt AS (SELECT p_brand, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
ct AS (SELECT p_type, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT obs.o, rt.r * ct.c * 1.0 / n.n AS e
  FROM obs JOIN rt USING (p_brand) JOIN ct USING (p_type), n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2,
       CAST((SELECT COUNT(*) - 1 FROM rt) * (SELECT COUNT(*) - 1 FROM ct) AS BIGINT)
         AS dof
FROM cells
""",
)
def part_brand_type_chi2(spark: SparkSession, sf_dir: str):
    """Pearson chi-square independence test as pure aggregation: the
    brand x type contingency table, expected counts from the
    marginals, chi2 = sum((o-e)^2/e) with (rows-1)(cols-1) degrees of
    freedom. The statistical-testing shape for "did this categorical
    mix change" questions — one fact scan, three tiny aggregates of
    the contingency table, every join on a marginal key or a 1-row
    broadcast.
    """
    part = load_table(spark, sf_dir, "part")
    obs = part.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("p_brand").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("p_type").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(rt, "p_brand")
        .join(F.broadcast(ct), "p_type")
        .crossJoin(F.broadcast(n))
        .select("o", (F.col("r") * F.col("c") / F.col("n")).alias("e"))
    )
    dof = (
        rt.agg((F.count(F.lit(1)) - 1).alias("rr"))
        .crossJoin(ct.agg((F.count(F.lit(1)) - 1).alias("cc")))
        .select((F.col("rr") * F.col("cc")).alias("dof"))
    )
    stat = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")), 4
        ).alias("chi2"),
    )
    return stat.crossJoin(F.broadcast(dof))


# ---------------------------------------------------------------------------
# Gini concentration of supplier balances per nation — exact integers
# ---------------------------------------------------------------------------
@register(
    "supplier_balance_gini",
    sql="""
WITH s AS (
  SELECT s_nationkey, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier WHERE s_acctbal >= 0
),
r AS (
  SELECT s_nationkey, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                 ORDER BY cents, s_nationkey) AS BIGINT) AS rnk
  FROM s
),
g AS (
  SELECT s_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS tot,
         CAST(SUM(rnk * cents) AS BIGINT) AS wsum
  FROM r GROUP BY 1
)
SELECT s_nationkey, n, tot,
       ((2 * (2 * wsum - (n + 1) * tot) * 1000000 + n * tot)
        // (2 * n * tot)) / 1e6 AS gini
FROM g WHERE tot > 0
""",
)
def supplier_balance_gini(spark: SparkSession, sf_dir: str):
    """Gini coefficient of supplier account balances per nation,
    computed ENTIRELY in integers: balances as cents, the classic
    rank formulation G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    over ascending-sorted cents, and the final ratio through exact
    half-up division — an inequality/concentration metric with zero
    float drift surface. The rank window partitions by nation, so the
    sort shards; negative balances (ill-defined for Gini) are
    excluded up front.
    """
    from pyspark.sql import Window

    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") >= 0)
        .select(
            "s_nationkey",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("s_nationkey").orderBy("cents", "s_nationkey")
    r = s.withColumn("rnk", F.row_number().over(w).cast("long"))
    g = r.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("rnk") * F.col("cents")).alias("wsum"),
    )
    num = 2 * F.col("wsum") - (F.col("n") + 1) * F.col("tot")
    return g.where(F.col("tot") > 0).select(
        "s_nationkey",
        "n",
        "tot",
        ratio_round(num, F.col("n") * F.col("tot")).alias("gini"),
    )


# ---------------------------------------------------------------------------
# customer order cadence: inter-arrival gap distribution
# ---------------------------------------------------------------------------
@register(
    "orders_interarrival_stats",
    sql="""
WITH g AS (
  SELECT o_custkey,
         CAST(date_diff('day',
              LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS gap_days
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(gap_days, 0.5), 4) AS median_gap,
       ROUND(quantile_cont(gap_days, 0.9), 4) AS p90_gap,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap
FROM g WHERE gap_days IS NOT NULL
""",
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str):
    """Customer order-cadence distribution: per-customer inter-arrival
    gaps in days (lag over the per-customer timeline — partitioned, no
    global sort), then corpus-level gap percentiles. The churn-model
    feature a retention pipeline derives before anything else.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.percentile("gap_days", 0.5), 4).alias("median_gap"),
        F.round(F.percentile("gap_days", 0.9), 4).alias("p90_gap"),
        F.max("gap_days").alias("max_gap"),
    )


# ---------------------------------------------------------------------------
# revenue rollup with grouping() markers and exact share-of-parent
# ---------------------------------------------------------------------------
@register(
    "region_revenue_rollup_share",
    sql="""
WITH rev AS (
  SELECT r.r_name, n.n_name,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
ru AS (
  SELECT r_name, n_name,
         CAST(GROUPING(r_name) AS INTEGER) AS g_region,
         CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM rev GROUP BY ROLLUP (r_name, n_name)
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev)
SELECT r_name, n_name, g_region, g_nation,
       ROUND(cents / 100.0, 2) AS revenue,
       ((2 * cents * 1000000 + tot.t) // (2 * tot.t)) / 1e6 AS share_of_total
FROM ru, tot
""",
)
def region_revenue_rollup_share(spark: SparkSession, sf_dir: str):
    """ROLLUP with explicit grouping() markers — the disambiguator
    between 'nation literally named NULL' and 'the nation-level
    subtotal row', which the rollup queries above leave implicit —
    plus each row's exact-micros share of total revenue. Money rides
    as integer cents from the first aggregate on, so subtotals,
    grand total, and shares are all drift-free.
    """
    t = {n: load_table(spark, sf_dir, n) for n in ("orders", "customer", "nation", "region")}
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    ru = rev.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.sum("cents").alias("cents"),
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    return ru.crossJoin(F.broadcast(tot)).select(
        "r_name",
        "n_name",
        "g_region",
        "g_nation",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        ratio_round(F.col("cents"), F.col("t")).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# customer balance quartiles per market segment (array percentiles)
# ---------------------------------------------------------------------------
@register(
    "customer_balance_quartiles",
    sql="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(c_acctbal, 0.25), 4) AS q1,
       ROUND(quantile_cont(c_acctbal, 0.50), 4) AS q2,
       ROUND(quantile_cont(c_acctbal, 0.75), 4) AS q3,
       ROUND(quantile_cont(c_acctbal, 0.75) - quantile_cont(c_acctbal, 0.25), 4)
         AS iqr
FROM customer GROUP BY c_mktsegment
""",
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str):
    """Balance quartiles + IQR per market segment in ONE per-group sort:
    the array form of percentile serves all three quantiles (the
    scalar-call form sorts once per quantile — measured 2.4x slower on
    the quantile-audit query). IQR derives from the same array, so the
    whole profile costs one pass.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(
            "c_acctbal", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("q"),
    )
    return g.select(
        "c_mktsegment",
        "n",
        F.round(F.col("q")[0], 4).alias("q1"),
        F.round(F.col("q")[1], 4).alias("q2"),
        F.round(F.col("q")[2], 4).alias("q3"),
        F.round(F.col("q")[2] - F.col("q")[0], 4).alias("iqr"),
    )


# ---------------------------------------------------------------------------
# market-concentration audit: Herfindahl-Hirschman index of supplier
# revenue share within each nation. Shares are quantized to exact
# integer micros BEFORE squaring, so the HHI is a pure integer sum
# (u_i^2 <= 1e12, hundreds of suppliers per nation -> far inside long)
# divided once by 1e12 at the end — no float accumulation anywhere.
# ---------------------------------------------------------------------------
@register(
    "supplier_concentration_hhi",
    sql=f"""
WITH rev AS (
  SELECT n.n_name,
         l.l_suppkey,
         CAST(ROUND(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) * 100)
              AS BIGINT) AS rev_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name, l.l_suppkey),
tot AS (
  SELECT n_name, CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM rev GROUP BY n_name),
sh AS (
  SELECT rev.n_name,
         {{share_u}} AS share_u
  FROM rev JOIN tot USING (n_name))
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       MAX(share_u) / 1000000.0 AS top_share,
       CAST(SUM(share_u * share_u) AS BIGINT) / 1000000000000.0 AS hhi
FROM sh GROUP BY n_name ORDER BY n_name
""".format(share_u="(2 * CAST(rev_c AS BIGINT) * 1000000 + CAST(tot_c AS BIGINT)) // (2 * CAST(tot_c AS BIGINT))"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.functions.exact import ratio_units

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.round(
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                * 100
            )
            .cast("long")
            .alias("rev_c")
        )
    )
    tot = rev.groupBy("n_name").agg(F.sum("rev_c").alias("tot_c"))
    sh = rev.join(tot, "n_name").withColumn(
        "share_u", ratio_units(F.col("rev_c"), F.col("tot_c"))
    )
    return (
        sh.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (F.max("share_u") / F.lit(1e6)).alias("top_share"),
            (F.sum(F.col("share_u") * F.col("share_u")) / F.lit(1e12)).alias("hhi"),
        )
        .orderBy("n_name")
    )
