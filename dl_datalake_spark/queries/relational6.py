"""Round-4 analytic additions: graph power-iteration, exact weighted
moving averages, array-function battery, robust (median/MAD) stats.

Each is a shape the engine should own at 100 TB and the reference
cannot express at all (its query surface is scan/filter/resample,
SURVEY §2): one PageRank step is two hash joins + two hash aggs (the
building block of iterative graph jobs on a relational engine), the
EWMA is pure window lag arithmetic in integer micro-units, the array
battery runs inside codegen (no explode round-trip for the per-order
ops), and MAD is the classic two-phase holistic aggregate (median,
broadcast back, median of deviations).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table, with_tsu


# ---------------------------------------------------------------------------
# one PageRank power-iteration over the part co-purchase graph.
# Nodes = parts; edges = distinct (a,b) pairs co-occurring in an order.
# Fully integer-exact: each neighbor contributes round(1e6/out_degree)
# micro-units; pr_e8 = 0.15*1e8 + 0.85 * (sum of contributions) * 100
# = 15_000_000 + 85 * S, with S summed exactly as BIGINT.
# Scale shape: per-order self-join (bounded by lines-per-order), then
# hash aggs keyed by part — shards cleanly; no iteration-order floats.
# ---------------------------------------------------------------------------
@register(
    "part_copurchase_pagerank_step",
    sql="""
WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM pp a JOIN pp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
contrib AS (
  SELECT e.dst AS part,
         (2 * 1000000 + d) // (2 * d) AS u
  FROM e JOIN deg USING (src))
SELECT part,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(15000000 + 85 * SUM(u) AS BIGINT) AS pr_e8
FROM contrib
GROUP BY part
ORDER BY pr_e8 DESC, part
LIMIT 20
""",
)
def part_copurchase_pagerank_step(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    pp = li.select("l_orderkey", "l_partkey").distinct()
    a = pp.alias("a")
    b = pp.alias("b")
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # round(1e6/d) half-up via integer arithmetic (exact both engines)
    contrib = e.join(deg, "src").select(
        F.col("dst").alias("part"),
        ((F.lit(2_000_000) + F.col("d")) / (2 * F.col("d")))
        .cast("long")
        .alias("_q"),  # floor of the double quotient; exact: d <= ~1e5
    )
    # floor((2m+d)/(2d)) == round(m/d) half-up; the double division is
    # exact here because numerator < 2^53 by orders of magnitude
    return (
        contrib.withColumnRenamed("_q", "u")
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            (F.lit(15_000_000) + 85 * F.sum("u")).cast("long").alias("pr_e8"),
        )
        .orderBy(F.desc("pr_e8"), F.asc("part"))
        .limit(20)
        .select("part", "n_in", "pr_e8")
    )


# ---------------------------------------------------------------------------
# exact weighted moving average (EWMA-style 8/4/2/1 kernel) per user in
# integer micro-units: value -> round(v*1e6), kernel weights halve per
# lag, denominator adapts to missing lags at the partition head, final
# division is the exact half-up integer ratio. No float accumulates
# across rows, so the result is bit-identical cross-engine.
# ---------------------------------------------------------------------------
@register(
    "events_ewma_weighted",
    sql="""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS tsu,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vu
  FROM events WHERE event_type = 'purchase'),
l AS (
  SELECT user_id, tsu, vu,
         lag(vu, 1) OVER w AS v1,
         lag(vu, 2) OVER w AS v2,
         lag(vu, 3) OVER w AS v3
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
wma AS (
  SELECT user_id, tsu,
         (2 * (8 * vu + 4 * COALESCE(v1, 0) + 2 * COALESCE(v2, 0) + COALESCE(v3, 0))
            + (8 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
                 + CASE WHEN v2 IS NULL THEN 0 ELSE 2 END
                 + CASE WHEN v3 IS NULL THEN 0 ELSE 1 END))
         // (2 * (8 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
                    + CASE WHEN v2 IS NULL THEN 0 ELSE 2 END
                    + CASE WHEN v3 IS NULL THEN 0 ELSE 1 END)) AS wma_u,
         row_number() OVER (PARTITION BY user_id ORDER BY tsu DESC) AS rn
  FROM l)
SELECT user_id, tsu AS last_tsu, CAST(wma_u AS BIGINT) AS wma_u
FROM wma WHERE rn = 1
ORDER BY wma_u DESC, user_id
LIMIT 20
""",
)
def events_ewma_weighted(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    v = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "tsu",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("vu"),
    )
    w = Window.partitionBy("user_id").orderBy("tsu")
    l = v.select(
        "user_id",
        "tsu",
        "vu",
        F.lag("vu", 1).over(w).alias("v1"),
        F.lag("vu", 2).over(w).alias("v2"),
        F.lag("vu", 3).over(w).alias("v3"),
    )
    den = (
        F.lit(8)
        + F.when(F.col("v1").isNull(), 0).otherwise(4)
        + F.when(F.col("v2").isNull(), 0).otherwise(2)
        + F.when(F.col("v3").isNull(), 0).otherwise(1)
    )
    num = (
        8 * F.col("vu")
        + 4 * F.coalesce(F.col("v1"), F.lit(0))
        + 2 * F.coalesce(F.col("v2"), F.lit(0))
        + F.coalesce(F.col("v3"), F.lit(0))
    )
    # exact half-up integer ratio: floor((2*num + den) / (2*den));
    # magnitudes stay < 2^53 so the double quotient floors exactly
    wma_u = F.floor((2 * num + den) / (2 * den)).cast("long")
    rw = Window.partitionBy("user_id").orderBy(F.desc("tsu"))
    return (
        l.withColumn("wma_u", wma_u)
        .withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("tsu").alias("last_tsu"), "wma_u")
        .orderBy(F.desc("wma_u"), F.asc("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# array-function battery per order: sorted quantity vector, top-3 sum,
# has-max-quantity flag, line count — collect_list + array_sort +
# slice + aggregate on the Spark side (codegen array exprs, no second
# explode), list_sort/list_slice/list_sum in DuckDB. Quantities are
# integral doubles, so the sums are exact.
# ---------------------------------------------------------------------------
@register(
    "orders_quantity_array_ops",
    sql="""
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list(l_quantity)) AS qs
  FROM lineitem GROUP BY l_orderkey),
m AS (
  SELECT l_orderkey,
         CAST(len(qs) AS INTEGER) AS n_lines,
         CAST(list_sum(list_slice(list_reverse(list_sort(qs)), 1, 3)) AS BIGINT)
           AS top3_qty,
         CAST(list_contains(qs, 50.0) AS BOOLEAN) AS has_qty50
  FROM per_order)
SELECT l_orderkey, n_lines, top3_qty, has_qty50
FROM m
ORDER BY top3_qty DESC, l_orderkey
LIMIT 25
""",
)
def orders_quantity_array_ops(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qs")
    )
    desc_qs = F.reverse(F.col("qs"))
    return (
        per.select(
            "l_orderkey",
            F.size("qs").alias("n_lines"),
            F.aggregate(
                F.slice(desc_qs, 1, 3), F.lit(0.0), lambda acc, x: acc + x
            )
            .cast("long")
            .alias("top3_qty"),
            F.array_contains("qs", 50.0).alias("has_qty50"),
        )
        .orderBy(F.desc("top3_qty"), F.asc("l_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# robust statistics: exact median + MAD (median absolute deviation) of
# extended price per return flag. Two-phase holistic aggregate: group
# medians via exact interpolating percentile, broadcast join back,
# median of |x - med|. Prices are 2-decimal, so both engines'
# linear-interpolated medians land on exact .xx5-at-worst values;
# work in integer cents to keep the interpolation itself exact.
# ---------------------------------------------------------------------------
@register(
    "lineitem_mad_robust",
    sql="""
WITH c AS (
  SELECT l_returnflag, CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem),
med AS (
  SELECT l_returnflag, quantile_cont(cents, 0.5) AS med_c
  FROM c GROUP BY l_returnflag),
dev AS (
  SELECT c.l_returnflag,
         ABS(c.cents - m.med_c) AS adev
  FROM c JOIN med m USING (l_returnflag))
SELECT d.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(m.med_c) / 100.0, 2) AS median_price,
       ROUND(quantile_cont(d.adev, 0.5) / 100.0, 2) AS mad_price
FROM dev d JOIN med m USING (l_returnflag)
GROUP BY d.l_returnflag
ORDER BY d.l_returnflag
""",
)
def lineitem_mad_robust(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    med = c.groupBy("l_returnflag").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_c")
    )
    dev = c.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", "med_c", F.abs(F.col("cents") - F.col("med_c")).alias("adev")
    )
    return (
        dev.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med_c") / 100.0, 2).alias("median_price"),
            F.round(F.percentile("adev", F.lit(0.5)) / 100.0, 2).alias("mad_price"),
        )
        .orderBy("l_returnflag")
        .select("l_returnflag", "n", "median_price", "mad_price")
    )


# ---------------------------------------------------------------------------
# sequential path analytics: each user's first-3 event-type path and
# the most common paths. Per-user ordered collect (sorted by (ts,
# event_id) so the sequence is deterministic under any partitioning),
# array slice + join inside codegen, then a hash-agg over path strings.
# The classic "top user journeys" query — a window-free two-agg plan
# that shards by user then by path at any corpus size.
# ---------------------------------------------------------------------------
@register(
    "events_user_path_topk",
    sql="""
WITH paths AS (
  SELECT user_id,
         array_to_string(
           list_slice(list(event_type ORDER BY epoch_us(ts), event_id), 1, 3),
           '>') AS path
  FROM events GROUP BY user_id)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path
LIMIT 10
""",
)
def events_user_path_topk(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    paths = ev.groupBy("user_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tsu", "event_id", "event_type"))
                    ),
                    lambda s: s.event_type,
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# out-of-orderness audit: per user, how late events arrive relative to
# the max event-time already seen. This is the measurement that SIZES A
# STREAMING WATERMARK: the histogram's tail is the lateness bound
# `withWatermark` must cover before state can be dropped
# (streaming/ingest.py uses 10s-of-minutes defaults; this query is how
# you'd tune them per corpus). The synthetic events table is generated
# time-sorted, so arrival order is simulated with a deterministic LCG
# permutation of event_id (computable identically in both engines) —
# on a real ingest you'd use the arrival/file sequence. Shape: one
# per-user running-max window + one hash-agg over log2 buckets.
# ---------------------------------------------------------------------------
@register(
    "events_out_of_order_audit",
    sql="""
WITH l AS (
  SELECT user_id,
         epoch_us(ts) AS tsu,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY (event_id * 48271) % 9973, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS seen_max
  FROM events),
lat AS (
  SELECT CASE
           WHEN seen_max IS NULL OR seen_max <= tsu THEN -1
           ELSE CAST(FLOOR(LOG2((seen_max - tsu) / 1000000.0 + 1.0)) AS INTEGER)
         END AS late_bucket
  FROM l)
SELECT late_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM lat
GROUP BY late_bucket
ORDER BY late_bucket
""",
)
def events_out_of_order_audit(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    arrival = (F.col("event_id") * 48271) % 9973
    w = (
        Window.partitionBy("user_id")
        .orderBy(arrival, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    l = ev.select(
        "tsu", F.max("tsu").over(w).alias("seen_max")
    )
    late_s = (F.col("seen_max") - F.col("tsu")) / 1_000_000.0
    bucket = (
        F.when(
            F.col("seen_max").isNull() | (F.col("seen_max") <= F.col("tsu")), -1
        )
        .otherwise(F.floor(F.log2(late_s + 1.0)).cast("int"))
        .alias("late_bucket")
    )
    return (
        l.select(bucket)
        .groupBy("late_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("late_bucket")
    )


# ---------------------------------------------------------------------------
# clustering quality: centroid-based silhouette per label. a = distance
# to own centroid, b = nearest other centroid, s = (b-a)/max(a,b).
# INTEGER-EXACT pipeline: raw float32 values quantize to micro-units
# (deterministic — no aggregation involved), per-dim centroid means are
# exact half-up integer ratios, squared distances are integer sums of
# 64 integer squares (< 2^63), and only then does sqrt produce a double
# — of identical integers on both engines, so every downstream value is
# bit-identical (a float AVG-based variant flipped one micro at sf0.01).
# Shape: one explode agg for centroids (labels x dims rows), then a
# broadcast of ~10 centroid rows against the corpus — no pairwise
# vector distances anywhere.
# ---------------------------------------------------------------------------
@register(
    "emb_silhouette_by_label",
    sql="""
WITH ex0 AS (
  SELECT label,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings),
ex AS (SELECT label, CAST(FLOOR(v * 1000000 + 0.5) AS BIGINT) AS vu, i FROM ex0),
d AS (SELECT label, i,
             -- exact half-up mean; the +10^7 shift keeps the numerator
             -- nonnegative (DuckDB's // truncates toward zero while
             -- Spark's floor() floors — they only agree on nonnegatives)
             (2 * CAST(SUM(vu + 10000000) AS BIGINT) + CAST(COUNT(*) AS BIGINT))
               // (2 * CAST(COUNT(*) AS BIGINT)) - 10000000 AS mean_u
      FROM ex GROUP BY label, i),
cent AS (SELECT label AS clabel, list(mean_u ORDER BY i) AS cu FROM d GROUP BY label),
e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS vu
      FROM embeddings),
dist AS (
  SELECT e.vec_id, e.label, c.clabel,
         list_sum([(e.vu[j] - c.cu[j]) * (e.vu[j] - c.cu[j])
                   for j in generate_series(1, len(e.vu))]) AS d2
  FROM e CROSS JOIN cent c),
ab AS (
  SELECT vec_id, label,
         MIN(CASE WHEN clabel = label THEN d2 END) AS a2,
         MIN(CASE WHEN clabel <> label THEN d2 END) AS b2
  FROM dist GROUP BY vec_id, label),
s AS (SELECT label,
             CAST(FLOOR((SQRT(b2) - SQRT(a2)) / SQRT(GREATEST(a2, b2)) * 1000000 + 0.5) AS BIGINT) AS su
      FROM ab),
"""
    + """
agg AS (
  -- su >= -10^6, so the +10^6 shift keeps the ratio numerator
  -- nonnegative (floor/truncate divergence again)
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(su + 1000000) AS BIGINT) AS ssum
  FROM s GROUP BY label)
SELECT label, n,
       (((2 * ssum * 1000000 + n) // (2 * n)) - CAST(1000000000000 AS BIGINT)) / 1000000.0
         AS avg_silhouette
FROM agg ORDER BY label
""",
)
def emb_silhouette_by_label(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.queries.registry import ratio_round

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    to_u = lambda c: F.floor(c.cast("double") * 1_000_000 + 0.5).cast("long")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("i0", "v_raw")
    ).select("label", (F.col("i0") + 1).alias("i"), to_u(F.col("v_raw")).alias("vu"))
    # exact half-up integer mean per (label, dim); shifted by +10^7 so
    # the numerator is nonnegative — floor and truncate agree there
    # (DuckDB's // truncates toward zero on negatives, Spark floors)
    shift = F.lit(10_000_000)
    d = ex.groupBy("label", "i").agg(
        (
            F.floor(
                (2 * F.sum(F.col("vu") + shift) + F.count(F.lit(1)))
                / (2 * F.count(F.lit(1)))
            ).cast("long")
            - shift
        ).alias("mean_u")
    )
    cent = d.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mean_u"))), lambda st: st.mean_u
        ).alias("cu")
    ).select(F.col("label").alias("clabel"), "cu")
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: to_u(x)).alias("vu"),
    )
    d2 = F.aggregate(
        F.zip_with("vu", "cu", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = e.crossJoin(F.broadcast(cent)).select("vec_id", "label", "clabel", d2.alias("d2"))
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d2"))).alias("a2"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))).alias("b2"),
    )
    s = ab.select(
        "label",
        F.floor(
            (F.sqrt("b2") - F.sqrt("a2"))
            / F.sqrt(F.greatest("a2", "b2"))
            * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("su"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                ratio_round(F.sum(F.col("su") + F.lit(1_000_000)), F.count(F.lit(1)))
                - F.lit(1_000_000.0)
            ).alias("avg_silhouette"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# TWO damped PageRank iterations, integer-exact end to end — pins that
# ITERATION (rank feedback through the contribution join) matches
# cross-engine, not just one step. Iteration 1 contributions are
# round(1e6/deg) micro-units; pr1_e8 = 15e6 + 85*S1 (exact). Iteration
# 2 ships u2 = round(pr1_e8/deg) — nonnegative, so the half-up integer
# division agrees between engines — and damps with
# round(85*S2/100): pr2_e8 = 15_000_000 + that. The operator module
# (operators/graph.py pagerank) runs the float N-iteration form; this
# query is its exactness contract at depth 2. Envelope: the inline
# floor((2*num+den)/(2*den)) is exact while 2*num < 2^53 — S2 stays
# under ~5e13 until a vertex's in-degree reaches ~500k; past that use
# functions/exact.ratio_units, which corrects the double quotient with
# exact long comparisons.
# ---------------------------------------------------------------------------
@register(
    "part_copurchase_pagerank_iter2",
    sql="""
WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM pp a JOIN pp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
c1 AS (
  SELECT e.dst AS part, (2 * 1000000 + d) // (2 * d) AS u
  FROM e JOIN deg USING (src)),
pr1 AS (
  SELECT deg.src AS part, d,
         15000000 + 85 * COALESCE(s.s1, 0) AS pr1_e8
  FROM deg LEFT JOIN (SELECT part, CAST(SUM(u) AS BIGINT) AS s1
                      FROM c1 GROUP BY part) s ON s.part = deg.src),
c2 AS (
  SELECT e.dst AS part,
         (2 * pr1_e8 + d) // (2 * d) AS u2
  FROM e JOIN pr1 ON e.src = pr1.part),
pr2 AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS n_in,
         CAST(15000000 + (2 * 85 * CAST(SUM(u2) AS BIGINT) + 100) // 200 AS BIGINT)
           AS pr2_e8
  FROM c2 GROUP BY part)
SELECT part, n_in, pr2_e8
FROM pr2
ORDER BY pr2_e8 DESC, part
LIMIT 20
""",
)
def part_copurchase_pagerank_iter2(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    pp = li.select("l_orderkey", "l_partkey").distinct()
    e = (
        pp.alias("a")
        .join(pp.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    half_up = lambda num, den: F.floor((2 * num + den) / (2 * den)).cast("long")
    c1 = e.join(deg, "src").select(
        F.col("dst").alias("part"), half_up(F.lit(1_000_000), F.col("d")).alias("u")
    )
    s1 = c1.groupBy("part").agg(F.sum("u").alias("s1"))
    pr1 = deg.join(s1, deg["src"] == s1["part"], "left").select(
        F.col("src").alias("part"),
        "d",
        (F.lit(15_000_000) + 85 * F.coalesce(F.col("s1"), F.lit(0))).alias("pr1_e8"),
    )
    c2 = e.join(pr1, e["src"] == pr1["part"]).select(
        F.col("dst").alias("p2"), half_up(F.col("pr1_e8"), F.col("d")).alias("u2")
    )
    return (
        c2.groupBy(F.col("p2").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            (
                F.lit(15_000_000)
                + F.floor((2 * 85 * F.sum("u2") + 100) / 200).cast("long")
            )
            .cast("long")
            .alias("pr2_e8"),
        )
        .orderBy(F.desc("pr2_e8"), F.asc("part"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# activity heatmap: day-of-week x hour event counts with per-cell share
# of the week in exact micros — the ops-dashboard query every event
# store serves. Pure integer date-part bucketing (epoch-µs division,
# no timezone ambiguity) + one hash-agg; shards by (dow, hour) at any
# volume.
# ---------------------------------------------------------------------------
@register(
    "events_dow_hour_heatmap",
    sql="""
WITH b AS (
  SELECT ((epoch_us(ts) // 3600000000 // 24 + 4) % 7) AS dow,  -- epoch day 0 = Thursday
         (epoch_us(ts) // 3600000000) % 24 AS hour
  FROM events),
c AS (SELECT dow, hour, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY dow, hour),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT CAST(dow AS INTEGER) AS dow, CAST(hour AS INTEGER) AS hour, n,
       ((2 * n * 1000000 + total) // (2 * total)) / 1000000.0 AS share
FROM c, t
ORDER BY dow, hour
""",
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.queries.registry import ratio_round

    ev = with_tsu(load_table(spark, sf_dir, "events"))
    hours = (F.col("tsu") / 3_600_000_000).cast("long")
    b = ev.select(
        (((hours / 24).cast("long") + 4) % 7).cast("int").alias("dow"),
        (hours % 24).cast("int").alias("hour"),
    )
    c = b.groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("n"))
    total = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n",
            ratio_round(F.col("n"), F.col("total")).alias("share"),
        )
        .orderBy("dow", "hour")
    )


# ---------------------------------------------------------------------------
# robust anomaly detection on the event time series: hourly counts,
# median + MAD over the series (discrete quantile — exact positional
# parity with DuckDB's quantile_disc), hours flagged beyond
# 3 * MAD * 1.4826. Counts are integers, so every statistic is exact;
# the series itself is small (hours), so the holistic median runs on
# the aggregated table, never the events.
# ---------------------------------------------------------------------------
@register(
    "events_hourly_anomaly_mad",
    sql="""
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_id,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY hour_id),
m AS (SELECT quantile_disc(n, 0.5) AS med FROM h),
d AS (SELECT h.hour_id, h.n, ABS(h.n - m.med) AS adev FROM h, m),
md AS (SELECT quantile_disc(adev, 0.5) AS mad FROM d)
SELECT d.hour_id, d.n,
       CAST(m.med AS BIGINT) AS med,
       CAST(md.mad AS BIGINT) AS mad,
       (ABS(d.n - m.med) * 10000) > (3 * 14826 * md.mad) AS is_anomaly
FROM d, m, md
ORDER BY d.hour_id
""",
)
def events_hourly_anomaly_mad(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    h = ev.groupBy(
        (F.col("tsu") / 3_600_000_000).cast("long").alias("hour_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    # discrete median == element at floor((cnt-1)/2)+1 of the sorted
    # list (quantile_disc positional parity, verify-skill contract)
    def disc_median(col):
        arr = F.array_sort(F.collect_list(col))
        return F.element_at(arr, (F.floor((F.size(arr) - 1) / 2) + 1).cast("int"))

    med = h.agg(disc_median(F.col("n")).alias("med"))
    d = h.crossJoin(F.broadcast(med)).select(
        "hour_id", "n", "med", F.abs(F.col("n") - F.col("med")).alias("adev")
    )
    mad = d.agg(disc_median(F.col("adev")).alias("mad"))
    return (
        d.crossJoin(F.broadcast(mad))
        .select(
            "hour_id",
            "n",
            F.col("med").cast("long").alias("med"),
            F.col("mad").cast("long").alias("mad"),
            (
                F.abs(F.col("n") - F.col("med")) * 10000 > 3 * 14826 * F.col("mad")
            ).alias("is_anomaly"),
        )
        .orderBy("hour_id")
    )


# ---------------------------------------------------------------------------
# bipartite projection similarity: suppliers that stock overlapping
# part sets, scored by exact-micros Jaccard. The supplier-part edge
# list projects onto supplier pairs through a part-keyed self-join
# (bounded by per-part supplier counts — the inverted-index shape, the
# same discipline as the n-gram dedup joins: never all supplier pairs).
# ---------------------------------------------------------------------------
@register(
    "supplier_part_jaccard_topk",
    sql="""
WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM sp GROUP BY s),
shared AS (
  SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS sh
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s),
j AS (
  SELECT s1, s2, sh,
         (2 * sh * 1000000 + (d1.d + d2.d - sh)) // (2 * (d1.d + d2.d - sh))
           AS jac_u
  FROM shared
  JOIN deg d1 ON d1.s = shared.s1
  JOIN deg d2 ON d2.s = shared.s2)
SELECT s1, s2, sh, CAST(jac_u AS BIGINT) AS jac_u
FROM j
ORDER BY jac_u DESC, s1, s2
LIMIT 20
""",
)
def supplier_part_jaccard_topk(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")).distinct()
    deg = sp.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = sp.select(F.col("s").alias("s1"), "p")
    b = sp.select(F.col("s").alias("s2"), F.col("p").alias("p2"))
    shared = (
        a.join(b, (F.col("p") == F.col("p2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    union_sz = F.col("d1") + F.col("d2") - F.col("sh")
    return (
        shared.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "sh",
            F.floor((2 * F.col("sh") * 1_000_000 + union_sz) / (2 * union_sz))
            .cast("long")
            .alias("jac_u"),
        )
        .orderBy(F.desc("jac_u"), F.asc("s1"), F.asc("s2"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# funnel latency: per converting user the delay from FIRST click to the
# first purchase at/after it; p50/p90/max of the delay distribution in
# integer seconds via an EXPLICIT positional discrete quantile
# (sorted list, index floor((n-1)*q)+1 on both engines — DuckDB's
# quantile_disc picks a different element at q=0.9 for small n, caught
# at sf0.001). Two tiny per-user aggs + one min-join — no window over
# the event stream, shards by user at any scale.
# ---------------------------------------------------------------------------
@register(
    "events_time_to_convert",
    sql="""
WITH c AS (SELECT user_id, MIN(epoch_us(ts)) AS first_click
           FROM events WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT user_id, epoch_us(ts) AS tsu
      FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT c.user_id,
         MIN(p.tsu - c.first_click) // 1000000 AS delay_s
  FROM c JOIN p ON p.user_id = c.user_id AND p.tsu >= c.first_click
  GROUP BY c.user_id),
lst AS (SELECT list(delay_s ORDER BY delay_s) AS l, CAST(COUNT(*) AS BIGINT) AS n
        FROM conv)
SELECT n AS n_converters,
       CAST(l[CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1] AS BIGINT) AS p50_s,
       CAST(l[CAST(FLOOR((n - 1) * 0.9) AS BIGINT) + 1] AS BIGINT) AS p90_s,
       CAST(l[n] AS BIGINT) AS max_s
FROM lst
""",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    c = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("tsu").alias("first_click"))
    )
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "tsu")
    conv = (
        c.join(p, "user_id")
        .where(F.col("tsu") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min(F.col("tsu") - F.col("first_click")).alias("delay_us"))
        .select((F.col("delay_us") / 1_000_000).cast("long").alias("delay_s"))
    )

    def disc_q(col, q):
        arr = F.array_sort(F.collect_list(col))
        pos = (F.floor((F.size(arr) - 1) * q) + 1).cast("int")
        return F.element_at(arr, pos)

    return conv.agg(
        F.count(F.lit(1)).alias("n_converters"),
        disc_q(F.col("delay_s"), 0.5).cast("long").alias("p50_s"),
        disc_q(F.col("delay_s"), 0.9).cast("long").alias("p90_s"),
        F.max("delay_s").alias("max_s"),
    )
