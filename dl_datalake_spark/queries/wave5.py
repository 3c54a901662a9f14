"""Round-5 additions: forecast-quality, training-budget, association,
product-quantization, A/B measurement, latency-percentile, and
shard-balance shapes.

Each one is a pipeline primitive a 100 TB training-data platform runs
routinely, expressed so the only full-data passes are hash aggregates:

- seasonal-naive MASE: two-level agg (raw stream -> hourly counts ->
  per-type join on the tiny hourly series) — the anomaly-scoring shape;
- token-budget allocation: one hash agg + a broadcast single-row total;
- brand association rules: per-order self-join bounded by basket size
  (the classic market-basket shape: pair generation never leaves the
  order key, so it shards cleanly);
- PQ sign codes: pure projection arithmetic inside codegen, then one
  hash agg — the bucketing step of a product-quantized ANN index;
- A/B lift: deterministic arm assignment + per-user agg + 1-row pivot;
- ship-latency percentiles: bounded collect_list per nation (25 groups)
  using the positional-quantile form that matches DuckDB exactly;
- shard balance: md5-hex first-nibble sharding (cross-engine stable,
  unlike xxhash64) + per-shard token totals.

All ratios go through functions/exact integer micro-units (the float
path diverges between engines in the last digit).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.functions.exact import ratio_units, ratio_units_sql
from dl_datalake_spark.operators.text import with_token_count
from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table, with_tsu as _with_tsu

US_PER_HOUR = 3_600_000_000

# the proven cross-engine whitespace token count (docs_token_stats pair)
_SQL_TOKENS = r"len(string_split_regex(trim(text), '\s+'))"


# ---------------------------------------------------------------------------
# seasonal-naive forecast error (MASE numerator/denominator) per type.
# Forecast n[h] by n[h-24] (seasonal) vs n[h-1] (naive); the ratio of
# summed absolute errors is the scale-free forecastability score.
# Joins on the HOURLY aggregate (720 rows at sf0.01; a few thousand for
# a year of 100 TB telemetry), so misaligned/missing hours can't shift
# the lag the way a row-number lag would.
# ---------------------------------------------------------------------------
@register(
    "events_seasonal_naive_mase",
    sql=f"""
WITH h AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS hb, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(ABS(a.n - s.n)) AS BIGINT) AS seasonal_abs_err,
       CAST(SUM(ABS(a.n - p.n)) AS BIGINT) AS naive_abs_err,
       {ratio_units_sql('SUM(ABS(a.n - s.n))', 'SUM(ABS(a.n - p.n))')} AS mase_e6
FROM h a
JOIN h p ON p.event_type = a.event_type AND p.hb = a.hb - 1
JOIN h s ON s.event_type = a.event_type AND s.hb = a.hb - 24
GROUP BY 1
""",
)
def events_seasonal_naive_mase(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        F.expr(f"tsu DIV {US_PER_HOUR}").alias("hb"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    # rename BOTH join columns on the lagged sides: same-lineage self
    # joins silently collapse a.col == b.col to trivially-true otherwise
    prev1 = hourly.select(
        F.col("hb").alias("hb_p"), F.col("event_type").alias("et_p"),
        F.col("n").alias("n_p"),
    )
    prev24 = hourly.select(
        F.col("hb").alias("hb_s"), F.col("event_type").alias("et_s"),
        F.col("n").alias("n_s"),
    )
    scored = (
        hourly.join(
            prev1,
            (F.col("et_p") == F.col("event_type")) & (F.col("hb_p") == F.col("hb") - 1),
        )
        .join(
            prev24,
            (F.col("et_s") == F.col("event_type")) & (F.col("hb_s") == F.col("hb") - 24),
        )
    )
    sea = F.sum(F.abs(F.col("n") - F.col("n_s")))
    nai = F.sum(F.abs(F.col("n") - F.col("n_p")))
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        sea.alias("seasonal_abs_err"),
        nai.alias("naive_abs_err"),
        ratio_units(sea, nai).alias("mase_e6"),
    )


# ---------------------------------------------------------------------------
# training-mix budget allocation: give each source min(what it has, its
# proportional slice of a global budget, a 30%-of-budget cap).  The cap
# is how production mixes keep one crawl from dominating an epoch.
# Envelope: B * tokens stays exact in BIGINT while total < ~3e9 tokens;
# a 100 TB corpus (~1e13 tokens) runs the same formula through
# DECIMAL(38,0) — the shape (one agg + broadcast total) is unchanged.
# ---------------------------------------------------------------------------
@register(
    "docs_token_budget_allocation",
    sql=f"""
WITH s AS (
  SELECT source, CAST(SUM({_SQL_TOKENS}) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM s)
SELECT source, tokens,
       {ratio_units_sql('tokens', 'total')} AS share_e6,
       CAST(LEAST(tokens,
                  ((total // 2) * tokens) // total,
                  ((total // 2) * 3) // 10) AS BIGINT) AS alloc_tokens
FROM s, t
""",
)
def docs_token_budget_allocation(spark: SparkSession, sf_dir: str):
    docs = with_token_count(load_table(spark, sf_dir, "documents", spread=True))
    per_src = docs.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("tokens")
    )
    total = per_src.agg(F.sum("tokens").cast("long").alias("total"))
    return per_src.crossJoin(F.broadcast(total)).select(
        "source",
        "tokens",
        ratio_units(F.col("tokens"), F.col("total")).alias("share_e6"),
        F.least(
            F.col("tokens"),
            F.expr("((total DIV 2) * tokens) DIV total"),
            F.expr("((total DIV 2) * 3) DIV 10"),
        ).alias("alloc_tokens"),
    )


# ---------------------------------------------------------------------------
# brand-level association rules over order baskets: support, confidence
# P(b|a), lift.  Pair generation is an equi-join on the order key
# (bounded by brands-per-order), never an all-pairs product; counts are
# reused via one hash agg per side.  lift numerator pc * n_orders stays
# under 2^63/2e6 through sf100; past that, swap the two ratio_units for
# DECIMAL(38,0) arithmetic.
# ---------------------------------------------------------------------------
@register(
    "part_brand_association_rules",
    sql=f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem),
cnt AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY 1),
pair AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, CAST(COUNT(*) AS BIGINT) AS pc
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, pc AS pair_orders,
       {ratio_units_sql('pc', 'ca.c')} AS conf_a_e6,
       {ratio_units_sql('pc * n.n_orders', 'ca.c * cb.c')} AS lift_e6
FROM pair
JOIN cnt ca ON ca.p_brand = brand_a
JOIN cnt cb ON cb.p_brand = brand_b
CROSS JOIN n
ORDER BY lift_e6 DESC, brand_a, brand_b
LIMIT 20
""",
)
def part_brand_association_rules(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = li.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    cnt = ob.groupBy("p_brand").agg(F.count(F.lit(1)).cast("long").alias("c"))
    rhs = ob.select(
        F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("brand_b")
    )
    pair = (
        ob.join(
            rhs,
            (F.col("l_orderkey") == F.col("ok_b"))
            & (F.col("p_brand") < F.col("brand_b")),
        )
        .groupBy(F.col("p_brand").alias("brand_a"), "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pc"))
    )
    ca = cnt.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pair.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("pc").alias("pair_orders"),
            ratio_units(F.col("pc"), F.col("ca")).alias("conf_a_e6"),
            ratio_units(
                F.col("pc") * F.col("n_orders"), F.col("ca") * F.col("cb")
            ).alias("lift_e6"),
        )
        .orderBy(F.desc("lift_e6"), "brand_a", "brand_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# product-quantization sign codes: 8 subspaces x 8 dims, code = the
# sign bit pattern (deterministic — no trained codebook, so exactly
# reproducible in SQL).  The code histogram is the bucket-occupancy
# audit for a PQ/IVF-PQ index: flat occupancy -> good candidate
# pruning.  Scan-stage projection arithmetic + one hash agg.
# ---------------------------------------------------------------------------
def _pq_code_sql(s: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN embedding[{s * 8 + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    return f"SELECT {s} AS subspace, {terms} AS code FROM embeddings"


@register(
    "emb_pq_sign_codes",
    sql=f"""
WITH codes AS ({' UNION ALL '.join(_pq_code_sql(s) for s in range(8))})
SELECT CAST(subspace AS INTEGER) AS subspace,
       CAST(code AS INTEGER) AS code,
       CAST(COUNT(*) AS BIGINT) AS n
FROM codes GROUP BY 1, 2
""",
)
def emb_pq_sign_codes(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    codes = [
        sum(
            (
                F.when(F.col("embedding").getItem(s * 8 + i) >= 0, F.lit(1 << i))
                .otherwise(F.lit(0))
                for i in range(8)
            ),
            start=F.lit(0),
        ).alias(f"c{s}")
        for s in range(8)
    ]
    return (
        emb.select(F.posexplode(F.array(*codes)).alias("subspace", "code"))
        .groupBy("subspace", "code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# deterministic A/B measurement: arm = user_id % 2, conversion = the
# user's purchases outnumber their clicks.  Per-user agg -> per-arm agg
# -> single-row pivot; the lift is a SUBTRACTION of exact integer
# micro-rates (never a division on a possibly-negative quantity).
# ---------------------------------------------------------------------------
@register(
    "events_ab_assignment_lift",
    sql=f"""
WITH u AS (
  SELECT user_id,
         CAST(user_id % 2 AS INTEGER) AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 > SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS users,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM u GROUP BY 1
),
r AS (SELECT arm, users, conv, {ratio_units_sql('conv', 'users')} AS rate_e6 FROM a)
SELECT MAX(CASE WHEN arm = 0 THEN users END) AS users_a,
       MAX(CASE WHEN arm = 1 THEN users END) AS users_b,
       MAX(CASE WHEN arm = 0 THEN conv END) AS conv_a,
       MAX(CASE WHEN arm = 1 THEN conv END) AS conv_b,
       MAX(CASE WHEN arm = 0 THEN rate_e6 END) AS rate_a_e6,
       MAX(CASE WHEN arm = 1 THEN rate_e6 END) AS rate_b_e6,
       MAX(CASE WHEN arm = 1 THEN rate_e6 END)
         - MAX(CASE WHEN arm = 0 THEN rate_e6 END) AS lift_diff_e6
FROM r
""",
)
def events_ab_assignment_lift(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("arm")
    ).agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        )
        .cast("int")
        .alias("converted")
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("users"),
        F.sum("converted").cast("long").alias("conv"),
    )
    r = a.withColumn("rate_e6", ratio_units(F.col("conv"), F.col("users")))
    pick = lambda arm, c: F.max(F.when(F.col("arm") == arm, F.col(c)))  # noqa: E731
    return r.agg(
        pick(0, "users").alias("users_a"),
        pick(1, "users").alias("users_b"),
        pick(0, "conv").alias("conv_a"),
        pick(1, "conv").alias("conv_b"),
        pick(0, "rate_e6").alias("rate_a_e6"),
        pick(1, "rate_e6").alias("rate_b_e6"),
        (pick(1, "rate_e6") - pick(0, "rate_e6")).alias("lift_diff_e6"),
    )


# ---------------------------------------------------------------------------
# order->ship latency percentiles per customer nation.  Positional
# quantiles via sorted collect_list (bounded: lines per nation are
# collected AFTER the day-diff projection, and the 25 nation groups
# keep each list on one reducer — for unbounded-cardinality keys use
# approx_percentile instead; this is the exact-audit variant).
# ---------------------------------------------------------------------------
@register(
    "orders_ship_latency_percentiles",
    sql="""
WITH d AS (
  SELECT n_name,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) AS INTEGER) AS days
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(days) AS INTEGER) AS min_days,
       CAST(list(days ORDER BY days)[CAST(FLOOR((COUNT(*) - 1) * 0.5) AS BIGINT) + 1] AS INTEGER) AS p50_days,
       CAST(list(days ORDER BY days)[CAST(FLOOR((COUNT(*) - 1) * 0.9) AS BIGINT) + 1] AS INTEGER) AS p90_days,
       CAST(MAX(days) AS INTEGER) AS max_days
FROM d GROUP BY 1
""",
)
def orders_ship_latency_percentiles(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(na), c.c_nationkey == na.n_nationkey)
        .select(
            "n_name",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("days"),
        )
    )
    arr = F.array_sort(F.collect_list("days"))
    pos = lambda q: F.element_at(  # noqa: E731
        arr, (F.floor((F.count(F.lit(1)) - 1) * q) + 1).cast("int")
    )
    return d.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("days").alias("min_days"),
        pos(0.5).alias("p50_days"),
        pos(0.9).alias("p90_days"),
        F.max("days").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# shard-balance audit: md5 first-nibble sharding (16 shards) of the
# document corpus, per-shard doc/token totals and share.  md5-hex is
# the cross-engine-stable hash (xxhash64 exists only in Spark); the
# nibble IS the shard id, so no hex->int conversion is needed.
# ---------------------------------------------------------------------------
@register(
    "docs_shard_balance_audit",
    sql=f"""
WITH s AS (
  SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         CAST({_SQL_TOKENS} AS INTEGER) AS n_tokens
  FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       {ratio_units_sql('SUM(n_tokens)', '(SELECT SUM(n_tokens) FROM s)')} AS share_e6
FROM s GROUP BY 1
""",
)
def docs_shard_balance_audit(spark: SparkSession, sf_dir: str):
    docs = with_token_count(load_table(spark, sf_dir, "documents", spread=True))
    s = docs.select(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        "n_tokens",
    )
    total = s.agg(F.sum("n_tokens").cast("long").alias("total"))
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "tokens",
            ratio_units(F.col("tokens"), F.col("total")).alias("share_e6"),
        )
    )
