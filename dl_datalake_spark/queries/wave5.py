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


# ---------------------------------------------------------------------------
# wave-6: threshold calibration, cross-language leak detection, power
# users, corpus length bands, rolling trend
# ---------------------------------------------------------------------------
from dl_datalake_spark.operators.dedup import (  # noqa: E402
    drop_stop_shingles,
    ngram_jaccard_pairs,
    word_shingles,
)
from dl_datalake_spark.queries.dedupq import _shingle_cte  # noqa: E402


def _jaccard_band_case(col: str) -> str:
    return (
        f"CASE WHEN {col} >= 0.9 THEN '[0.9,1.0]' "
        f"WHEN {col} >= 0.7 THEN '[0.7,0.9)' "
        f"WHEN {col} >= 0.5 THEN '[0.5,0.7)' "
        f"ELSE '[0.3,0.5)' END"
    )


# Threshold calibration: how many candidate pairs land in each Jaccard
# band.  This is the tuning loop for picking a dedup threshold — run
# once, read the histogram, set the cut.  Same inverted-index join as
# dedup_ngram_jaccard (never all-pairs); band assignment compares the
# ALREADY-ROUNDED jaccard, so both engines bucket identically.
@register(
    "dedup_jaccard_threshold_sweep",
    sql=rf"""
WITH {_shingle_cte(3)},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
  FROM inter JOIN sizes sa ON id_a = sa.doc_id
             JOIN sizes sb ON id_b = sb.doc_id
)
SELECT {_jaccard_band_case('jaccard')} AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MAX(jaccard) AS max_jaccard
FROM j WHERE jaccard >= 0.3
GROUP BY 1
""",
)
def dedup_jaccard_threshold_sweep(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.3, max_df_frac=0.2)
    return pairs.select(
        F.expr(_jaccard_band_case("jaccard")).alias("band"), "jaccard"
    ).groupBy("band").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("jaccard").alias("max_jaccard"),
    )


# Cross-language contamination: document pairs sharing >= 3 rare
# shingles ACROSS language labels — either mislabeled language or
# translated/copied content leaking between corpus slices.  The pair
# generation is the same stop-shingle-capped inverted index; the lang
# columns ride a post-aggregation join (two hash joins on doc_id).
@register(
    "docs_cross_lang_contamination",
    sql=rf"""
WITH {_shingle_cte(3)},
l AS (SELECT doc_id, lang FROM documents),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
x AS (
  SELECT la.lang AS lang_a, lb.lang AS lang_b, inter
  FROM inter JOIN l la ON la.doc_id = id_a
             JOIN l lb ON lb.doc_id = id_b
  WHERE la.lang <> lb.lang AND inter >= 3
)
SELECT lang_a, lang_b,
       CAST(COUNT(*) AS BIGINT) AS pairs,
       CAST(MAX(inter) AS BIGINT) AS max_inter
FROM x GROUP BY 1, 2
""",
)
def docs_cross_lang_contamination(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = drop_stop_shingles(
        word_shingles(docs, hashed=True), docs, "doc_id", 0.2
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .where(F.col("inter") >= 3)
    )
    langs = docs.select("doc_id", "lang")
    la = langs.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a"))
    lb = langs.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b"))
    return (
        inter.join(la, "id_a")
        .join(lb, "id_b")
        .where(F.col("lang_a") != F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.max("inter").alias("max_inter"),
        )
    )


# Power users above the p95 activity threshold.  The quantile is
# positional over the PER-USER aggregate (one row per user — the only
# full-data pass is the per-user hash agg); the threshold broadcasts
# back as a single row.
@register(
    "events_power_users_p95",
    sql="""
WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
t AS (
  SELECT CAST(list(n ORDER BY n)[CAST(FLOOR((COUNT(*) - 1) * 0.95) AS BIGINT) + 1]
              AS BIGINT) AS p95
  FROM u
)
SELECT user_id, n AS n_events, p95 AS p95_threshold
FROM u, t WHERE n >= p95
ORDER BY n_events DESC, user_id
LIMIT 20
""",
)
def events_power_users_p95(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    thresh = u.agg(
        F.element_at(
            F.array_sort(F.collect_list("n")),
            (F.floor((F.count(F.lit(1)) - 1) * 0.95) + 1).cast("int"),
        ).alias("p95")
    )
    return (
        u.crossJoin(F.broadcast(thresh))
        .where(F.col("n") >= F.col("p95"))
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            F.col("p95").alias("p95_threshold"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )


# Corpus length bands per language: positional quartiles of the token
# count — the pre-filter histogram a curation pass reads before setting
# min/max length cuts.  Bounded collect_list (docs per lang).
@register(
    "docs_length_percentile_bands",
    sql=rf"""
WITH t AS (
  SELECT lang, CAST({_SQL_TOKENS} AS INTEGER) AS n_tokens FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(list(n_tokens ORDER BY n_tokens)[CAST(FLOOR((COUNT(*) - 1) * 0.25) AS BIGINT) + 1] AS INTEGER) AS p25_tokens,
       CAST(list(n_tokens ORDER BY n_tokens)[CAST(FLOOR((COUNT(*) - 1) * 0.5) AS BIGINT) + 1] AS INTEGER) AS p50_tokens,
       CAST(list(n_tokens ORDER BY n_tokens)[CAST(FLOOR((COUNT(*) - 1) * 0.75) AS BIGINT) + 1] AS INTEGER) AS p75_tokens
FROM t GROUP BY 1
""",
)
def docs_length_percentile_bands(spark: SparkSession, sf_dir: str):
    docs = with_token_count(load_table(spark, sf_dir, "documents", spread=True))
    arr = F.array_sort(F.collect_list("n_tokens"))
    pos = lambda q: F.element_at(  # noqa: E731
        arr, (F.floor((F.count(F.lit(1)) - 1) * q) + 1).cast("int")
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        pos(0.25).alias("p25_tokens"),
        pos(0.5).alias("p50_tokens"),
        pos(0.75).alias("p75_tokens"),
    )


# Rolling 12-month trend: current month vs its trailing-12 mean, in
# exact integer micro-ratios (12*cur / sum12).  The window runs over
# the MONTHLY aggregate (a few dozen rows at any corpus size); months
# without a full 12-row frame are excluded, so no cold-start ratios.
@register(
    "orders_rolling_12m_trend",
    sql=f"""
WITH m AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS mo,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT y, mo, n, cents,
         SUM(n) OVER win AS n12,
         SUM(cents) OVER win AS cents12,
         COUNT(*) OVER win AS k
  FROM m WINDOW win AS (ORDER BY y, mo ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
)
SELECT y, mo, n AS n_orders, cents AS rev_cents,
       {ratio_units_sql('12 * n', 'n12')} AS count_trend_e6,
       {ratio_units_sql('12 * cents', 'cents12')} AS rev_trend_e6
FROM w WHERE k = 12
""",
)
def orders_rolling_12m_trend(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    win = Window.orderBy("y", "mo").rowsBetween(-11, 0)
    w = m.select(
        "y",
        "mo",
        "n",
        "cents",
        F.sum("n").over(win).alias("n12"),
        F.sum("cents").over(win).alias("cents12"),
        F.count(F.lit(1)).over(win).alias("k"),
    )
    return w.where(F.col("k") == 12).select(
        "y",
        "mo",
        F.col("n").alias("n_orders"),
        F.col("cents").alias("rev_cents"),
        ratio_units(12 * F.col("n"), F.col("n12")).alias("count_trend_e6"),
        ratio_units(12 * F.col("cents"), F.col("cents12")).alias("rev_trend_e6"),
    )


# ---------------------------------------------------------------------------
# LSH band-cost model: per band, the bucket count, total candidate
# pairs (sum of c·(c−1)/2 over buckets), and the largest bucket — the
# numbers that decide num_bands / max_bucket_docs before running the
# pair join at corpus scale.  Reuses the exact signature arithmetic of
# dedup_minhash_lsh; cost is one extra hash agg over (band, sig).
# ---------------------------------------------------------------------------
from dl_datalake_spark.operators.dedup import minhash_signatures  # noqa: E402
from dl_datalake_spark.queries.dedupq import (  # noqa: E402
    MAX_DF_FRAC as _DFRAC,
    NUM_BANDS as _NBANDS,
    SHINGLE_N as _SHN,
)


def _lsh_cost_sql() -> str:
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(_NBANDS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(_NBANDS)
    )
    return rf"""
WITH {_shingle_cte(_SHN)},
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
b AS ({bands}),
buckets AS (SELECT band, sig, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2)
SELECT CAST(band AS INTEGER) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs,
       CAST(MAX(c) AS BIGINT) AS max_bucket
FROM buckets GROUP BY 1
"""


@register("dedup_lsh_band_cost", sql=_lsh_cost_sql())
def dedup_lsh_band_cost(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = word_shingles(docs, distinct=False, n=_SHN)
    sh = drop_stop_shingles(sh, docs, "doc_id", _DFRAC, distinct_input=False)
    sig = minhash_signatures(sh, num_hashes=_NBANDS)
    melted = sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"mh{b}") for b in range(_NBANDS)])).alias(
            "band", "sig"
        ),
    )
    buckets = melted.groupBy("band", "sig").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return buckets.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr("c * (c - 1) DIV 2")).cast("long").alias("candidate_pairs"),
        F.max("c").alias("max_bucket"),
    )


# ---------------------------------------------------------------------------
# gaps-and-islands: distribution of customers' consecutive-active-month
# streak lengths.  The classic islands trick (month_index − row_number
# is constant within a run) over the per-customer distinct-month set —
# three hash aggs + one bounded window, shards by customer.
# ---------------------------------------------------------------------------
@register(
    "orders_activity_streak_histogram",
    sql="""
WITH a AS (
  SELECT DISTINCT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi
  FROM orders
),
r AS (
  SELECT o_custkey, mi,
         mi - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mi) AS grp
  FROM a
),
s AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS streak FROM r GROUP BY o_custkey, grp)
SELECT streak AS streak_months, CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM s GROUP BY 1
""",
)
def orders_activity_streak_histogram(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    r = a.withColumn("grp", F.col("mi") - F.row_number().over(w))
    s = r.groupBy("o_custkey", "grp").agg(F.count(F.lit(1)).alias("streak"))
    return s.groupBy(F.col("streak").alias("streak_months")).agg(
        F.count(F.lit(1)).alias("n_streaks")
    )


# ---------------------------------------------------------------------------
# segment migration matrix: frequency-segment each customer in the
# data's first and second half (split at the integer month midpoint,
# derived from the data via one broadcast row) and count transitions.
# The churn/upgrade report every retention team runs — two hash aggs,
# a rename-disambiguated full outer join, one pivot-style agg.
# ---------------------------------------------------------------------------
@register(
    "orders_rfm_migration_matrix",
    sql="""
WITH m AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi
  FROM orders
),
b AS (SELECT (MIN(mi) + MAX(mi)) // 2 AS mid FROM m),
c AS (
  SELECT o_custkey,
         CASE WHEN mi <= mid THEN 'h1' ELSE 'h2' END AS half,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM m, b GROUP BY 1, 2
),
seg AS (
  SELECT o_custkey, half,
         CASE WHEN cnt >= 5 THEN 'high' WHEN cnt >= 2 THEN 'mid' ELSE 'low' END AS seg
  FROM c
),
h1 AS (SELECT o_custkey, seg FROM seg WHERE half = 'h1'),
h2 AS (SELECT o_custkey, seg FROM seg WHERE half = 'h2')
SELECT COALESCE(h1.seg, 'none') AS seg_h1,
       COALESCE(h2.seg, 'none') AS seg_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
GROUP BY 1, 2
""",
)
def orders_rfm_migration_matrix(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
    )
    b = m.agg(F.expr("(MIN(mi) + MAX(mi)) DIV 2").alias("mid"))
    c = (
        m.crossJoin(F.broadcast(b))
        .groupBy(
            "o_custkey",
            F.when(F.col("mi") <= F.col("mid"), "h1").otherwise("h2").alias("half"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    seg = c.select(
        "o_custkey",
        "half",
        F.when(F.col("cnt") >= 5, "high")
        .when(F.col("cnt") >= 2, "mid")
        .otherwise("low")
        .alias("seg"),
    )
    h1 = seg.where(F.col("half") == "h1").select(
        F.col("o_custkey").alias("ck1"), F.col("seg").alias("s1")
    )
    h2 = seg.where(F.col("half") == "h2").select(
        F.col("o_custkey").alias("ck2"), F.col("seg").alias("s2")
    )
    return (
        h1.join(h2, h1.ck1 == h2.ck2, "full_outer")
        .select(
            F.coalesce(F.col("s1"), F.lit("none")).alias("seg_h1"),
            F.coalesce(F.col("s2"), F.lit("none")).alias("seg_h2"),
        )
        .groupBy("seg_h1", "seg_h2")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# lag-24 autocovariance of the hourly series, PURE-INTEGER form:
# k·Σxy − Σx·Σy over (hour, hour−24) pairs.  No division, no sqrt —
# the signed integer numerators compare exactly across engines, which
# is the whole point (a float Pearson r diverges in the last digits).
# Positive autocov_num = daily seasonality the MASE query exploits.
# ---------------------------------------------------------------------------
@register(
    "events_lag24_autocovariance",
    sql=f"""
WITH h AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS hb, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) * SUM(a.n * s.n) - SUM(a.n) * SUM(s.n) AS BIGINT) AS autocov_num,
       CAST(COUNT(*) * SUM(a.n * a.n) - SUM(a.n) * SUM(a.n) AS BIGINT) AS varx_num,
       CAST(COUNT(*) * SUM(s.n * s.n) - SUM(s.n) * SUM(s.n) AS BIGINT) AS vary_num
FROM h a JOIN h s ON s.event_type = a.event_type AND s.hb = a.hb - 24
GROUP BY 1
""",
)
def events_lag24_autocovariance(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        F.expr(f"tsu DIV {US_PER_HOUR}").alias("hb"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    lag = hourly.select(
        F.col("hb").alias("hb_s"), F.col("event_type").alias("et_s"),
        F.col("n").alias("n_s"),
    )
    j = hourly.join(
        lag,
        (F.col("et_s") == F.col("event_type")) & (F.col("hb_s") == F.col("hb") - 24),
    )
    k = F.count(F.lit(1))
    return j.groupBy("event_type").agg(
        k.alias("n_pairs"),
        (k * F.sum(F.col("n") * F.col("n_s")) - F.sum("n") * F.sum("n_s"))
        .cast("long")
        .alias("autocov_num"),
        (k * F.sum(F.col("n") * F.col("n")) - F.sum("n") * F.sum("n"))
        .cast("long")
        .alias("varx_num"),
        (k * F.sum(F.col("n_s") * F.col("n_s")) - F.sum("n_s") * F.sum("n_s"))
        .cast("long")
        .alias("vary_num"),
    )


# ---------------------------------------------------------------------------
# burstiness (Fano factor = variance/mean of hourly counts) per type in
# exact micro-units: variance numerator N·Σn² − (Σn)² is nonnegative by
# Cauchy-Schwarz, so the exact-ratio helper's nonnegative contract
# holds without shifting.  fano ≈ 1e6 means Poisson-like arrivals;
# larger = bursty traffic that needs headroom in stream sizing.
# ---------------------------------------------------------------------------
@register(
    "events_burstiness_fano",
    sql=f"""
WITH h AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS hb, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(n) AS BIGINT) AS total_events,
       {ratio_units_sql('COUNT(*) * SUM(n * n) - SUM(n) * SUM(n)', 'COUNT(*) * SUM(n)')} AS fano_e6
FROM h GROUP BY 1
""",
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        F.expr(f"tsu DIV {US_PER_HOUR}").alias("hb"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    k = F.count(F.lit(1))
    return hourly.groupBy("event_type").agg(
        k.alias("n_hours"),
        F.sum("n").cast("long").alias("total_events"),
        ratio_units(
            k * F.sum(F.col("n") * F.col("n")) - F.sum("n") * F.sum("n"),
            k * F.sum("n"),
        ).alias("fano_e6"),
    )


# ---------------------------------------------------------------------------
# wave-9: sliding distinct counts, sketch-quality histogram, segment
# returns
# ---------------------------------------------------------------------------
from dl_datalake_spark.operators.dedup import simhash_pairs  # noqa: E402
from dl_datalake_spark.queries.dedupq import (  # noqa: E402
    SIMHASH_BANDS as _SH_BANDS,
    SIMHASH_BITS as _SH_BITS,
    _simhash_sql,
)

US_6H = 6 * US_PER_HOUR


# Rolling unique users: 24h windows sliding every 6h.  DISTINCT over
# OVERLAPPING windows can't ride a frame aggregate — the standard exact
# form assigns each event to its 4 covering windows (one narrow explode,
# constant ×4 row growth) and hash-aggs count(distinct user) per window.
# At 100 TB the explode factor is the window overlap ratio, never the
# data squared; approx path would swap count_distinct for an HLL merge.
@register(
    "events_rolling_unique_users",
    sql=f"""
WITH e AS (
  SELECT unnest([epoch_us(ts) // {US_6H},
                 epoch_us(ts) // {US_6H} - 1,
                 epoch_us(ts) // {US_6H} - 2,
                 epoch_us(ts) // {US_6H} - 3]) AS wid,
         user_id
  FROM events
)
SELECT wid,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY 1
""",
)
def events_rolling_unique_users(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    d = F.expr(f"tsu DIV {US_6H}")
    e = ev.select(
        F.explode(F.array(d, d - 1, d - 2, d - 3)).alias("wid"), "user_id"
    )
    return e.groupBy("wid").agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# SimHash candidate-quality histogram: hamming-distance distribution of
# ALL banded candidates (not just those under the accept cut).  The gap
# between the mass at <=2 and the tail at 3..8 is the empirical
# precision the band count buys — the number to look at before moving
# SIMHASH_MAX_HAMMING.  Same pigeonhole bucket join as dedup_simhash.
@register(
    "dedup_simhash_hamming_histogram",
    sql=f"""
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM ({_simhash_sql(max_hamming=_SH_BITS)}) cand
GROUP BY 1
""",
)
def dedup_simhash_hamming_histogram(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    cand = simhash_pairs(
        docs, bits=_SH_BITS, bands=_SH_BANDS, max_hamming=_SH_BITS
    )
    return cand.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))


# Returned-lineitem share per customer market segment: two dimension
# joins (orders broadcastable at dimension scale, customer hash join)
# + one conditional agg in exact micro-units.
@register(
    "customer_segment_returns_share",
    sql=f"""
WITH t AS (
  SELECT c_mktsegment,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(ret) AS BIGINT) AS n_returned,
       {ratio_units_sql('SUM(ret)', 'COUNT(*)')} AS return_share_e6
FROM t GROUP BY 1
""",
)
def customer_segment_returns_share(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    t = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        )
    )
    return t.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("ret").cast("long").alias("n_returned"),
        ratio_units(F.sum("ret"), F.count(F.lit(1))).alias("return_share_e6"),
    )


# ---------------------------------------------------------------------------
# wave-10: sketch calibration and robust outlier fences
# ---------------------------------------------------------------------------
from dl_datalake_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from dl_datalake_spark.queries.dedupq import NUM_BANDS as _NB  # noqa: E402


def _minhash_calibration_sql() -> str:
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(_NB)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(_NB)
    )
    est = " + ".join(f"(CASE WHEN ma.mh{b} = mb.mh{b} THEN 1 ELSE 0 END)" for b in range(_NB))
    return rf"""
WITH {_shingle_cte(_SHN)},
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
b AS ({bands}),
cand AS (
  SELECT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b
   AND x.shingle = y.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT CAST({est} AS INTEGER) AS matching_bands,
         {ratio_units_sql('i.inter', 'sa.sz + sb.sz - i.inter')} AS jacc_e6
  FROM inter i
  JOIN m ma ON ma.doc_id = i.id_a
  JOIN m mb ON mb.doc_id = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT matching_bands,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {ratio_units_sql('SUM(jacc_e6)', 'COUNT(*)', 0)} AS mean_jaccard_e6
FROM scored GROUP BY 1
"""


# Sketch calibration curve: for every LSH candidate pair, the number of
# agreeing min-hash bands (the estimator) against the EXACT Jaccard of
# the shingle sets, bucketed by estimator value.  This is the empirical
# answer to "what similarity does k matching bands actually mean here"
# — the read before trusting band count as a similarity proxy at scale.
# Cost: the candidate join + one shingle equi-join per pair side.
@register("dedup_minhash_calibration", sql=_minhash_calibration_sql())
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.dedup import minhash_signatures as _sigs

    docs = load_table(spark, sf_dir, "documents", spread=True)
    cand = minhash_lsh_pairs(docs, shingle_n=_SHN, num_bands=_NB, max_df_frac=_DFRAC)
    # exact-jaccard side: DISTINCT stop-filtered shingle sets
    sh = drop_stop_shingles(word_shingles(docs, n=_SHN, hashed=True), docs, "doc_id", _DFRAC)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    xa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingle").alias("sh_a"))
    xb = sh.select(F.col("doc_id").alias("xb_id"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(xa, "id_a")
        .join(xb, (F.col("id_b") == F.col("xb_id")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    # estimator side: per-doc signatures, band agreement count
    sig_src = drop_stop_shingles(
        word_shingles(docs, n=_SHN, distinct=False), docs, "doc_id", _DFRAC,
        distinct_input=False,
    )
    sig = _sigs(sig_src, num_hashes=_NB)
    ma = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"mh{b}").alias(f"a{b}") for b in range(_NB)]
    )
    mb = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"mh{b}").alias(f"b{b}") for b in range(_NB)]
    )
    est = sum(
        (F.when(F.col(f"a{b}") == F.col(f"b{b}"), 1).otherwise(0) for b in range(_NB)),
        start=F.lit(0),
    )
    sza = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    scored = (
        inter.join(ma, "id_a")
        .join(mb, "id_b")
        .join(sza, "id_a")
        .join(szb, "id_b")
        .select(
            est.cast("int").alias("matching_bands"),
            ratio_units(
                F.col("inter"), F.col("sz_a") + F.col("sz_b") - F.col("inter")
            ).alias("jacc_e6"),
        )
    )
    return scored.groupBy("matching_bands").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        ratio_units(F.sum("jacc_e6"), F.count(F.lit(1)), 0).alias("mean_jaccard_e6"),
    )


# Robust outlier fences per nation: positional Q1/Q3 of supplier
# balances in exact cents, Tukey fences at 1.5×IQR computed DOUBLED so
# the arithmetic never leaves the integers (2·bal vs 5·q3 − 3·q1).
# Quartiles ride a 25-row aggregate that broadcasts back over the
# supplier scan — two passes, no window over the full table.
@register(
    "supplier_acctbal_iqr_outliers",
    sql="""
WITH s AS (
  SELECT n_name, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
),
q AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         list(cents ORDER BY cents)[CAST(FLOOR((COUNT(*) - 1) * 0.25) AS BIGINT) + 1] AS q1,
         list(cents ORDER BY cents)[CAST(FLOOR((COUNT(*) - 1) * 0.75) AS BIGINT) + 1] AS q3
  FROM s GROUP BY 1
)
SELECT s.n_name, ANY_VALUE(n_suppliers) AS n_suppliers,
       CAST(ANY_VALUE(q1) AS BIGINT) AS q1_cents,
       CAST(ANY_VALUE(q3) AS BIGINT) AS q3_cents,
       CAST(SUM(CASE WHEN 2 * cents > 5 * q3 - 3 * q1 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
       CAST(SUM(CASE WHEN 2 * cents < 5 * q1 - 3 * q3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers
FROM s JOIN q USING (n_name)
GROUP BY 1
""",
)
def supplier_acctbal_iqr_outliers(spark: SparkSession, sf_dir: str):
    sup = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    s = sup.join(F.broadcast(na), sup.s_nationkey == na.n_nationkey).select(
        "n_name", F.round(F.col("s_acctbal") * 100).cast("long").alias("cents")
    )
    arr = F.array_sort(F.collect_list("cents"))
    pos = lambda qq: F.element_at(  # noqa: E731
        arr, (F.floor((F.count(F.lit(1)) - 1) * qq) + 1).cast("int")
    )
    q = s.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        pos(0.25).alias("q1"),
        pos(0.75).alias("q3"),
    )
    return (
        s.join(F.broadcast(q), "n_name")
        .groupBy("n_name")
        .agg(
            F.first("n_suppliers").alias("n_suppliers"),
            F.first("q1").alias("q1_cents"),
            F.first("q3").alias("q3_cents"),
            F.sum(
                F.when(2 * F.col("cents") > 5 * F.col("q3") - 3 * F.col("q1"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_high_outliers"),
            F.sum(
                F.when(2 * F.col("cents") < 5 * F.col("q1") - 3 * F.col("q3"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_low_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# wave-11: alerting shape, source-overlap matrix, integer covariance
# ---------------------------------------------------------------------------

# Hourly error-share alerting: flag hours whose error share exceeds 2x
# the trailing-24h share.  The alert predicate is exact integer
# cross-multiplication (err*total24 > 2*err24*total) — no division at
# all, so the flag can't flip between engines.  Window over the hourly
# aggregate only.
@register(
    "events_error_rate_alerts",
    sql=f"""
WITH h AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS hb,
         CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err
  FROM events GROUP BY 1
),
w AS (
  SELECT hb, total, err,
         SUM(total) OVER win AS total24,
         SUM(err)   OVER win AS err24,
         COUNT(*)   OVER win AS k
  FROM h WINDOW win AS (ORDER BY hb ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hb, total, err,
       {ratio_units_sql('err', 'total')} AS err_share_e6,
       CASE WHEN err * total24 > 2 * err24 * total THEN 1 ELSE 0 END AS alert
FROM w WHERE k = 24
""",
)
def events_error_rate_alerts(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    h = ev.groupBy(F.expr(f"tsu DIV {US_PER_HOUR}").alias("hb")).agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("err"),
    )
    win = Window.orderBy("hb").rowsBetween(-24, -1)
    w = h.select(
        "hb",
        "total",
        "err",
        F.sum("total").over(win).alias("total24"),
        F.sum("err").over(win).alias("err24"),
        F.count(F.lit(1)).over(win).alias("k"),
    )
    return w.where(F.col("k") == 24).select(
        "hb",
        "total",
        "err",
        ratio_units(F.col("err"), F.col("total")).alias("err_share_e6"),
        F.when(
            F.col("err") * F.col("total24") > 2 * F.col("err24") * F.col("total"), 1
        )
        .otherwise(0)
        .alias("alert"),
    )


# Source-vocabulary overlap matrix: Jaccard between each source pair's
# distinct-token vocabularies via an inverted-index join on the token —
# the corpus-slicing read before merging or deduplicating across
# sources.  Never all-pairs on documents: the join key is the token,
# vocabulary sizes bound each source's contribution.
@register(
    "docs_source_vocab_overlap",
    sql=r"""
WITH v AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM v GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, inter,
       (2 * inter * 1000000 + (sa.sz + sb.sz - inter))
         // (2 * (sa.sz + sb.sz - inter)) AS vocab_jaccard_e6
FROM inter JOIN sz sa ON sa.source = src_a
           JOIN sz sb ON sb.source = src_b
ORDER BY vocab_jaccard_e6 DESC, src_a, src_b
LIMIT 30
""",
)
def docs_source_vocab_overlap(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents", spread=True)
    v = docs.select("source", F.explode(tokens("text")).alias("tok")).distinct()
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    b = v.select(F.col("source").alias("src_b"), F.col("tok").alias("tok_b"))
    inter = (
        v.join(b, (F.col("tok") == F.col("tok_b")) & (F.col("source") < F.col("src_b")))
        .groupBy(F.col("source").alias("src_a"), "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            ratio_units(F.col("inter"), union_sz).alias("vocab_jaccard_e6"),
        )
        .orderBy(F.desc("vocab_jaccard_e6"), "src_a", "src_b")
        .limit(30)
    )


# Size-price covariance per brand in pure signed-integer numerators
# (k·Σxy − Σx·Σy with price in cents) — the feature-correlation scan a
# modeling pass runs across every numeric column pair, shown here on
# one pair with zero float drift.
@register(
    "part_size_price_covariance",
    sql="""
WITH t AS (
  SELECT p_brand,
         CAST(p_size AS BIGINT) AS x,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS y
  FROM part
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS varx_num,
       CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT) AS vary_num
FROM t GROUP BY 1
""",
)
def part_size_price_covariance(spark: SparkSession, sf_dir: str):
    pt = load_table(spark, sf_dir, "part")
    t = pt.select(
        "p_brand",
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("y"),
    )
    k = F.count(F.lit(1))
    return t.groupBy("p_brand").agg(
        k.alias("n_parts"),
        (k * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
        .cast("long")
        .alias("cov_num"),
        (k * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        .cast("long")
        .alias("varx_num"),
        (k * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
        .cast("long")
        .alias("vary_num"),
    )


# ---------------------------------------------------------------------------
# wave-12: margin bands, calendar lift, character-class profile
# ---------------------------------------------------------------------------

# Net-margin decomposition by discount band: the pricing-analytics scan
# that answers "what does each discount tier actually cost".  Band key
# is the discount rounded to integer percent (exact: the synthetic
# discounts are 2-decimal doubles), money stays in integer cents.
@register(
    "lineitem_discount_band_margin",
    sql=f"""
WITH t AS (
  SELECT CAST(ROUND(l_discount * 100) AS INTEGER) AS disc_pct,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS gross_cents,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents
  FROM lineitem
)
SELECT disc_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(gross_cents) AS BIGINT) AS gross_cents,
       CAST(SUM(net_cents) AS BIGINT) AS net_cents,
       {ratio_units_sql('SUM(gross_cents) - SUM(net_cents)', 'SUM(gross_cents)')} AS discount_cost_share_e6
FROM t GROUP BY 1
""",
)
def lineitem_discount_band_margin(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.round(F.col("l_discount") * 100).cast("int").alias("disc_pct"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("gross_cents"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("net_cents"),
    )
    return t.groupBy("disc_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("gross_cents").cast("long").alias("gross_cents"),
        F.sum("net_cents").cast("long").alias("net_cents"),
        ratio_units(
            F.sum("gross_cents") - F.sum("net_cents"), F.sum("gross_cents")
        ).alias("discount_cost_share_e6"),
    )


# Weekday/weekend activity lift per event type: day-of-week from pure
# epoch-day arithmetic ((d+4) % 7, 0=Sunday — no timezone/locale calls
# to diverge), per-day-class rates compared by integer
# cross-multiplied micro-ratio.
@register(
    "events_weekday_weekend_lift",
    sql=f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN ((epoch_us(ts) // {24 * US_PER_HOUR}) + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS is_weekend,
         epoch_us(ts) // {24 * US_PER_HOUR} AS d
  FROM events
),
days AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN (d + 4) % 7 IN (0, 6) THEN d END) AS BIGINT) AS we_days,
         CAST(COUNT(DISTINCT CASE WHEN (d + 4) % 7 NOT IN (0, 6) THEN d END) AS BIGINT) AS wd_days
  FROM (SELECT DISTINCT d FROM e)
)
SELECT event_type,
       CAST(SUM(is_weekend) AS BIGINT) AS weekend_events,
       CAST(SUM(1 - is_weekend) AS BIGINT) AS weekday_events,
       {ratio_units_sql('SUM(is_weekend) * wd_days', 'SUM(1 - is_weekend) * we_days')} AS weekend_rate_lift_e6
FROM e, days
GROUP BY event_type, we_days, wd_days
""",
)
def events_weekday_weekend_lift(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    day = F.expr(f"tsu DIV {24 * US_PER_HOUR}")
    e = ev.select(
        "event_type",
        day.alias("d"),
        F.when(((day + 4) % 7).isin(0, 6), 1).otherwise(0).alias("is_weekend"),
    )
    days = e.select("d").distinct().agg(
        F.countDistinct(F.when(((F.col("d") + 4) % 7).isin(0, 6), F.col("d")))
        .cast("long")
        .alias("we_days"),
        F.countDistinct(F.when(~((F.col("d") + 4) % 7).isin(0, 6), F.col("d")))
        .cast("long")
        .alias("wd_days"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.sum("is_weekend").cast("long").alias("weekend_events"),
            F.sum(1 - F.col("is_weekend")).cast("long").alias("weekday_events"),
        )
        .crossJoin(F.broadcast(days))
        .select(
            "event_type",
            "weekend_events",
            "weekday_events",
            ratio_units(
                F.col("weekend_events") * F.col("wd_days"),
                F.col("weekday_events") * F.col("we_days"),
            ).alias("weekend_rate_lift_e6"),
        )
    )


# Character-class composition per language: alpha/digit/space/other
# shares in exact micros from regexp_replace length arithmetic — all
# inside whole-stage codegen, the cheapest text-profiling pass there is.
@register(
    "docs_char_class_profile",
    sql=f"""
WITH t AS (
  SELECT lang,
         CAST(LENGTH(text) AS BIGINT) AS n,
         CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha,
         CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit,
         CAST(LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS space
  FROM documents
)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS total_chars,
       {ratio_units_sql('SUM(alpha)', 'SUM(n)')} AS alpha_share_e6,
       {ratio_units_sql('SUM(digit)', 'SUM(n)')} AS digit_share_e6,
       {ratio_units_sql('SUM(space)', 'SUM(n)')} AS space_share_e6,
       {ratio_units_sql('SUM(n - alpha - digit - space)', 'SUM(n)')} AS other_share_e6
FROM t GROUP BY 1
""",
)
def docs_char_class_profile(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    t = docs.select(
        "lang",
        F.length("text").cast("long").alias("n"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("long").alias("alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias("digit"),
        F.length(F.regexp_replace("text", "[^ ]", "")).cast("long").alias("space"),
    )
    return t.groupBy("lang").agg(
        F.sum("n").cast("long").alias("total_chars"),
        ratio_units(F.sum("alpha"), F.sum("n")).alias("alpha_share_e6"),
        ratio_units(F.sum("digit"), F.sum("n")).alias("digit_share_e6"),
        ratio_units(F.sum("space"), F.sum("n")).alias("space_share_e6"),
        ratio_units(
            F.sum(F.col("n") - F.col("alpha") - F.col("digit") - F.col("space")),
            F.sum("n"),
        ).alias("other_share_e6"),
    )
