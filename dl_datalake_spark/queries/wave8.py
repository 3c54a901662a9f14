"""Round-6 wave 2: index health, session shape, portfolio mixes.

- centroid separation matrix (pairwise cosine between IVF label
  centroids — collapsed centroids mean the coarse quantizer can't
  route, the first thing to check when ANN recall drops);
- session length histogram (how many events a session holds — the
  state-size estimate for any stateful streaming operator);
- market-segment x nation customer mix with exact shares;
- brand x size-band retail pricing (integer cents);
- user LTV deciles over purchase spend (NTILE on a deterministic
  order, money in cents);
- per-nation Gini numerator/denominator of supplier balances in exact
  integer arithmetic (Σ(2i−n−1)·x_i over the sorted cents — emitted as
  integers; acctbal can be negative, so no cross-engine float ratio).

All shares ride functions/exact; every group key is a real shuffle key
(label, user bucket, segment, brand, nation).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu as _with_tsu

US_30MIN = 1_800_000_000


# ---------------------------------------------------------------------------
# pairwise cosine between label centroids
# ---------------------------------------------------------------------------
def _centroid_sep_sql() -> str:
    from dl_datalake_spark.queries.simq import _COS_SQL

    # rewrite in two phases: 'cv' first through a placeholder, or the
    # second replace would chew the 'a.cv' the first one just produced
    pair_cos = (
        _COS_SQL.replace("cv", "__BCV__").replace("qv", "a.cv").replace("__BCV__", "b.cv")
    )
    return f"""
WITH cent AS (
  SELECT label, list(mean_v ORDER BY i) AS cv FROM (
    SELECT label, i, AVG(v) AS mean_v FROM (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings)
    GROUP BY label, i)
  GROUP BY label)
SELECT CAST(a.label AS INTEGER) AS label_a,
       CAST(b.label AS INTEGER) AS label_b,
       {pair_cos} AS cos_sim
FROM cent a JOIN cent b ON a.label < b.label
"""


@register("emb_centroid_separation_matrix", sql=_centroid_sep_sql())
def emb_centroid_separation_matrix(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.similarity import cosine, label_centroids

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    cents = label_centroids(emb, "label", "embedding")
    a = cents.select(F.col("label").alias("label_a"), F.col("cv").alias("cva"))
    b = cents.select(F.col("label").alias("label_b"), F.col("cv").alias("cvb"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            F.col("label_a").cast("int").alias("label_a"),
            F.col("label_b").cast("int").alias("label_b"),
            F.round(cosine(F.col("cva"), F.col("cvb")), 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# session length histogram (events-per-session distribution)
# ---------------------------------------------------------------------------
@register(
    "events_session_length_histogram",
    sql=f"""
WITH t AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
d AS (
  SELECT user_id, tsu,
         CASE WHEN LAG(tsu) OVER w IS NULL
                OR tsu - LAG(tsu) OVER w > {US_30MIN} THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tsu)
),
s AS (
  SELECT user_id,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM d
),
sz AS (SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS n_events
       FROM s GROUP BY user_id, session_seq)
SELECT n_events AS session_len,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events_total
FROM sz GROUP BY n_events
""",
)
def events_session_length_histogram(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.windows import sessionize

    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    sess = sessionize(ev, user_col="user_id", ts_col="tsu", gap=US_30MIN)
    sz = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return sz.groupBy(F.col("n_events").alias("session_len")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events_total"),
    )


# ---------------------------------------------------------------------------
# market-segment x nation customer mix
# ---------------------------------------------------------------------------
@register(
    "customer_segment_nation_mix",
    sql=f"""
WITH m AS (
  SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2),
t AS (SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS seg_n FROM m GROUP BY 1)
SELECT m.c_mktsegment, CAST(m.c_nationkey AS BIGINT) AS nationkey, m.n,
       {ratio_round_sql("m.n", "t.seg_n")} AS seg_share
FROM m JOIN t ON t.c_mktsegment = m.c_mktsegment
""",
)
def customer_segment_nation_mix(spark: SparkSession, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    m = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    t = m.groupBy("c_mktsegment").agg(F.sum("n").alias("seg_n"))
    return m.join(t, "c_mktsegment").select(
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "n",
        ratio_round(F.col("n"), F.col("seg_n")).alias("seg_share"),
    )


# ---------------------------------------------------------------------------
# brand x size-band retail pricing (integer cents; avg via exact ratio)
# ---------------------------------------------------------------------------
@register(
    "part_brand_size_price",
    sql=f"""
SELECT p_brand,
       CAST(p_size // 10 AS BIGINT) AS size_band,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS retail_cents,
       {ratio_round_sql("SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT))", "COUNT(*) * 100", 2)} AS avg_retail
FROM part GROUP BY 1, 2
""",
)
def part_brand_size_price(spark: SparkSession, sf_dir: str):
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return (
        p.select("p_brand", F.expr("p_size DIV 10").alias("size_band"), cents.alias("c"))
        .groupBy("p_brand", "size_band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("c").alias("retail_cents"),
            ratio_round(F.sum("c"), F.count(F.lit(1)) * 100, 2).alias("avg_retail"),
        )
    )


# ---------------------------------------------------------------------------
# user lifetime-value deciles over purchase spend. Deciles derive from
# the DISTRIBUTED rank (bucketed_cumsum, same pattern as
# orders_decile_lift) — NTILE(10) OVER (ORDER BY ...) would funnel one
# row per purchasing user through a single task at 100 TB. cents is
# negated into the rank so (neg DESC, user ASC) == (cents ASC, user ASC),
# the oracle's ordering; the rank-based decile ((rnk-1)*10) DIV n + 1 is
# identical in both engines.
# ---------------------------------------------------------------------------
@register(
    "events_user_ltv_deciles",
    sql="""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
r AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, user_id) AS BIGINT) AS rnk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM u),
d AS (
  SELECT cents, CAST(((rnk - 1) * 10) // n + 1 AS INTEGER) AS decile
  FROM r)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM d GROUP BY decile
""",
)
def events_user_ltv_deciles(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.windows import bucketed_cumsum

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    ranked = bucketed_cumsum(
        u.withColumn("_neg", -F.col("cents")), "_neg", "user_id", num_buckets=32
    )
    n = u.agg(F.count(F.lit(1)).alias("n"))
    d = ranked.crossJoin(F.broadcast(n)).withColumn(  # single-row scalar
        "decile", F.expr("CAST((rnk - 1) * 10 DIV n + 1 AS INT)")
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").alias("total_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# per-nation Gini of supplier balances, exact integer numerator and
# denominator: num = Σ(2i − n − 1)·x_i over cents sorted asc (ties →
# suppkey), den = n·Σx.  Emitted as integers — acctbal can be negative,
# and a float num/den would be the one nondeterministic column.
# ---------------------------------------------------------------------------
@register(
    "supplier_acctbal_gini_terms",
    sql="""
WITH s AS (
  SELECT s_nationkey,
         CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                 ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT), s_suppkey)
              AS BIGINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY s_nationkey) AS BIGINT) AS n
  FROM supplier)
SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
       CAST(MAX(n) AS BIGINT) AS n_suppliers,
       CAST(SUM((2 * i - n - 1) * cents) AS BIGINT) AS gini_num,
       CAST(MAX(n) * SUM(cents) AS BIGINT) AS gini_den
FROM s GROUP BY s_nationkey
""",
)
def supplier_acctbal_gini_terms(spark: SparkSession, sf_dir: str):
    s = load_table(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    w = Window.partitionBy("s_nationkey").orderBy("cents", "s_suppkey")
    wn = Window.partitionBy("s_nationkey")
    d = (
        s.select("s_nationkey", "s_suppkey", cents.alias("cents"))
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(wn).cast("long"))
    )
    return d.groupBy(F.col("s_nationkey").cast("long").alias("nationkey")).agg(
        F.max("n").alias("n_suppliers"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents")).alias("gini_num"),
        (F.max("n") * F.sum("cents")).alias("gini_den"),
    )
