"""Round-6 wave: lifecycle analytics and data-quality primitives.

- weekly retention cohorts (the activation/retention matrix every
  product pipeline materializes — pure integer counts);
- ordered funnel with drop-off ratios (view -> click-after -> purchase-
  after, strictly time-ordered per user);
- CUSUM drift on the hourly stream (change detection without floats:
  deviations are scaled by the hour count so the running sum stays in
  BIGINT);
- order backlog aging buckets (open orders by age at the data cutoff);
- per-quarter return-flag quantity shares (exact micro-ratios);
- identical-prefix contamination groups over documents (the cheap
  exact-dup sweep run before any minhash pass);
- per-source stopword density (exact micro-ratio of stopword tokens);
- inter-event gap quantiles per type (per-user lag windows — never a
  global sort — with explicit positional quantiles).

Scale notes: every pipeline is hash-agg/window-partitioned by a real
key (user, source, type, prefix hash); the only collect_list sites are
the positional-quantile folds, the same bounded shape the registry
already plan-audits.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu as _with_tsu

US_PER_HOUR = 3_600_000_000
US_PER_WEEK = 604_800_000_000


# ---------------------------------------------------------------------------
# weekly retention cohorts: users grouped by first-active week; how many
# are still active 0..3 weeks later.  (user, week) is deduped FIRST, so
# the join fan-out is bounded by active-weeks-per-user, and the final
# count needs no DISTINCT (each joined row is already one user-week).
# ---------------------------------------------------------------------------
@register(
    "events_weekly_retention_cohorts",
    sql=f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_WEEK} AS wk FROM events),
first AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY user_id)
SELECT f.cohort_week,
       uw.wk - f.cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw JOIN first f ON uw.user_id = f.user_id
WHERE uw.wk - f.cohort_week <= 3
GROUP BY 1, 2
""",
)
def events_weekly_retention_cohorts(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    uw = ev.select(
        "user_id", F.expr(f"tsu DIV {US_PER_WEEK}").alias("wk")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        uw.join(first, "user_id")
        .withColumn("week_offset", F.col("wk") - F.col("cohort_week"))
        .where(F.col("week_offset") <= 3)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# ordered funnel: first view -> first click AFTER it -> first purchase
# AFTER that, per user; stage counts + drop-off ratios.  Three per-user
# hash aggs chained by broadcast-joinable per-user minima — no window
# over the raw stream.
# ---------------------------------------------------------------------------
@register(
    "events_funnel_dropoff",
    sql=f"""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after,
       {ratio_round_sql("(SELECT COUNT(*) FROM c)", "(SELECT COUNT(*) FROM v)")} AS click_rate,
       {ratio_round_sql("(SELECT COUNT(*) FROM p)", "(SELECT COUNT(*) FROM c)")} AS purchase_rate
""",
)
def events_funnel_dropoff(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tsu").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("tsu") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("tsu") > F.col("t2"))
        .select("user_id")
        .distinct()
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked_after"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased_after"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)  # three single-row aggregates: broadcast trivially
        .select(
            "n_viewed",
            "n_clicked_after",
            "n_purchased_after",
            ratio_round(F.col("n_clicked_after"), F.col("n_viewed")).alias("click_rate"),
            ratio_round(F.col("n_purchased_after"), F.col("n_clicked_after")).alias(
                "purchase_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM drift on hourly counts: deviations scaled by H (hours observed)
# keep the running sum in exact BIGINT — cusum_t = sum_{i<=t}(n_i*H - N)
# crosses zero exactly where the float (n_i - N/H) cusum would.  The
# peak hour is tie-broken to the earliest.
# ---------------------------------------------------------------------------
@register(
    "events_cusum_hourly_drift",
    sql=f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR} AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot,
         CAST(COUNT(*) AS BIGINT) AS hours
  FROM h GROUP BY event_type),
c AS (
  SELECT h.event_type, h.hr,
         CAST(SUM(h.n * t.hours - t.tot)
              OVER (PARTITION BY h.event_type ORDER BY h.hr
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
  FROM h JOIN t ON t.event_type = h.event_type)
SELECT event_type,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum,
       CAST(MIN(cusum) AS BIGINT) AS min_cusum,
       CAST(MIN(CASE WHEN cusum = mx THEN hr END) AS BIGINT) AS peak_hour
FROM (SELECT *, MAX(cusum) OVER (PARTITION BY event_type) AS mx FROM c)
GROUP BY event_type
""",
)
def events_cusum_hourly_drift(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    h = (
        ev.withColumn("hr", F.expr(f"tsu DIV {US_PER_HOUR}"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = h.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("hours")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        h.join(t, "event_type")
        .withColumn("cusum", F.sum(F.col("n") * F.col("hours") - F.col("tot")).over(wc))
    )
    c = c.withColumn("mx", F.max("cusum").over(Window.partitionBy("event_type")))
    return c.groupBy("event_type").agg(
        F.max("cusum").alias("max_cusum"),
        F.min("cusum").alias("min_cusum"),
        F.min(F.when(F.col("cusum") == F.col("mx"), F.col("hr"))).alias("peak_hour"),
    )


# ---------------------------------------------------------------------------
# backlog aging: open (not-finalized) orders bucketed by age at the
# table's own cutoff date.  Money stays in integer cents.
# ---------------------------------------------------------------------------
@register(
    "orders_backlog_aging",
    sql="""
WITH cut AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS cutoff FROM orders),
aged AS (
  SELECT datediff('day', CAST(o_orderdate AS DATE), cut.cutoff) AS age_d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, cut WHERE o_orderstatus <> 'F')
SELECT CASE WHEN age_d <= 30 THEN '000-030'
            WHEN age_d <= 60 THEN '031-060'
            WHEN age_d <= 90 THEN '061-090'
            ELSE '090+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM aged GROUP BY 1
""",
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    cut = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("cutoff"))
    aged = (
        o.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(cut))
        .select(
            F.datediff(F.col("cutoff"), F.col("o_orderdate").cast("date")).alias("age_d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_d") <= 30, "000-030")
        .when(F.col("age_d") <= 60, "031-060")
        .when(F.col("age_d") <= 90, "061-090")
        .otherwise("090+")
    )
    return aged.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# per-quarter return-flag quantity share (exact micro-ratios; quantity
# is integral in the generator, ROUND makes that explicit)
# ---------------------------------------------------------------------------
@register(
    "lineitem_returnflag_quarter_share",
    sql=f"""
WITH q AS (
  SELECT CAST(year(l_shipdate) * 10 + quarter(l_shipdate) AS BIGINT) AS yq,
         l_returnflag,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2),
t AS (SELECT yq, CAST(SUM(qty) AS BIGINT) AS tot FROM q GROUP BY yq)
SELECT q.yq, q.l_returnflag, q.qty,
       {ratio_round_sql("q.qty", "t.tot")} AS qty_share
FROM q JOIN t ON t.yq = q.yq
""",
)
def lineitem_returnflag_quarter_share(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    q = (
        li.select(
            (F.year("l_shipdate") * 10 + F.quarter("l_shipdate"))
            .cast("long")
            .alias("yq"),
            "l_returnflag",
            F.round(F.col("l_quantity")).cast("long").alias("qv"),
        )
        .groupBy("yq", "l_returnflag")
        .agg(F.sum("qv").alias("qty"))
    )
    t = q.groupBy("yq").agg(F.sum("qty").alias("tot"))
    return q.join(t, "yq").select(
        "yq",
        "l_returnflag",
        "qty",
        ratio_round(F.col("qty"), F.col("tot")).alias("qty_share"),
    )


# ---------------------------------------------------------------------------
# identical-prefix contamination: documents sharing their first 64
# characters verbatim — the O(n) exact sweep run before any sketching.
# Prefixes leave the pipeline as md5 keys (no raw text in the output).
# ---------------------------------------------------------------------------
@register(
    "docs_prefix_contamination",
    sql="""
WITH g AS (
  SELECT md5(substr(text, 1, 64)) AS prefix_md5,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
  FROM documents GROUP BY 1 HAVING COUNT(*) > 1)
SELECT prefix_md5, n_docs, min_doc_id
FROM g ORDER BY n_docs DESC, prefix_md5 LIMIT 20
""",
)
def docs_prefix_contamination(spark: SparkSession, sf_dir: str):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.substring("text", 1, 64)).alias("prefix_md5"), "doc_id")
        .groupBy("prefix_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), F.asc("prefix_md5"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# per-source English stopword density (exact micro-ratio of stopword
# tokens to all tokens) — the cheap quality signal per corpus slice.
# ---------------------------------------------------------------------------
_STOPS = ("the", "a", "of", "and", "to")  # operators/text.py LANG_STOPWORDS["en"]
_STOPS_SQL = "('" + "', '".join(_STOPS) + "')"


@register(
    "docs_stopword_density_by_source",
    sql=rf"""
WITH d AS (
  SELECT source,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              w -> w IN {_STOPS_SQL})) AS BIGINT) AS n_stop
  FROM documents)
SELECT source,
       CAST(SUM(n_tok) AS BIGINT) AS tokens,
       CAST(SUM(n_stop) AS BIGINT) AS stop_tokens,
       {ratio_round_sql("SUM(n_stop)", "SUM(n_tok)")} AS stop_density
FROM d GROUP BY source
""",
)
def docs_stopword_density_by_source(spark: SparkSession, sf_dir: str):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    lower_toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    per_doc = d.select(
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.filter(lower_toks, lambda w: w.isin(*_STOPS))).cast("long").alias(
            "n_stop"
        ),
    )
    return per_doc.groupBy("source").agg(
        F.sum("n_tok").alias("tokens"),
        F.sum("n_stop").alias("stop_tokens"),
        ratio_round(F.sum("n_stop"), F.sum("n_tok")).alias("stop_density"),
    )


# ---------------------------------------------------------------------------
# inter-event gap quantiles per type: lag over (user) — a per-user
# window, never a global sort — then explicit positional quantiles of
# the gaps grouped by the later event's type.
# ---------------------------------------------------------------------------
@register(
    "events_inter_event_gap_quantiles",
    sql="""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)))
           // 1000000 AS gap_s
  FROM events),
lst AS (
  SELECT event_type, list(gap_s ORDER BY gap_s) AS l,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM g WHERE gap_s IS NOT NULL GROUP BY event_type)
SELECT event_type, n AS n_gaps,
       CAST(l[CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1] AS BIGINT) AS p50_s,
       CAST(l[CAST(FLOOR((n - 1) * 0.9) AS BIGINT) + 1] AS BIGINT) AS p90_s
FROM lst
""",
)
def events_inter_event_gap_quantiles(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("tsu")
    g = (
        ev.withColumn("prev", F.lag("tsu").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "event_type",
            F.expr("(tsu - prev) DIV 1000000").alias("gap_s"),
        )
    )

    def disc_q(col, q):
        arr = F.array_sort(F.collect_list(col))
        pos = (F.floor((F.size(arr) - 1) * q) + 1).cast("int")
        return F.element_at(arr, pos)

    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        disc_q(F.col("gap_s"), 0.5).cast("long").alias("p50_s"),
        disc_q(F.col("gap_s"), 0.9).cast("long").alias("p90_s"),
    )


# ---------------------------------------------------------------------------
# duplicate-cluster size histogram: how big do near-dup groups get —
# the number every dedup run reports before choosing survivors (a few
# huge clusters vs many pairs changes the keeper strategy).  One agg
# over the (tiny) component labeling.
# ---------------------------------------------------------------------------
def _cluster_size_hist_sql() -> str:
    from dl_datalake_spark.queries.dedupq import _components_sql

    return f"""
WITH comp AS ({_components_sql().strip()}),
s AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz FROM comp GROUP BY component)
SELECT sz AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM s GROUP BY sz
"""


@register("dedup_cluster_size_histogram", sql=_cluster_size_hist_sql())
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.queries.dedupq import dedup_groups

    sizes = dedup_groups(spark, sf_dir).groupBy("component").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# IVF nprobe→recall curve: the cost/recall dial measured empirically —
# recall@5 vs exact k-NN for nprobe = 1, 2, 3 over the audit query set.
# The per-nprobe retrieval is the SAME deterministic ivf_topk the
# registry already oracles at nprobe=1; the curve is what you read
# before committing a probe budget at scale.
# ---------------------------------------------------------------------------
def _ivf_nprobe_curve_sql() -> str:
    from dl_datalake_spark.queries.simq import _COS_SQL

    a_cos = _COS_SQL.replace("qv", "a.qv").replace("cv", "c.cv")
    return f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (
  SELECT label, list(mean_v ORDER BY i) AS cv FROM (
    SELECT label, i, AVG(v) AS mean_v FROM (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings)
    GROUP BY label, i)
  GROUP BY label
),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
ranked AS (
  SELECT q.q_id, q.qv, cent.label,
         ROW_NUMBER() OVER (PARTITION BY q.q_id
                            ORDER BY {_COS_SQL} DESC, cent.label) AS rn
  FROM q CROSS JOIN cent),
np AS (SELECT unnest([1, 2, 3]) AS nprobe),
assigned AS (
  SELECT np.nprobe, r.q_id, r.qv, r.label AS cell
  FROM ranked r JOIN np ON r.rn <= np.nprobe),
c AS (SELECT vec_id AS c_id, label AS c_label, v AS cv FROM e),
approx AS (
  SELECT nprobe, q_id, c_id FROM (
    SELECT a.nprobe, a.q_id, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY a.nprobe, a.q_id
                              ORDER BY {a_cos} DESC, c.c_id) AS rank
    FROM assigned a JOIN c ON c.c_label = a.cell AND c.c_id <> a.q_id)
  WHERE rank <= 5),
exact AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY {_COS_SQL} DESC, c_id) AS rank
    FROM q JOIN c ON c_id <> q_id)
  WHERE rank <= 5),
hits AS (
  SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS h
  FROM approx a JOIN exact e2 ON a.q_id = e2.q_id AND a.c_id = e2.c_id
  GROUP BY nprobe)
SELECT CAST(np.nprobe AS INTEGER) AS nprobe,
       CAST(COALESCE(h, 0) AS BIGINT) AS total_hits,
       {ratio_round_sql("COALESCE(h, 0)", "(SELECT COUNT(*) FROM q) * 5")} AS mean_recall
FROM np LEFT JOIN hits USING (nprobe) ORDER BY nprobe
"""


@register("emb_ivf_nprobe_curve", sql=_ivf_nprobe_curve_sql())
def emb_ivf_nprobe_curve(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.similarity import ivf_topk, pairwise_topk_join

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 20)
    exact = pairwise_topk_join(q, emb, k=5).select(
        F.col("q_id").alias("eq_id"), F.col("c_id").alias("ec_id")
    )
    parts = [
        ivf_topk(q, emb, k=5, nprobe=np_)
        .select("q_id", "c_id")
        .withColumn("nprobe", F.lit(np_))
        for np_ in (1, 2, 3)
    ]
    approx = parts[0].unionByName(parts[1]).unionByName(parts[2])
    hits = (
        approx.join(
            exact,
            (F.col("q_id") == F.col("eq_id")) & (F.col("c_id") == F.col("ec_id")),
        )
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    denom = q.agg((F.count(F.lit(1)) * 5).alias("den"))
    base = spark.createDataFrame([(1,), (2,), (3,)], "nprobe int")
    return (
        base.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "nprobe",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("total_hits"),
            ratio_round(F.coalesce(F.col("h"), F.lit(0)), F.col("den")).alias(
                "mean_recall"
            ),
        )
        .orderBy("nprobe")
    )
