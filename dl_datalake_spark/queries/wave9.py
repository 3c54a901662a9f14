"""Round-6 wave 3: sequence models, attribution, corpus statistics.

- event-type Markov transition matrix (per-user lag sequences ->
  transition counts + exact row-normalized probabilities — the
  sequence prior every behavioral model starts from);
- first-touch attribution of purchases (which entry event type gets
  credit for each converting user);
- type-token ratio per source (distinct/total tokens, the classic
  lexical-diversity quality gate);
- top-token co-occurrence (pair generation bounded by a broadcast
  top-30 vocabulary semi-join — never all token pairs);
- per-label embedding-norm percentiles (positional quantiles over
  per-row rounded norms; sqrt is IEEE-exact so both engines see the
  same values);
- per-customer reorder-gap percentiles (positional quantiles over
  integer day gaps).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu as _with_tsu


def _disc_q(col, q):
    arr = F.array_sort(F.collect_list(col))
    pos = (F.floor((F.size(arr) - 1) * q) + 1).cast("int")
    return F.element_at(arr, pos)


# ---------------------------------------------------------------------------
# event-type Markov transitions
# ---------------------------------------------------------------------------
@register(
    "events_markov_transitions",
    sql=f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           AS prev_type
  FROM events),
m AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM m GROUP BY prev_type)
SELECT m.prev_type, m.next_type, m.n,
       {ratio_round_sql("m.n", "t.row_n")} AS p
FROM m JOIN t ON t.prev_type = m.prev_type
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    m = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = m.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return m.join(t, "prev_type").select(
        "prev_type", "next_type", "n", ratio_round(F.col("n"), F.col("row_n")).alias("p")
    )


# ---------------------------------------------------------------------------
# first-touch attribution: the FIRST event type a converting user ever
# produced gets the purchase credit
# ---------------------------------------------------------------------------
@register(
    "events_first_touch_attribution",
    sql=f"""
WITH first AS (
  SELECT user_id, event_type AS first_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS rn
    FROM events) WHERE rn = 1),
conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
a AS (
  SELECT f.first_type, CAST(COUNT(*) AS BIGINT) AS n_converters
  FROM conv JOIN first f ON f.user_id = conv.user_id
  GROUP BY f.first_type),
t AS (SELECT CAST(SUM(n_converters) AS BIGINT) AS tot FROM a)
SELECT a.first_type, a.n_converters,
       {ratio_round_sql("a.n_converters", "t.tot")} AS credit_share
FROM a, t
""",
)
def events_first_touch_attribution(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    first = ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("tsu", "event_id")).alias("first_type")
    )
    conv = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    a = (
        conv.join(first, "user_id")
        .groupBy("first_type")
        .agg(F.count(F.lit(1)).alias("n_converters"))
    )
    t = a.agg(F.sum("n_converters").alias("tot"))
    return a.crossJoin(F.broadcast(t)).select(
        "first_type",
        "n_converters",
        ratio_round(F.col("n_converters"), F.col("tot")).alias("credit_share"),
    )


# ---------------------------------------------------------------------------
# lexical diversity: type-token ratio per source
# ---------------------------------------------------------------------------
@register(
    "docs_type_token_ratio_by_source",
    sql=rf"""
WITH tok AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS tokens,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS types,
       {ratio_round_sql("COUNT(DISTINCT w)", "COUNT(*)")} AS ttr
FROM tok GROUP BY source
""",
)
def docs_type_token_ratio_by_source(spark: SparkSession, sf_dir: str):
    d = load_table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    )
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("tokens"),
        F.countDistinct("w").alias("types"),
        ratio_round(F.countDistinct("w"), F.count(F.lit(1))).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# top-token co-occurrence: document-level pair counts restricted to the
# corpus-global top-30 vocabulary (broadcast semi-join), so the pair
# space is ≤ C(30,2) regardless of corpus size
# ---------------------------------------------------------------------------
@register(
    "docs_top_token_cooccurrence",
    sql=r"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
top AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS df,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rn
    FROM tok GROUP BY w)
  WHERE rn <= 30),
ft AS (SELECT doc_id, tok.w FROM tok JOIN top ON top.w = tok.w)
SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY 1, 2
HAVING COUNT(*) >= 2
""",
)
def docs_top_token_cooccurrence(spark: SparkSession, sf_dir: str):
    d = load_table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).distinct()
    # top-30 via orderBy().limit() — compiles to TakeOrderedAndProject
    # (per-partition heaps), never a full-vocabulary global window; the
    # (df DESC, w ASC) total order makes the cut deterministic, same as
    # the oracle's ROW_NUMBER <= 30 (docs_zipf_fit uses this shape too)
    top = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("w"))
        .limit(30)
        .select("w")
    )
    ft = tok.join(F.broadcast(top), "w")
    a = ft.select("doc_id", F.col("w").alias("w1"))
    b = ft.select(F.col("doc_id").alias("doc_b"), F.col("w").alias("w2"))
    return (
        a.join(b, (F.col("doc_id") == F.col("doc_b")) & (F.col("w1") < F.col("w2")))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# embedding-norm percentiles per label (positional quantiles over
# per-row ROUND(norm, 6) — sqrt is IEEE-correctly-rounded, so the
# rounded per-row values are engine-identical)
# ---------------------------------------------------------------------------
@register(
    "emb_norm_percentiles_by_label",
    sql="""
WITH n AS (
  SELECT label,
         ROUND(sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                              for i in generate_series(1, len(embedding))])), 6) AS nrm
  FROM embeddings),
lst AS (
  SELECT label, list(nrm ORDER BY nrm) AS l, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM n GROUP BY label)
SELECT CAST(label AS INTEGER) AS label, cnt AS n_vectors,
       l[CAST(FLOOR((cnt - 1) * 0.5) AS BIGINT) + 1] AS p50_norm,
       l[CAST(FLOOR((cnt - 1) * 0.9) AS BIGINT) + 1] AS p90_norm,
       l[1] AS min_norm,
       l[cnt] AS max_norm
FROM lst
""",
)
def emb_norm_percentiles_by_label(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    n = emb.select(
        F.col("label").cast("int").alias("label"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("nrm"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        _disc_q(F.col("nrm"), 0.5).alias("p50_norm"),
        _disc_q(F.col("nrm"), 0.9).alias("p90_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# reorder-gap percentiles: integer day gaps between a customer's
# consecutive orders, positional p50/p90 over the gap population
# ---------------------------------------------------------------------------
@register(
    "orders_reorder_gap_percentiles",
    sql="""
WITH g AS (
  SELECT datediff('day',
                  LAG(CAST(o_orderdate AS DATE))
                    OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                  CAST(o_orderdate AS DATE)) AS gap_d
  FROM orders),
lst AS (SELECT list(gap_d ORDER BY gap_d) AS l, CAST(COUNT(*) AS BIGINT) AS n
        FROM g WHERE gap_d IS NOT NULL)
SELECT n AS n_gaps,
       CAST(l[CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1] AS BIGINT) AS p50_days,
       CAST(l[CAST(FLOOR((n - 1) * 0.9) AS BIGINT) + 1] AS BIGINT) AS p90_days,
       CAST(l[n] AS BIGINT) AS max_days
FROM lst
""",
)
def orders_reorder_gap_percentiles(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    g = (
        o.withColumn("prev_d", F.lag(F.col("o_orderdate").cast("date")).over(w))
        .where(F.col("prev_d").isNotNull())
        .select(
            F.datediff(F.col("o_orderdate").cast("date"), F.col("prev_d")).alias("gap_d")
        )
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        _disc_q(F.col("gap_d"), 0.5).cast("long").alias("p50_days"),
        _disc_q(F.col("gap_d"), 0.9).cast("long").alias("p90_days"),
        F.max("gap_d").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# IVF cell balance: deterministic argmax-cosine assignment of every
# vector against the label-mean centroids, then per-cell load share and
# exact-ratio mean member→centroid cosine — the registry twin of
# operators.ivf_index.ivf_drift_report (the retrain trigger).
# ---------------------------------------------------------------------------
def _ivf_cell_balance_sql() -> str:
    from dl_datalake_spark.queries.simq import _COS_SQL

    cos = (
        _COS_SQL.replace("cv", "__CV__").replace("qv", "e.v").replace("__CV__", "cent.cv")
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
cent AS (
  SELECT label, list(mean_v ORDER BY i) AS cv FROM (
    SELECT label, i, AVG(v) AS mean_v FROM (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings)
    GROUP BY label, i)
  GROUP BY label),
assigned AS (
  SELECT vec_id, cell, sim FROM (
    SELECT e.vec_id, cent.label AS cell, {cos} AS sim,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, cent.label) AS rn
    FROM e CROSS JOIN cent)
  WHERE rn = 1),
per AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         CAST(SUM(CAST(ROUND(sim * 1000000) AS BIGINT)) AS BIGINT) AS su
  FROM assigned GROUP BY cell),
t AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS tot FROM per)
SELECT CAST(cell AS INTEGER) AS cell, n_vectors,
       {ratio_round_sql("n_vectors", "tot")} AS share,
       {ratio_round_sql("su", "n_vectors * 1000000")} AS mean_centroid_sim
FROM per, t
"""


@register("emb_ivf_cell_balance", sql=_ivf_cell_balance_sql())
def emb_ivf_cell_balance(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.similarity import cosine, label_centroids

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cents = label_centroids(emb, "label", "embedding")
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.col("label").alias("cell"),
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    assigned = scored.groupBy("vec_id").agg(
        F.min(F.struct((-F.col("sim")).alias("neg"), F.col("cell").alias("cell"))).alias(
            "best"
        )
    ).select(
        F.col("best.cell").alias("cell"),
        (-F.col("best.neg")).alias("sim"),
    )
    per = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.round(F.col("sim") * 1_000_000).cast("long")).alias("su"),
    )
    t = per.agg(F.sum("n_vectors").alias("tot"))
    return per.crossJoin(F.broadcast(t)).select(
        F.col("cell").cast("int").alias("cell"),
        "n_vectors",
        ratio_round(F.col("n_vectors"), F.col("tot")).alias("share"),
        ratio_round(F.col("su"), F.col("n_vectors") * 1_000_000).alias(
            "mean_centroid_sim"
        ),
    )
