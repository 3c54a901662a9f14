"""Third curation/audit batch: Gopher-style top-n-gram coverage, text
normalization + dedup-after-normalization, decile lift tables over a
distributed prefix sum, embedding-norm outlier audits, and the
cross-source exact-duplicate matrix.

Every query keeps the repo's exact-arithmetic discipline: ratios and
means go through functions/exact integer half-up division (never float
ROUND of an aggregated ratio), md5 is the cross-engine content hash,
and doubles only appear where both engines compute them from identical
operand order (per-row vector norms).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.functions.exact import (
    ratio_round,
    ratio_round_sql,
    ratio_units,
    ratio_units_sql,
)
from dl_datalake_spark.operators.dedup import word_shingles
from dl_datalake_spark.operators.similarity import _norm
from dl_datalake_spark.operators.windows import bucketed_cumsum
from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table

# ---------------------------------------------------------------------------
# Gopher-style repetition rule #2: fraction of a document's word-2-grams
# claimed by its single most frequent 2-gram. Complements
# docs_repetition_ratio (distinct/total shingles): a doc can have many
# distinct shingles yet still be dominated by one repeated phrase.
# Flag threshold 0.20 (Gopher uses 0.20 for top-2-gram char coverage).
# ---------------------------------------------------------------------------
_COV_U = ratio_units_sql("top_c", "total")  # coverage in exact micros

@register(
    "docs_top_ngram_coverage",
    sql=rf"""
WITH sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 2 THEN
      [array_to_string(string_split_regex(trim(text), '\s+')[i : i+1], ' ')
       FOR i IN range(1, len(string_split_regex(trim(text), '\s+')))]
    ELSE [] END) AS shingle
  FROM documents),
per AS (SELECT doc_id, shingle, COUNT(*) AS c FROM sh GROUP BY doc_id, shingle),
top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_c,
               CAST(SUM(c) AS BIGINT) AS total
        FROM per GROUP BY doc_id)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN {_COV_U} > 200000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       (({ratio_units_sql(f"SUM({_COV_U})", "COUNT(*)", 0)}) / 1000000.0)
         AS avg_coverage
FROM top JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
""",
)
def docs_top_ngram_coverage(spark: SparkSession, sf_dir: str):
    """Per-lang audit of top-2-gram dominance. One explode + two hash
    aggs — the 100 TB plan is the same shape as word-count; no window,
    no sort. Docs with <2 tokens produce no shingles and are excluded
    on both engines."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = word_shingles(docs.select("doc_id", "text"), n=2, distinct=False)
    per = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("c"))
    top = per.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total")
    )
    cov_u = ratio_units(F.col("top_c"), F.col("total"))  # micros, exact
    return (
        top.withColumn("cov_u", cov_u)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("cov_u") > 200_000).cast("long")).alias("n_flagged"),
            (ratio_units(F.sum("cov_u"), F.count(F.lit(1)), 0) / F.lit(1e6)).alias(
                "avg_coverage"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# text normalization + dedup-after-normalization accounting: how many
# documents collapse together once case/punctuation/whitespace noise is
# removed — the measurement that decides whether a normalize-then-dedup
# stage is worth a full-corpus rewrite.
# ---------------------------------------------------------------------------
_NORM_SQL = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

@register(
    "docs_text_normalize",
    sql=f"""
WITH g AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_raw,
         CAST(COUNT(DISTINCT md5({_NORM_SQL})) AS BIGINT) AS n_distinct_norm
  FROM documents GROUP BY source)
SELECT source, n_docs, n_distinct_raw, n_distinct_norm,
       n_distinct_raw - n_distinct_norm AS n_merged
FROM g ORDER BY source
""",
)
def docs_text_normalize(spark: SparkSession, sf_dir: str):
    """Normalization is pure codegen-stage string expressions (lower,
    two regexp_replace, trim) — no Python, pushes through the scan.
    md5 is the cross-engine content fingerprint."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[.,!?;:]", ""), r"\s+", " "
        )
    )
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct_raw"),
        F.countDistinct(F.md5(norm)).alias("n_distinct_norm"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_distinct_raw",
        "n_distinct_norm",
        (F.col("n_distinct_raw") - F.col("n_distinct_norm")).alias("n_merged"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# decile lift table over customer revenue — the marketing/model-eval
# shape (gain charts). Deciles come from the DISTRIBUTED rank
# (bucketed_cumsum), not NTILE's single-partition global window: the
# textbook NTILE(10) OVER (ORDER BY revenue) sorts the whole customer
# table on one task and dies at 100 TB. Revenue stays in integer cents
# end-to-end, so decile boundaries and shares are exact cross-engine.
# ---------------------------------------------------------------------------
@register(
    "orders_decile_lift",
    sql=f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(ROUND(ROUND(SUM(o_totalprice), 2) * 100) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT rev_c,
         CAST(ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS rnk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_cust,
         CAST(SUM(rev_c) OVER () AS BIGINT) AS tot_c
  FROM per_cust),
d AS (SELECT ((rnk - 1) * 10) // n_cust AS decile, rev_c, tot_c FROM r),
g AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(rev_c) AS BIGINT) AS cents,
         MAX(tot_c) AS tot_c
  FROM d GROUP BY decile)
SELECT decile, n_customers,
       ROUND(cents / 100.0, 2) AS decile_revenue,
       {ratio_round_sql("cents", "tot_c")} AS rev_share,
       {ratio_round_sql(
           "SUM(cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)", "tot_c"
       )} AS cum_share
FROM g ORDER BY decile
""",
)
def orders_decile_lift(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.round(F.sum("o_totalprice"), 2) * 100).cast("long").alias("rev_c")
    )
    ranked = bucketed_cumsum(per_cust, "rev_c", "o_custkey", num_buckets=32)
    n_cust = per_cust.agg(F.count(F.lit(1)).alias("n_cust"))
    g = (
        ranked.crossJoin(F.broadcast(n_cust))  # single-row scalar, O(n)
        .withColumn("decile", F.expr("((rnk - 1) * 10) div n_cust"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev_c").alias("cents"),
            F.max("tot_sum").alias("tot_c"),
        )
    )
    # the post-agg window runs over exactly 10 rows — not a scale risk
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        "decile",
        "n_customers",
        F.round(F.col("cents") / 100.0, 2).alias("decile_revenue"),
        ratio_round(F.col("cents"), F.col("tot_c")).alias("rev_share"),
        ratio_round(F.sum("cents").over(w), F.col("tot_c")).alias("cum_share"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# embedding-norm outlier audit: vectors whose L2 norm strays beyond
# [0.5x, 1.5x] of the corpus mean — catches unnormalized batches, dead
# encoders (norm ~ 0), and fp overflow artifacts before they skew every
# cosine downstream. Norms are quantized to integer micros so the mean
# and both flags are exact integer comparisons cross-engine.
# ---------------------------------------------------------------------------
_NORM_U_SQL = """CAST(ROUND(sqrt(list_sum(
  [v[i]*v[i] for i in generate_series(1, len(v))])) * 1000000, 0) AS BIGINT)"""

@register(
    "emb_norm_outliers",
    sql=f"""
WITH e AS (
  SELECT label,
         {_NORM_U_SQL} AS norm_u
  FROM (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)),
m AS (SELECT {ratio_units_sql("SUM(norm_u)", "COUNT(*)", 0)} AS mean_u FROM e)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN 2 * norm_u > 3 * mean_u THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high,
       CAST(SUM(CASE WHEN 2 * norm_u < mean_u THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low,
       (({ratio_units_sql("SUM(norm_u)", "COUNT(*)", 0)}) / 1000000.0)
         AS avg_norm
FROM e, m
GROUP BY label ORDER BY label
""",
)
def emb_norm_outliers(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    e = emb.select(
        "label",
        # per-row double fold in identical operand order on both
        # engines -> identical bits -> exact after quantization
        F.round(_norm(F.col("embedding")) * 1_000_000, 0).cast("long").alias("norm_u"),
    )
    mean = e.agg(
        ratio_units(F.sum("norm_u"), F.count(F.lit(1)), 0).alias("mean_u")
    )
    return (
        e.crossJoin(F.broadcast(mean))  # single-row scalar, O(n)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum((2 * F.col("norm_u") > 3 * F.col("mean_u")).cast("long")).alias(
                "n_high"
            ),
            F.sum((2 * F.col("norm_u") < F.col("mean_u")).cast("long")).alias("n_low"),
            (ratio_units(F.sum("norm_u"), F.count(F.lit(1)), 0) / F.lit(1e6)).alias(
                "avg_norm"
            ),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# cross-source duplicate matrix on PREFIX fingerprints: for every
# unordered source pair, how many document pairs share the same
# 8-token prefix fingerprint — the audit that decides which source to
# drop when two crawls overlap. Prefix fingerprints (md5 of the first
# k tokens) are the cheap first-pass key real crawl dedup uses before
# the expensive minhash stage: full-content md5 misses docs that only
# append boilerplate. Pair counts are derived from per-(hash, source)
# group sizes (ca*cb), never by enumerating pairs row-by-row.
# ---------------------------------------------------------------------------
@register(
    "dedup_cross_source_matrix",
    sql=r"""
WITH per AS (
  SELECT md5(array_to_string(string_split_regex(trim(text), '\s+')[1:8], ' ')) AS h,
         source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY h, source)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(a.c * b.c) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) AS BIGINT) AS n_groups
FROM per a JOIN per b ON a.h = b.h AND a.source < b.source
GROUP BY source_a, source_b
ORDER BY source_a, source_b
""",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    prefix_fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8))
    )
    per = docs.groupBy(prefix_fp.alias("h"), "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    # self-join: RENAME the join column on one side — same-lineage
    # a.col == b.col silently resolves to one attribute and collapses
    # to a trivially-true predicate (see verify notes)
    a = per.select(
        F.col("h"), F.col("source").alias("source_a"), F.col("c").alias("ca")
    )
    b = per.select(
        F.col("h").alias("hb"), F.col("source").alias("source_b"), F.col("c").alias("cb")
    )
    pairs = a.join(
        b, (F.col("h") == F.col("hb")) & (F.col("source_a") < F.col("source_b"))
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("n_pairs"),
            F.count(F.lit(1)).alias("n_groups"),
        )
        .orderBy("source_a", "source_b")
    )
