"""Curation queries: deterministic stratified sampling, train/val/test
split accounting, and token-budget window packing over `documents` —
the md5-hex-cutoff trick makes every one exactly reproducible in the
DuckDB oracle (hex strings compare identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.operators.curation import (
    assign_split,
    pack_token_budget,
    stratified_sample,
)
from dl_datalake_spark.operators.text import with_token_count
from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.functions.exact import ratio_round, ratio_round_sql, ratio_units, ratio_units_sql
from dl_datalake_spark.tables import load_table

# downsample dominant English to 25%, keep 80% of everything else —
# a typical language-rebalancing mix
_CUTOFFS = {"en": "40", "de": "cc", "es": "cc", "fr": "cc", "zh": "cc"}
_CUT_SQL = (
    "CASE lang WHEN 'en' THEN '40' WHEN 'de' THEN 'cc' WHEN 'es' THEN 'cc' "
    "WHEN 'fr' THEN 'cc' WHEN 'zh' THEN 'cc' ELSE '00' END"
)
_KEY_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"
_BUDGET = 8192


@register(
    "docs_stratified_sample",
    sql=f"""
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {_KEY_SQL} < {_CUT_SQL}
GROUP BY lang ORDER BY lang
""",
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        stratified_sample(docs, "lang", _CUTOFFS)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@register(
    "docs_train_split",
    sql=f"""
SELECT CASE WHEN {_KEY_SQL} < 'cc' THEN 'train'
            WHEN {_KEY_SQL} < 'e6' THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY split, lang
""",
)
def docs_train_split(spark: SparkSession, sf_dir: str):
    docs = assign_split(load_table(spark, sf_dir, "documents", spread=True))
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "docs_pack_windows",
    sql=rf"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens
  FROM documents),
c AS (
  SELECT lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           - n_tokens AS cum_before
  FROM t)
SELECT lang, cum_before // {_BUDGET} AS window_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY lang, window_id
""",
)
def docs_pack_windows(spark: SparkSession, sf_dir: str):
    # spread="bytes" (r13): token counting + a per-lang window is
    # byte-light; the 32-way fan-out was task overhead (interleaved:
    # 0.373 -> 0.232 s, identical results).
    docs = with_token_count(load_table(spark, sf_dir, "documents", spread="bytes"))
    packed = pack_token_budget(docs, _BUDGET)
    return packed.groupBy("lang", "window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# ---------------------------------------------------------------------------
# decontamination: flag documents sharing any word-5-gram with a benchmark
# corpus (here: src0 stands in for the eval set). The benchmark side is
# tiny by construction, so its shingle set broadcasts — at 100 TB the scan
# side never shuffles; this is a broadcast semi-join per document.
# ---------------------------------------------------------------------------
@register(
    "docs_decontaminate",
    sql=r"""
WITH sh AS (
  SELECT doc_id, source, lang, unnest(
    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 5 THEN
      [array_to_string(string_split_regex(trim(text), '\s+')[i : i+4], ' ')
       FOR i IN range(1, len(string_split_regex(trim(text), '\s+')) - 3)]
    ELSE [] END) AS shingle
  FROM documents),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
flagged AS (
  SELECT DISTINCT sh.doc_id, sh.lang
  FROM sh JOIN bench USING (shingle)
  WHERE sh.source <> 'src0')
SELECT lang, COUNT(*) AS n_contaminated FROM flagged GROUP BY lang ORDER BY lang
""",
)
def docs_decontaminate(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.dedup import shingle_array, tokens

    docs = load_table(spark, sf_dir, "documents", spread=True)
    # Carry source/lang THROUGH the explode (r12, guide §2): the old
    # shape joined the exploded shingle table back to docs by doc_id —
    # a shuffle of the biggest table in the plan just to pick up two
    # small columns that were sitting on the row before the explode.
    # Duplicating them per shingle is free (no exchange); the join,
    # its two exchanges, and one parquet scan disappear.
    sh = docs.select(
        "doc_id", "source", "lang", tokens("text").alias("w")
    ).select(
        "doc_id",
        "source",
        "lang",
        F.explode(shingle_array(F.col("w"), 5)).alias("shingle"),
    )
    bench = sh.where(F.col("source") == "src0").select("shingle").distinct()
    return (
        sh.where(F.col("source") != "src0")
        .join(F.broadcast(bench), "shingle", "leftsemi")
        .select("doc_id", "lang")
        .distinct()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# repetition detection (Gopher-style quality rule): fraction of duplicate
# word-3-grams within each document; one explode + one two-level hash agg
# ---------------------------------------------------------------------------
@register(
    "docs_repetition_ratio",
    sql=r"""
WITH sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3 THEN
      [array_to_string(string_split_regex(trim(text), '\s+')[i : i+2], ' ')
       FOR i IN range(1, len(string_split_regex(trim(text), '\s+')) - 1)]
    ELSE [] END) AS shingle
  FROM documents),
per_doc AS (
  SELECT doc_id, COUNT(*) AS total,
         COUNT(DISTINCT shingle) AS n_distinct
  FROM sh GROUP BY doc_id)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN 1000000 - ((2 * CAST(pd.n_distinct AS BIGINT) * 1000000 + CAST(pd.total AS BIGINT)) // (2 * CAST(pd.total AS BIGINT))) > 200000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       ((2 * CAST(SUM(1000000 - ((2 * CAST(pd.n_distinct AS BIGINT) * 1000000 + CAST(pd.total AS BIGINT)) // (2 * CAST(pd.total AS BIGINT)))) AS BIGINT) * 1000000 + CAST(COUNT(*) * 1000000 AS BIGINT)) // (2 * CAST(COUNT(*) * 1000000 AS BIGINT))) / 1000000.0 AS avg_rep_ratio
FROM per_doc pd JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
""",
)
def docs_repetition_ratio(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.dedup import shingle_array, tokens

    docs = load_table(spark, sf_dir, "documents", spread=True)
    # r12 (guide §2): lang rides THROUGH the explode, so the join of
    # the per-doc agg back to docs disappears (its only purpose was
    # re-attaching lang). The explode + two-level hash agg itself
    # stays: a row-local size/array_distinct variant was tried and
    # REVERTED — array_distinct on array<string> takes Spark's
    # quadratic non-primitive path (measured 1.4 → 9.4 s at sf0.1),
    # while countDistinct over exploded rows is a codegen'd hash agg.
    sh = docs.select("doc_id", "lang", tokens("text").alias("w")).select(
        "doc_id",
        "lang",
        F.explode(shingle_array(F.col("w"), 3)).alias("shingle"),
    )
    per_doc = sh.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("shingle").alias("n_distinct"),
    )
    # per-doc repetition in exact integer MICROS (1e6 - halfup(d/t·1e6)):
    # both the >0.2 flag and the average then never touch a float until
    # the final /1e6 — immune to cross-engine half-ulp ROUND flips
    rep_micros = F.lit(1_000_000) - ratio_units(
        F.col("n_distinct"), F.col("total")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((rep_micros > 200_000).cast("long")).alias("n_repetitive"),
            ratio_round(
                F.sum(rep_micros), F.count(F.lit(1)) * 1_000_000
            ).alias("avg_rep_ratio"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# the full curation pipeline in ONE plan: exact-dedup keeper ∧ quality
# floor ∧ repetition cap ∧ train split — the
# "documents in → clean training corpus out" composition. Every stage is
# the already-oracled operator; composing them exercises Catalyst's
# ability to fuse four filters into one scan + a handful of hash aggs.
# ---------------------------------------------------------------------------
def _pipeline_sql() -> str:
    return r"""
WITH base AS (
  SELECT doc_id, lang, text,
         string_split_regex(trim(text), '\s+') AS toks,
         CAST(LENGTH(text) AS INTEGER) AS n_chars
  FROM documents),
q AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         CASE WHEN len(toks) < 5 THEN 0.0
              ELSE ROUND(0.4 * LEAST(len(toks) / 100.0, 1.0)
                   + 0.3 * (1.0 - LEAST((LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')))
                                        / GREATEST(n_chars, 1), 1.0))
                   + 0.3 * LEAST(CAST(len(list_filter(toks, w -> lower(w) IN ('the','a','of','and','to'))) AS INTEGER)
                                 / GREATEST(len(toks), 1) * 10, 1.0), 6)
         END AS quality
  FROM base),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3 THEN
      [array_to_string(string_split_regex(trim(text), '\s+')[i : i+2], ' ')
       FOR i IN range(1, len(string_split_regex(trim(text), '\s+')) - 1)]
    ELSE [] END) AS shingle
  FROM documents),
rep AS (
  SELECT doc_id, 1000000 - ((2 * CAST(COUNT(DISTINCT shingle) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) AS rep_micros
  FROM sh GROUP BY doc_id),
keeper AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
kept AS (
  SELECT b.doc_id, b.lang, q.n_tokens
  FROM base b
  JOIN q USING (doc_id)
  LEFT JOIN rep USING (doc_id)
  WHERE q.quality >= 0.5
    AND COALESCE(rep.rep_micros, 0) <= 200000
    AND b.doc_id IN (SELECT doc_id FROM keeper)
    AND substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 2) < 'cc')
SELECT d.lang,
       COUNT(*) AS n_in,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(k.n_tokens), 0) AS BIGINT) AS kept_tokens
FROM documents d LEFT JOIN kept k USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""


@register("docs_curation_pipeline", sql=_pipeline_sql())
def docs_curation_pipeline(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    from dl_datalake_spark.operators.curation import hash_key
    from dl_datalake_spark.operators.dedup import shingle_array, tokens
    from dl_datalake_spark.operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents", spread=True)
    # Single-pass shape (r12, guide §2): the old composition scanned
    # documents 5× and joined 4× (quality join, repetition join,
    # exact-dedup semi-join, final left join back to docs — 12
    # Exchanges). Every stage is expressible on the row itself:
    # - quality is a pure projection (with_quality_score);
    # - the repetition score needs only THIS doc's shingles, so
    #   countDistinct-over-exploded-shingles collapses to
    #   size(array_distinct(shingle_array)) — no explode, no shuffle,
    #   no join-back;
    # - the exact-dedup keeper (min doc_id per md5(text)) becomes a
    #   window min over md5(text) — one narrow shuffle; at scale this
    #   moves the same bytes the old agg did (text hashes are mostly
    #   unique, so partial aggregation reduced nothing);
    # - "kept" becomes a boolean, so the final docs⋈kept left join is
    #   conditional aggregation on the same rows.
    # One parquet scan, three Exchanges (window, group-by-lang, sort);
    # results bit-identical (same expressions, same oracle).
    # Materialize the shingle array and its set sizes as their own
    # projection columns: ratio_units + the when-guard reference them
    # repeatedly, and inlining would re-evaluate the (non-codegen HOF)
    # transform per reference — CollapseProject keeps a multiply-used
    # non-cheap expression materialized, so the transform runs ONCE per
    # row (verified in the plan: 21 inline concat_ws occurrences → 1).
    rep_micros = F.when(
        F.col("_nsh") > 0,
        F.lit(1_000_000) - ratio_units(F.col("_ndist"), F.col("_nsh")),
    ).otherwise(F.lit(0))
    enriched = (
        with_quality_score(docs)
        .withColumn("w", tokens("text"))
        .withColumn("_sharr", shingle_array(F.col("w"), 3))
        .withColumn("_nsh", F.size("_sharr").cast("long"))
        .withColumn("_ndist", F.size(F.array_distinct("_sharr")).cast("long"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "quality",
            rep_micros.alias("rep_micros"),
            F.md5(F.col("text")).alias("_tkey"),
            (hash_key("doc_id") < F.lit("cc")).alias("_in_split"),
        )
    )
    kept = (
        (F.col("quality") >= 0.5)
        & (F.col("rep_micros") <= 200_000)
        & (F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("_tkey")))
        & F.col("_in_split")
    )
    return (
        enriched.withColumn("_kept", kept)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.count(F.when(F.col("_kept"), F.lit(1))).alias("n_kept"),
            F.coalesce(F.sum(F.when(F.col("_kept"), F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# graded contamination: per-document fraction of DISTINCT 5-gram
# shingles that also occur in the benchmark set (source = src0) — the
# continuous score behind the binary decontamination drop, used to set
# eviction thresholds instead of dropping on any single collision.
# ---------------------------------------------------------------------------
@register(
    "docs_contamination_overlap",
    sql=r"""
WITH sh AS (
  SELECT DISTINCT doc_id, source, unnest(
    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 5 THEN
      [array_to_string(string_split_regex(trim(text), '\s+')[i : i+4], ' ')
       FOR i IN range(1, len(string_split_regex(trim(text), '\s+')) - 3)]
    ELSE [] END) AS shingle
  FROM documents),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
probe AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0'),
hits AS (
  SELECT p.doc_id, COUNT(*) AS n_hit
  FROM probe p JOIN bench USING (shingle) GROUP BY p.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM probe GROUP BY doc_id)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_shingles, 6) AS overlap
FROM sizes s LEFT JOIN hits h USING (doc_id)
WHERE s.doc_id < 300 OR h.n_hit > 0
""",
)
def docs_contamination_overlap(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = word_shingles(docs.select("doc_id", "text"), n=5, distinct=True)
    meta = docs.select("doc_id", "source")
    sh = sh.join(meta, "doc_id")
    bench = sh.where(F.col("source") == "src0").select("shingle").distinct()
    probe = sh.where(F.col("source") != "src0").select("doc_id", "shingle")
    # benchmark sets are tiny next to the corpus — broadcast semi-join,
    # same shape as docs_decontaminate; sizes and hits share the probe
    hits = (
        probe.join(F.broadcast(bench), "shingle", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    sizes = probe.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    joined = sizes.join(hits, "doc_id", "left").withColumn(
        "n_hit", F.coalesce(F.col("n_hit"), F.lit(0))
    )
    return joined.where((F.col("doc_id") < 300) | (F.col("n_hit") > 0)).select(
        "doc_id",
        "n_shingles",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_shingles"), 6).alias("overlap"),
    )
