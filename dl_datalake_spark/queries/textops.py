"""Text-analysis queries over `documents`: token counting, quality
scoring, language ID, fingerprinting — all pure Column expressions
(JVM-side codegen, no UDFs) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.operators.text import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_count,
)
from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table

_STOP_EN = "('the','a','of','and','to')"


# ---------------------------------------------------------------------------
# token stats per language
# ---------------------------------------------------------------------------
@register(
    "docs_token_stats",
    sql=r"""
WITH t AS (
  SELECT lang, n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ((2 * CAST(SUM(n_tokens) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS avg_tokens,
       ((2 * CAST(SUM(n_chars) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS avg_chars
FROM t GROUP BY lang
""",
)
def docs_token_stats(spark: SparkSession, sf_dir: str):
    docs = with_token_count(load_table(spark, sf_dir, "documents", spread=True))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        ratio_round(F.sum("n_tokens"), F.count(F.lit(1))).alias("avg_tokens"),
        ratio_round(F.sum("n_chars"), F.count(F.lit(1))).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# per-document quality score
# ---------------------------------------------------------------------------
@register(
    "docs_quality_score",
    sql=rf"""
WITH t AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS INTEGER) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
         CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS punct_count,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              w -> lower(w) IN {_STOP_EN})) AS INTEGER) AS stop_hits
  FROM documents
)
SELECT doc_id, n_tokens, punct_count,
       ROUND((n_chars - (n_tokens - 1)) / n_tokens, 6) AS mean_token_len,
       CASE WHEN n_tokens < 5 THEN 0.0
            ELSE ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
                     + 0.3 * (1.0 - LEAST(punct_count / GREATEST(n_chars, 1), 1.0))
                     + 0.3 * LEAST(stop_hits / GREATEST(n_tokens, 1) * 10, 1.0), 6)
       END AS quality
FROM t
""",
)
def docs_quality_score(spark: SparkSession, sf_dir: str):
    docs = with_quality_score(load_table(spark, sf_dir, "documents", spread=True))
    return docs.select("doc_id", "n_tokens", "punct_count", "mean_token_len", "quality")


# ---------------------------------------------------------------------------
# language-ID confusion matrix (stopword-vote heuristic)
# ---------------------------------------------------------------------------
def _duckdb_lang_sql() -> str:
    from dl_datalake_spark.operators.text import LANG_STOPWORDS

    hit_cols = []
    for lang in sorted(LANG_STOPWORDS):
        lst = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        hit_cols.append(
            f"CAST(len(list_filter(toks, w -> lower(w) IN ({lst}))) AS INTEGER) AS h_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)
    mx = "GREATEST(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(f"WHEN h_{lang} = mx THEN '{lang}'" for lang in langs) + " END"
    return rf"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
),
h AS (SELECT doc_id, lang, {", ".join(hit_cols)} FROM t),
p AS (SELECT doc_id, lang, {mx} AS mx, {case} AS pred_lang FROM h)
SELECT lang, pred_lang, COUNT(*) AS n
FROM p GROUP BY lang, pred_lang
"""


@register("docs_lang_id", sql=_duckdb_lang_sql())
def docs_lang_id(spark: SparkSession, sf_dir: str):
    docs = with_lang_id(load_table(spark, sf_dir, "documents", spread=True))
    return docs.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# normalization-invariant fingerprint per document
# ---------------------------------------------------------------------------
@register(
    "docs_fingerprint",
    sql=r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(lower(trim(text)), '[.,!?;:]', '', 'g'),
                          '\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
)
def docs_fingerprint(spark: SparkSession, sf_dir: str):
    return with_fingerprint(load_table(spark, sf_dir, "documents", spread=True)).select(
        "doc_id", "fingerprint"
    )


# ---------------------------------------------------------------------------
# cross-modal join: per-embedding-cluster document quality
# ---------------------------------------------------------------------------
@register(
    "docs_emb_quality_by_cluster",
    sql=rf"""
WITH t AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS INTEGER) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
         CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS punct_count,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              w -> lower(w) IN {_STOP_EN})) AS INTEGER) AS stop_hits
  FROM documents
),
q AS (
  SELECT doc_id,
         CASE WHEN n_tokens < 5 THEN 0.0
              ELSE ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
                       + 0.3 * (1.0 - LEAST(punct_count / GREATEST(n_chars, 1), 1.0))
                       + 0.3 * LEAST(stop_hits / GREATEST(n_tokens, 1) * 10, 1.0), 6)
         END AS quality
  FROM t
)
SELECT label AS cluster,
       COUNT(*) AS n_docs,
       ((2 * CAST(SUM(CAST(ROUND(quality * 1e6) AS BIGINT)) AS BIGINT) * 1000000 + CAST(COUNT(*) * 1000000 AS BIGINT)) // (2 * CAST(COUNT(*) * 1000000 AS BIGINT))) / 1000000.0 AS avg_quality,
       ROUND(MIN(quality), 6) AS min_quality
FROM q JOIN embeddings ON doc_id = vec_id
GROUP BY label
""",
)
def docs_emb_quality_by_cluster(spark: SparkSession, sf_dir: str):
    """Text quality ⋈ embedding clusters — the curation query a
    training-data pipeline runs to find low-quality embedding cells.
    The embedding side is dim-sized per cluster → broadcast."""
    docs = with_quality_score(load_table(spark, sf_dir, "documents", spread=True))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        docs.join(F.broadcast(emb), docs.doc_id == emb.vec_id)
        .groupBy(F.col("label").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ratio_round(
                F.sum(F.round(F.col("quality") * 1e6).cast("long")),
                F.count(F.lit(1)) * 1_000_000,
            ).alias("avg_quality"),
            F.round(F.min("quality"), 6).alias("min_quality"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-ish token budget: per language, regex pre-token counts next to
# whitespace counts — the estimator a token-budget planner runs before
# committing compute. One regexp_count per row, no explode.
# ---------------------------------------------------------------------------
@register(
    "docs_bpe_token_stats",
    sql=r"""
WITH t AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS INTEGER) AS n_bpe,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_ws
  FROM documents
)
SELECT lang,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
       ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS bpe_per_word
FROM t GROUP BY lang
""",
)
def docs_bpe_token_stats(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.text import with_bpe_token_count

    docs = with_bpe_token_count(
        with_token_count(load_table(spark, sf_dir, "documents", spread=True))
    )
    return docs.groupBy("lang").agg(
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.sum("n_tokens").alias("total_ws_tokens"),
        F.round(
            F.sum("n_bpe_tokens").cast("double") / F.sum("n_tokens"), 6
        ).alias("bpe_per_word"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms: the 3 most characteristic words of each document
# (doc_id < 50) — tf * ln(N/df) over whitespace tokens of length >= 4,
# ties cut by term. The classic "what is this document about" signal a
# curation pipeline uses for topic balancing.
# ---------------------------------------------------------------------------
@register(
    "docs_tfidf_topterms",
    sql=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
tok4 AS (SELECT doc_id, term FROM tok WHERE len(term) >= 4),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok4 GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok4 GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.term
         ) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
WHERE rnk <= 3 AND doc_id < 50
""",
)
def docs_tfidf_topterms(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    ).where(F.length("term") >= 4)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    # df and n_docs are per-term / scalar side tables — broadcast both;
    # the only real shuffle is the (doc_id, term) tf hash-agg
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf_raw", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where((F.col("rnk") <= 3) & (F.col("doc_id") < 50))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram language-model scoring: average log-probability of each
# document's tokens under the corpus unigram distribution — the cheap
# perplexity proxy curation pipelines use to drop gibberish and
# boilerplate outliers. The LM is "trained" on the WHOLE corpus (one
# token-count agg); only docs < 200 are scored/returned to keep the
# result set bounded.
# ---------------------------------------------------------------------------
@register(
    "docs_unigram_logprob",
    sql=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
vocab AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tok)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(LN(c / t)), 6) AS avg_logprob
FROM tok JOIN vocab USING (term) CROSS JOIN tot
WHERE doc_id < 200
GROUP BY doc_id
""",
)
def docs_unigram_logprob(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    # LM counts over the FULL corpus; per-token totals are one hash agg
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("t"))
    # score only the bounded output slice — the filter prunes the probe
    # side BEFORE the join, the vocab side still sees every token
    return (
        tok.where(F.col("doc_id") < 200)
        .join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.ln(F.col("c") / F.col("t"))), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf-law fit: regress log(frequency) on log(rank) over the top-1000
# corpus terms. Natural corpora slope toward ~-1; a synthetic or
# template-heavy corpus shows up immediately as a flat or kinked
# slope, making this a one-number corpus-health probe. One token
# explode → term hash-agg → top-k rank window over the (tiny)
# aggregate → regr_* fold.
# ---------------------------------------------------------------------------
@register(
    "docs_zipf_fit",
    sql=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
freq AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rnk
  FROM freq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(LN(c), LN(rnk)), 6) AS zipf_slope,
       ROUND(regr_intercept(LN(c), LN(rnk)), 6) AS zipf_intercept,
       ROUND(regr_r2(LN(c), LN(rnk)), 6) AS fit_r2
FROM ranked WHERE rnk <= 1000
""",
)
def docs_zipf_fit(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # top-1000 via TakeOrderedAndProject (distributed heaps), then rank
    # the k survivors — a bare row_number window here would sort the
    # whole vocabulary on a single partition first
    top = freq.orderBy(F.desc("c"), F.asc("term")).limit(1000)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("term")))
    )
    lc, lr = F.ln("c"), F.ln("rnk")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 6).alias("fit_r2"),
    )


# ---------------------------------------------------------------------------
# cluster topic labeling: top distinctive terms per embedding cluster
# ---------------------------------------------------------------------------
@register(
    "docs_cluster_topics",
    sql=r"""
WITH tok AS (
  SELECT e.label AS cluster, unnest(string_split_regex(trim(d.text), '\s+')) AS term
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
tf AS (SELECT cluster, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       FROM (SELECT DISTINCT cluster, term FROM tf) GROUP BY 1),
nc AS (SELECT CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n FROM tf),
scored AS (
  SELECT tf.cluster, tf.term, tf.tf,
         ROUND(tf.tf * ln(nc.n * 1.0 / df.df), 6) AS score
  FROM tf JOIN df USING (term), nc
)
SELECT cluster, term, tf, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                   ORDER BY score DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def docs_cluster_topics(spark: SparkSession, sf_dir: str):
    """Topic labels for embedding clusters: per cluster, the 3 terms
    with the highest cluster-level TF-IDF (tf within the cluster x
    ln(#clusters/df across clusters)). This is the human-readable
    answer to "what did k-means actually find" — the audit you run
    after emb_kmeans_step/semantic dedup before trusting cluster-level
    decisions.

    Plan: docs⋈embeddings is an id equi-join; tf is one hash-agg over
    the exploded tokens keyed (cluster, term); df (vocab-sized) equi-joins
    back; the one-row cluster count broadcasts. Top-3 per cluster
    sorts k-bounded groups. Token explosion is the only corpus-sized
    stage and it shuffles once.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("label").alias("cluster")
    )
    tok = (
        docs.join(emb, "doc_id")
        .select(
            "cluster",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
    )
    tf = tok.groupBy("cluster", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.select("cluster", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    nc = tf.agg(F.countDistinct("cluster").alias("n"))
    # df is VOCAB-sized — no broadcast hint; the term equi-join lets
    # AQE pick broadcast at toy scale and shuffle-hash at corpus scale
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(nc))
        .select(
            "cluster",
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("cluster", "term", "tf", "score")
    )


# ---------------------------------------------------------------------------
# heavy-hitters sketch audit: approx_top_k vs the exact top words
# ---------------------------------------------------------------------------
@register(
    "docs_heavy_hitters_audit",
    sql="""
WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w
      WHERE LENGTH(word) >= 4 GROUP BY 1)
SELECT word, n, TRUE AS in_sketch_topk
FROM f ORDER BY n DESC, word LIMIT 5
""",
)
def docs_heavy_hitters_audit(spark: SparkSession, sf_dir: str):
    """Frequent-items sketch audit (same contract family as the HLL and
    quantile audits): the exact top-5 words must all surface in
    approx_top_k's top-10 — the oracle pins the exact counts plus a
    literal TRUE, so a sketch regression (losing a true heavy hitter)
    fails the value hash. Zipf-shaped corpora put the top-5 far above
    the rank-10 boundary, so sketch tie-breaking can't flip the claim.

    Scale: approx_top_k is a bounded-memory mergeable sketch — the
    100 TB path when the exact vocabulary agg (linear state) stops
    fitting; this query is the accuracy contract for that swap.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.length("word") >= 4)
    exact_top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(5)
        .collect()
    )
    sketch = words.agg(F.expr("approx_top_k(word, 10, 100000)").alias("tk")).first()[
        "tk"
    ]
    sketch_words = {r["item"] for r in sketch}
    return spark.createDataFrame(
        [(r["word"], r["n"], r["word"] in sketch_words) for r in exact_top],
        "word string, n long, in_sketch_topk boolean",
    )


# ---------------------------------------------------------------------------
# classifier metrics from the lang-ID confusion matrix
# ---------------------------------------------------------------------------
def _lang_f1_sql() -> str:
    # reuse the confusion-matrix CTE body, then per-language P/R/F1 in
    # exact integer micros (tp, fp, fn are counts)
    conf = _duckdb_lang_sql().strip().rstrip()
    p_m = ratio_round_sql("tp", "tp + fp")
    r_m = ratio_round_sql("tp", "tp + fn")
    f_m = ratio_round_sql("2 * tp", "2 * tp + fp + fn")
    return f"""
WITH conf AS ({conf}),
m AS (
  SELECT l.lang,
         CAST(COALESCE((SELECT SUM(n) FROM conf c
                        WHERE c.lang = l.lang AND c.pred_lang = l.lang), 0) AS BIGINT) AS tp,
         CAST(COALESCE((SELECT SUM(n) FROM conf c
                        WHERE c.pred_lang = l.lang AND c.lang <> l.lang), 0) AS BIGINT) AS fp,
         CAST(COALESCE((SELECT SUM(n) FROM conf c
                        WHERE c.lang = l.lang AND c.pred_lang <> l.lang), 0) AS BIGINT) AS fn
  FROM (SELECT DISTINCT lang FROM conf) l
)
SELECT lang, tp, fp, fn,
       {p_m} AS precision_,
       {r_m} AS recall_,
       {f_m} AS f1
FROM m
"""


@register("docs_lang_id_f1", sql=_lang_f1_sql())
def docs_lang_id_f1(spark: SparkSession, sf_dir: str):
    """Per-language precision/recall/F1 of the stopword-vote language
    classifier, derived from the same confusion matrix docs_lang_id
    emits — the evaluation loop a pipeline runs after touching the
    classifier. All three metrics are exact integer micro-ratios
    (functions/exact): counts in, counts out, no float until the final
    /1e6.
    """
    conf = docs_lang_id(spark, sf_dir)
    langs = conf.select(F.col("lang")).distinct()
    tp = conf.where(F.col("lang") == F.col("pred_lang")).groupBy("lang").agg(
        F.sum("n").alias("tp")
    )
    fp = (
        conf.where(F.col("lang") != F.col("pred_lang"))
        .groupBy(F.col("pred_lang").alias("lang"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = conf.where(F.col("lang") != F.col("pred_lang")).groupBy("lang").agg(
        F.sum("n").alias("fn")
    )
    m = (
        langs.join(tp, "lang", "left")
        .join(fp, "lang", "left")
        .join(fn, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    return m.select(
        "lang",
        "tp",
        "fp",
        "fn",
        ratio_round(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_"),
        ratio_round(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_"),
        ratio_round(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")).alias(
            "f1"
        ),
    )


# ---------------------------------------------------------------------------
# length-distribution drift per source: chi-square vs the corpus mix
# ---------------------------------------------------------------------------
@register(
    "docs_length_drift_chi2",
    sql="""
WITH b AS (
  SELECT source,
         LEAST(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) // 20, 7)
           AS len_bucket
  FROM documents
),
obs AS (SELECT source, len_bucket, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY 1, 2),
st AS (SELECT source, CAST(SUM(o) AS BIGINT) AS s FROM obs GROUP BY 1),
bt AS (SELECT len_bucket, CAST(SUM(o) AS BIGINT) AS t FROM obs GROUP BY 1),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT obs.source, obs.o, st.s * bt.t * 1.0 / n.n AS e
  FROM obs JOIN st USING (source) JOIN bt USING (len_bucket), n
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2
FROM cells GROUP BY source
""",
)
def docs_length_drift_chi2(spark: SparkSession, sf_dir: str):
    """Per-source length-distribution drift: chi-square of each
    source's token-length histogram (20-token bins, capped at 8) against
    the corpus marginal — the monitor that flags a source whose content
    shape changed (truncation bugs, boilerplate floods) even when its
    volume didn't. Same contingency machinery as the brand/type test,
    sliced per source.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    b = docs.select(
        "source",
        F.least(
            (F.size(F.split(F.trim("text"), r"\s+")).cast("long") / 20).cast("long"),
            F.lit(7),
        ).alias("len_bucket"),
    )
    obs = b.groupBy("source", "len_bucket").agg(F.count(F.lit(1)).alias("o"))
    st = obs.groupBy("source").agg(F.sum("o").alias("s"))
    bt = obs.groupBy("len_bucket").agg(F.sum("o").alias("t"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(st, "source")
        .join(F.broadcast(bt), "len_bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "source", "o", (F.col("s") * F.col("t") / F.col("n")).alias("e")
        )
    )
    return cells.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")), 4
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth: distinct terms at corpus prefixes
# ---------------------------------------------------------------------------
@register(
    "docs_vocab_growth",
    sql="""
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
q AS (SELECT unnest([25, 50, 75, 100]) AS pct),
pts AS (SELECT pct, (SELECT m FROM mx) * pct // 100 AS cutoff FROM q),
t AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents)
SELECT CAST(p.pct AS INTEGER) AS pct,
       CAST(p.cutoff AS BIGINT) AS cutoff_doc,
       CAST(COUNT(DISTINCT t.term) AS BIGINT) AS vocab,
       CAST(COUNT(*) AS BIGINT) AS tokens
FROM pts p JOIN t ON t.doc_id <= p.cutoff
GROUP BY p.pct, p.cutoff
""",
)
def docs_vocab_growth(spark: SparkSession, sf_dir: str):
    """Heaps'-law curve: vocabulary size at 25/50/75/100% corpus
    prefixes (by doc_id order). Sub-linear growth is the healthy
    shape; a vocabulary growing LINEARLY flags unbounded junk tokens
    (mojibake, ids, hashes) that will blow up any downstream token
    table. One token explode joined to four cutoff rows — the explode
    fans 4x but stays a narrow map; each (pct) group is a distinct-agg.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    mx = docs.agg(F.max("doc_id").alias("m"))
    pts = (
        spark.range(1, 5)
        .select((F.col("id") * 25).cast("int").alias("pct"))
        .crossJoin(F.broadcast(mx))
        .select("pct", ((F.col("m") * F.col("pct")) / 100).cast("long").alias("cutoff_doc"))
    )
    t = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    return (
        t.join(F.broadcast(pts), t.doc_id <= pts.cutoff_doc)
        .groupBy("pct", "cutoff_doc")
        .agg(
            F.countDistinct("term").alias("vocab"),
            F.count(F.lit(1)).alias("tokens"),
        )
    )
