"""Similarity-search queries over `embeddings` (array<float>, dim 64):
brute-force cosine top-k, k-NN join, per-label centroids, and an
LSH-bucketed ANN variant (oracled exactly: approximate vs k-NN, but a
deterministic function of the input).

Cross-engine float discipline: every element is cast to DOUBLE before
arithmetic, accumulation is in-list sequential (F.aggregate ↔
list_sum over a list comprehension), and similarities are rounded to 6
digits before any ordering that feeds a LIMIT.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.operators.similarity import (
    ann_lsh_topk,
    cosine,
    cosine_near_dup_pairs_blas,
    deterministic_planes,
    ivf_topk,
    pairwise_topk_join,
)
from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table

_COS_SQL = """ROUND(
  list_sum([cv[i]*qv[i] for i in generate_series(1, len(cv))]) /
  (sqrt(list_sum([cv[i]*cv[i] for i in generate_series(1, len(cv))])) *
   sqrt(list_sum([qv[i]*qv[i] for i in generate_series(1, len(qv))]))), 6)"""


# ---------------------------------------------------------------------------
# brute-force cosine top-k against the vec_id=0 query vector
# ---------------------------------------------------------------------------
@register(
    "emb_cosine_topk",
    sql=f"""
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings WHERE vec_id <> 0)
SELECT vec_id, {_COS_SQL} AS cos_sim
FROM c, q
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread="bytes")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    return (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# exact k-NN join: top-5 neighbors for each of the first 20 vectors
# ---------------------------------------------------------------------------
@register(
    "emb_knn_join",
    sql=f"""
WITH q AS (SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings)
SELECT q_id, c_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q_id, c_id, {_COS_SQL} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY {_COS_SQL} DESC, c_id) AS rank
  FROM q JOIN c ON q_id <> c_id
) WHERE rank <= 5
""",
)
def emb_knn_join(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread="bytes")
    q = emb.where(F.col("vec_id") < 20)
    # exact broadcast path here (corpus ≤ max_broadcast_rows); above the
    # guard pairwise_topk_join reroutes through LSH-bucketed rerank
    return pairwise_topk_join(q, emb, k=5)


# ---------------------------------------------------------------------------
# per-label centroids via posexplode (fully relational — no UDF)
# ---------------------------------------------------------------------------
@register(
    "emb_label_centroids",
    sql="""
WITH e AS (
  SELECT label, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
d AS (SELECT label, i, AVG(v) AS mean_v FROM e GROUP BY label, i)
SELECT label,
       ROUND(SQRT(SUM(mean_v * mean_v)), 6) AS centroid_norm,
       CAST(COUNT(*) AS INTEGER) AS dim
FROM d GROUP BY label
""",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i0", "v_raw")
    ).select("label", (F.col("i0") + 1).alias("i"), F.col("v_raw").cast("double").alias("v"))
    dims = exploded.groupBy("label", "i").agg(F.avg("v").alias("mean_v"))
    return dims.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("mean_v") * F.col("mean_v"))), 6).alias("centroid_norm"),
        F.count(F.lit(1)).cast("int").alias("dim"),
    )


# ---------------------------------------------------------------------------
# ANN via random-hyperplane LSH buckets (approximate → rows-only check)
# ---------------------------------------------------------------------------
def _ann_lsh_sql() -> str:
    """The LSH ANN result is APPROXIMATE relative to exact k-NN but a
    DETERMINISTIC function of the input (fixed LCG hyperplanes, exact
    sign buckets, rounded-cosine rerank) — so it oracles like any other
    query: replay the same arithmetic in SQL."""
    planes = deterministic_planes(num_planes=6, dim=64)
    bits = []
    for i, pl in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in pl) + "]"
        bits.append(
            f"(CASE WHEN list_sum([v[j] * ({lit})[j] for j in generate_series(1, 64)])"
            f" >= 0 THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(bits)
    cos = _COS_SQL.replace("cv", "c.v").replace("qv", "q.v")
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, CAST({bucket} AS INTEGER) AS bucket FROM e),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, {cos} AS cos_sim
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 20
)
SELECT q_id, c_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register("emb_ann_lsh", sql=_ann_lsh_sql())
def emb_ann_lsh(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    planes = deterministic_planes(num_planes=6, dim=64)
    q = emb.where(F.col("vec_id") < 20)
    return ann_lsh_topk(q, emb, planes, k=5)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (exact all-pairs baseline)
# ---------------------------------------------------------------------------
@register(
    "dedup_emb_cosine",
    sql=f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_COS_SQL.replace("cv", "a.v").replace("qv", "b.v")} AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE cos_sim >= 0.4
""",
)
def dedup_emb_cosine(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread="bytes")
    # BLAS block-matmul variant: bit-identical to the fold-based
    # cosine_near_dup_pairs (validated at sf0.01/sf0.1), ~11× faster
    return cosine_near_dup_pairs_blas(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# semantic dedup: resolve embedding near-dup pairs into groups and list
# the vectors to DROP (everything but the canonical min-id keeper) —
# the embedding-space analogue of the minhash keeper election
# ---------------------------------------------------------------------------
_EMB_PAIRS_SQL = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_COS_SQL.replace("cv", "a.v").replace("qv", "b.v")} >= 0.4
"""


@register(
    "emb_semantic_dedup_drops",
    sql=f"""
WITH RECURSIVE
pairs AS ({_EMB_PAIRS_SQL.strip()}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
)
SELECT node AS drop_id, MIN(r) AS keeper_id
FROM reach GROUP BY node
HAVING node <> MIN(r)
""",
)
def emb_semantic_dedup_drops(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.components import connected_components

    emb = load_table(spark, sf_dir, "embeddings", spread="bytes")
    pairs = cosine_near_dup_pairs_blas(emb, threshold=0.4).select(
        F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b")
    )
    cc = connected_components(pairs)
    return cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("drop_id"), F.col("component").alias("keeper_id")
    )


# ---------------------------------------------------------------------------
# IVF ANN: nearest per-label centroid cell (nprobe=1), exact rerank inside
# ---------------------------------------------------------------------------
@register(
    "emb_ivf_topk",
    sql=f"""
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
assigned AS (
  SELECT q_id, qv, label AS cell FROM (
    SELECT q.q_id, q.qv, cent.label,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY {_COS_SQL} DESC, cent.label) AS rn
    FROM q CROSS JOIN cent)
  WHERE rn = 1
),
c AS (SELECT vec_id AS c_id, label AS c_label, v AS cv FROM e)
SELECT q_id, cell, c_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT a.q_id, a.cell, c.c_id,
         {_COS_SQL.replace("qv", "a.qv").replace("cv", "c.cv")} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY a.q_id
           ORDER BY {_COS_SQL.replace("qv", "a.qv").replace("cv", "c.cv")} DESC,
                    c.c_id) AS rank
  FROM assigned a JOIN c ON c.c_label = a.cell AND c.c_id <> a.q_id)
WHERE rank <= 5
""",
)
def emb_ivf_topk(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", spread="bytes")
    q = emb.where(F.col("vec_id") < 20)
    return ivf_topk(q, emb, k=5)


# ---------------------------------------------------------------------------
# one Lloyd iteration: per-label centroids → reassign every vector to
# its nearest centroid by cosine → migration matrix (old label → new
# cell). The iterative-clustering building block: at 100 TB, each
# round is one broadcast of the tiny centroid table + one scan; the
# migration counts are the convergence signal (diagonal-heavy = done).
# ---------------------------------------------------------------------------
@register(
    "emb_kmeans_step",
    sql="""
WITH e AS (
  SELECT label, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
d AS (SELECT label, i, AVG(v) AS mean_v FROM e GROUP BY label, i),
cents AS (SELECT label AS c_label, list(mean_v ORDER BY i) AS cv FROM d GROUP BY label),
vecs AS (SELECT vec_id, label AS old_label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         FROM embeddings),
scored AS (
  SELECT vec_id, old_label, c_label,
         ROUND(
           list_sum([cv[i]*qv[i] for i in generate_series(1, len(cv))]) /
           (sqrt(list_sum([cv[i]*cv[i] for i in generate_series(1, len(cv))])) *
            sqrt(list_sum([qv[i]*qv[i] for i in generate_series(1, len(qv))]))), 6)
           AS sim
  FROM vecs, cents),
assigned AS (
  SELECT vec_id, old_label, c_label AS new_label, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label) AS rn
  FROM scored)
SELECT CAST(old_label AS INTEGER) AS old_label,
       CAST(new_label AS INTEGER) AS new_label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       -- exact integer half-up mean of the rounded-micro sims: the
       -- float form ROUND(S/N/1e6, 6) flips its last digit when S/N
       -- lands on a half-ulp (seen at sf0.001); shifting by +1e6
       -- keeps the numerator non-negative so // floors identically
       ((2 * (SUM(CAST(ROUND(sim * 1e6) AS BIGINT)) + COUNT(*) * 1000000)
         + COUNT(*)) // (2 * COUNT(*)) - 1000000) / 1e6 AS avg_sim
FROM assigned WHERE rn = 1 GROUP BY old_label, new_label
""",
)
def emb_kmeans_step(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.similarity import cosine, label_centroids

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    cents = label_centroids(emb).select(
        F.col("label").alias("c_label").cast("int"), F.col("cv")
    )
    vecs = emb.select(
        "vec_id",
        F.col("label").alias("old_label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "old_label",
        "c_label",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("c_label"))
    assigned = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return assigned.groupBy(
        F.col("old_label").cast("int").alias("old_label"),
        F.col("c_label").cast("int").alias("new_label"),
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # order-independent mean: per-pair sims are pre-rounded to 6
        # digits, summed as exact integer millionths (float-sum drift
        # can flip the 6th digit), and the mean itself is an exact
        # integer half-up division — float ROUND(S/N/1e6) flips on
        # half-ulp quotients (seen at sf0.001). The +1e6 shift keeps
        # the numerator non-negative so DIV floors identically in both
        # engines.
        (
            F.expr(
                "(2 * (SUM(CAST(ROUND(sim * 1e6) AS BIGINT)) + COUNT(*) * 1000000)"
                " + COUNT(*)) DIV (2 * COUNT(*)) - 1000000"
            )
            / 1e6
        ).alias("avg_sim"),
    )


# ---------------------------------------------------------------------------
# matryoshka truncation audit: top-k overlap of 16-dim prefix vs full 64-dim
# ---------------------------------------------------------------------------
_MRL_DIM = 16
_MRL_NQ = 10
_MRL_K = 10


def _mrl_cos(dim_expr: str) -> str:
    return f"""ROUND(
  list_sum([cv[i]*qv[i] for i in generate_series(1, {dim_expr})]) /
  (sqrt(list_sum([cv[i]*cv[i] for i in generate_series(1, {dim_expr})])) *
   sqrt(list_sum([qv[i]*qv[i] for i in generate_series(1, {dim_expr})]))), 6)"""


@register(
    "emb_matryoshka_overlap",
    sql=f"""
WITH q AS (SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < {_MRL_NQ}),
c AS (SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings),
sim AS (
  SELECT q_id, c_id,
         {_mrl_cos("len(cv)")} AS s_full,
         {_mrl_cos(str(_MRL_DIM))} AS s_tr
  FROM c, q WHERE c_id <> q_id
),
fullk AS (SELECT q_id, c_id FROM
          (SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s_full DESC, c_id) rn
           FROM sim) WHERE rn <= {_MRL_K}),
trk AS (SELECT q_id, c_id FROM
        (SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s_tr DESC, c_id) rn
         FROM sim) WHERE rn <= {_MRL_K})
SELECT f.q_id,
       CAST(COUNT(t.c_id) AS BIGINT) AS n_overlap
FROM fullk f LEFT JOIN trk t ON f.q_id = t.q_id AND f.c_id = t.c_id
GROUP BY f.q_id
""",
)
def emb_matryoshka_overlap(spark: SparkSession, sf_dir: str):
    """Matryoshka-representation audit (Kusupati et al. 2022): how much
    of the exact top-k survives when retrieval runs on the first 16 of
    64 dims. This is the recall dial for prefix-truncated ANN — the
    cheap first-stage retriever at 100 TB scores 4x less data per pair;
    this query measures what that costs on the actual corpus.

    Plan: ONE corpus scan scores both similarities (full + truncated)
    per pair against a broadcast 10-row query side; two per-query
    row_number windows cut the two top-k sets (partition-local sorts of
    k-bounded groups); the overlap join is a tiny equi-join. Nothing
    shuffles the corpus itself more than once.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < _MRL_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    sim = (
        emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
        .crossJoin(F.broadcast(q))
        .where(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("s_full"),
            F.round(
                cosine(
                    F.slice(F.col("cv"), 1, _MRL_DIM), F.slice(F.col("qv"), 1, _MRL_DIM)
                ),
                6,
            ).alias("s_tr"),
        )
    )
    w_full = Window.partitionBy("q_id").orderBy(F.desc("s_full"), F.asc("c_id"))
    w_tr = Window.partitionBy("q_id").orderBy(F.desc("s_tr"), F.asc("c_id"))
    fullk = (
        sim.withColumn("rn", F.row_number().over(w_full))
        .where(F.col("rn") <= _MRL_K)
        .select("q_id", "c_id")
    )
    # both sides descend from `sim`, so join columns must be RENAMED, not
    # qualified — fullk.q_id == trk.q_id resolves to the same lineage id
    # and collapses to a trivially-true predicate (Spark self-join trap)
    trk = (
        sim.withColumn("rn", F.row_number().over(w_tr))
        .where(F.col("rn") <= _MRL_K)
        .select(F.col("q_id").alias("t_qid"), F.col("c_id").alias("t_cid"))
    )
    return (
        fullk.join(
            trk,
            (F.col("q_id") == F.col("t_qid")) & (F.col("c_id") == F.col("t_cid")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("t_cid").alias("n_overlap"))
    )


# ---------------------------------------------------------------------------
# embedding health: per-dimension distribution stats
# ---------------------------------------------------------------------------
@register(
    "emb_dimension_stats",
    sql="""
WITH d AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
)
SELECT CAST(dim AS INTEGER) AS dim,
       ROUND(AVG(v), 6) AS mean_v,
       ROUND(STDDEV_SAMP(v), 6) AS sd_v,
       ROUND(MIN(v), 6) AS min_v,
       ROUND(MAX(v), 6) AS max_v
FROM d GROUP BY 1
""",
)
def emb_dimension_stats(spark: SparkSession, sf_dir: str):
    """Per-dimension embedding distribution — the corpus-health check
    that catches dead dimensions (sd ~ 0), mean drift after a model
    swap, and clipped ranges before they poison every similarity score
    downstream. posexplode keys the hash-agg by dimension index, so
    the whole audit is one narrow explode + one 64-group agg no matter
    the corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    d = emb.select(F.posexplode("embedding").alias("i", "v_raw")).select(
        (F.col("i") + 1).cast("int").alias("dim"),
        F.col("v_raw").cast("double").alias("v"),
    )
    return d.groupBy("dim").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.stddev_samp("v"), 6).alias("sd_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


# ---------------------------------------------------------------------------
# IVF recall audit: recall@5 of the IVF (nprobe=1, label-mean cells)
# retrieval against the exact k-NN for the first 20 query vectors —
# the accuracy dial every ANN deployment reports next to its speedup.
# Both retrievals are deterministic functions of the input, so the
# audit oracles exactly like emb_ivf_topk + emb_knn_join do.
# ---------------------------------------------------------------------------
def _ivf_recall_sql() -> str:
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
assigned AS (
  SELECT q_id, qv, label AS cell FROM (
    SELECT q.q_id, q.qv, cent.label,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY {_COS_SQL} DESC, cent.label) AS rn
    FROM q CROSS JOIN cent)
  WHERE rn = 1
),
c AS (SELECT vec_id AS c_id, label AS c_label, v AS cv FROM e),
approx AS (
  SELECT q_id, c_id FROM (
    SELECT a.q_id, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY a.q_id
                              ORDER BY {a_cos} DESC, c.c_id) AS rank
    FROM assigned a JOIN c ON c.c_label = a.cell AND c.c_id <> a.q_id)
  WHERE rank <= 5
),
exact AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY {_COS_SQL} DESC, c_id) AS rank
    FROM q JOIN c ON c_id <> q_id)
  WHERE rank <= 5
),
hits AS (
  SELECT a.q_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM approx a JOIN exact e2 ON a.q_id = e2.q_id AND a.c_id = e2.c_id
  GROUP BY a.q_id
)
SELECT q.q_id,
       CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(hits.n, 0) AS BIGINT) / 5.0 AS recall
FROM (SELECT DISTINCT q_id FROM q) q LEFT JOIN hits USING (q_id)
ORDER BY q_id
"""


@register("emb_ivf_recall_audit", sql=_ivf_recall_sql())
def emb_ivf_recall_audit(spark: SparkSession, sf_dir: str):
    """recall@5 per query: |IVF top-5 ∩ exact top-5| / 5. Both sides
    reuse the registry's retrieval operators (ivf_topk /
    pairwise_topk_join); the audit itself is one equi-join + one
    20-group agg — negligible next to the retrievals."""
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 20)
    approx = ivf_topk(q, emb, k=5).select("q_id", "c_id")
    exact = pairwise_topk_join(q, emb, k=5).select(
        F.col("q_id").alias("eq_id"), F.col("c_id").alias("ec_id")
    )
    hits = (
        approx.join(
            exact,
            (F.col("q_id") == F.col("eq_id")) & (F.col("c_id") == F.col("ec_id")),
        )
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    qs = q.select(F.col("vec_id").alias("q_id"))
    return (
        qs.join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n"), F.lit(0)) / F.lit(5.0)).alias("recall"),
        )
        .orderBy("q_id")
    )
