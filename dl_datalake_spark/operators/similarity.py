"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane) variant as the scale path: at 100 TB / billions of
vectors the bucket join turns O(n·q) into ~O(n) with per-bucket
refinement, and both stages stay in JVM expressions (F.aggregate /
zip_with — no Python, no UDF serialization).

Float discipline: elements are cast to double BEFORE any arithmetic and
accumulation is a sequential left fold (F.aggregate), so results are
bit-reproducible and match a SQL oracle that does the same fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector (brute force).

    The query is a literal array → broadcast to every task; the scan is
    embarrassingly parallel; top-k is TakeOrderedAndProject (no global
    sort materialization).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def pairwise_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN join: for every query vector, top-k corpus neighbors.

    Broadcast the smaller side; rank per query with a window. Exact —
    the oracle-checkable baseline for ANN variants.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = q.join(F.broadcast(c), F.col("q_id") != F.col("c_id")).select(
        "q_id",
        "c_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplane_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(v · plane_i).

    `planes` are driver-provided deterministic pseudo-random vectors;
    at scale the bucket id becomes the shuffle/join key so candidate
    generation never goes quadratic.
    """
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.withColumn("bucket", sig.cast("int"))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN: exact rerank within hyperplane buckets."""
    qb = hyperplane_buckets(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    cb = hyperplane_buckets(corpus, planes, id_col, vec_col).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    scored = qb.join(cb, "bucket").where(F.col("q_id") != F.col("c_id")).select(
        "q_id",
        "c_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
