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


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Precompute the vector norm once per row. Higher-order array
    functions are interpreted (not codegen'd), so folds are the cost
    unit of every similarity op: computing each side's norm once per
    VECTOR instead of once per PAIR cuts an all-pairs scoring from 3
    folds/pair to 1 with bit-identical results (the norm is the same
    double either way)."""
    return df.withColumn(out, _norm(F.col(vec_col)))


def cosine_scored(a_vec, b_vec, a_norm, b_norm):
    """cosine() with both norms precomputed via _with_norm."""
    return _dot(a_vec, b_vec) / (F.col(a_norm) * F.col(b_norm))


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
    q = _with_norm(queries, vec_col, "_qn").select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), F.col("_qn").alias("q_nrm")
    )
    c = _with_norm(corpus, vec_col, "_cn").select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), F.col("_cn").alias("c_nrm")
    )
    scored = q.join(F.broadcast(c), F.col("q_id") != F.col("c_id")).select(
        "q_id",
        "c_id",
        F.round(
            cosine_scored(F.col("q_vec"), F.col("c_vec"), "q_nrm", "c_nrm"), 6
        ).alias("cos_sim"),
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


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid vectors via posexplode + hash agg — fully
    relational (no UDF, no driver collect). Returns (label, cv) where
    cv is array<double>. These double as IVF coarse-quantizer cells:
    the centroid table is tiny (one row per label) and broadcastable.
    """
    exploded = df.select(
        F.col(label_col).alias("label"), F.posexplode(F.col(vec_col)).alias("i", "v_raw")
    ).select("label", "i", F.col("v_raw").cast("double").alias("v"))
    dims = exploded.groupBy("label", "i").agg(F.avg("v").alias("mean_v"))
    return dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mean_v"))), lambda s: s.mean_v
        ).alias("cv")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: assign each query to its `nprobe` nearest coarse
    cells (per-label centroids), then exact-rerank only within those
    cells. At scale the cell id is the shuffle key — candidate
    generation is O(n·nprobe/cells) per query instead of O(n) — and
    the centroid table stays broadcast. nprobe is the recall/cost dial:
    nprobe == #cells degrades gracefully to exact brute force (tested).
    Deterministic: ties broken on (rounded cosine, label/id), so the
    result is oracle-checkable.
    """
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    aw = Window.partitionBy("q_id").orderBy(
        F.desc("cent_sim"), F.asc("label")
    )
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rn", F.row_number().over(aw))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "qv", F.col("label").alias("cell"))
    )
    c = _with_norm(corpus, vec_col, "_cn").select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("cv2"),
        F.col(label_col).alias("c_label"),
        F.col("_cn").alias("c_nrm"),
    )
    scored = (
        _with_norm(assigned, "qv", "q_nrm")
        .join(c, (F.col("cell") == F.col("c_label")) & (F.col("q_id") != F.col("c_id")))
        .select(
            "q_id",
            "cell",
            "c_id",
            F.round(
                cosine_scored(F.col("qv"), F.col("cv2"), "q_nrm", "c_nrm"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-duplicate pairs: (a, b) with a < b and
    cosine(a, b) >= threshold.

    This is the exact baseline — an all-pairs join. It stays JVM-side
    (zip_with/aggregate) and Spark executes it as a broadcast
    nested-loop over the smaller side; at 100 TB you run the LSH
    bucket prefilter (ann_lsh_topk's hyperplane_buckets) to generate
    candidates and this exact check only within buckets.
    """
    base = _with_norm(df, vec_col, "_nrm")
    a = base.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"), F.col("_nrm").alias("a_nrm")
    )
    b = base.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"), F.col("_nrm").alias("b_nrm")
    )
    return (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                cosine_scored(F.col("a_vec"), F.col("b_vec"), "a_nrm", "b_nrm"), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def cosine_near_dup_pairs_blas(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs via Arrow-batched BLAS.

    Same result set as cosine_near_dup_pairs, different physical plan:
    each partition of the left side computes a block matmul
    (A_norm @ B_norm.T) against the broadcast normalized corpus matrix
    in numpy — ~100× the throughput of interpreted per-pair folds, and
    the per-executor memory is one (n × dim) float64 matrix.

    Scale ceiling is the broadcast corpus (n×dim×8 bytes: 1 M vectors
    × 768 dims ≈ 6 GB — executor-RAM bound). Beyond that, LSH-bucket
    first (hyperplane_buckets) and run this inside buckets.

    Rounding: half-up at 6 digits (floor(x·1e6 + 0.5)/1e6), matching
    Spark's HALF_UP and DuckDB's round-half-away for the positive
    cosines a near-dup threshold selects.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # corpus → driver once (Arrow path), then one broadcast to every
    # executor — the same data movement a broadcast-hash-join side pays
    corpus_pdf = df.select(id_col, vec_col).toPandas()
    ids = corpus_pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.array(list(corpus_pdf[vec_col]), dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)

    out_schema = "a_id long, b_id long, cos_sim double"

    def score(batches):
        all_ids = b_ids.value
        corpus = b_mat.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.array(list(pdf[vec_col]), dtype=np.float64)
            an = np.sqrt((a * a).sum(axis=1))
            an[an == 0] = 1.0
            sims = (a / an[:, None]) @ corpus.T
            sims = np.floor(sims * 1e6 + 0.5) / 1e6  # half-up, 6 digits
            ai, bi = np.nonzero((sims >= threshold) & (a_ids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {"a_id": a_ids[ai], "b_id": all_ids[bi], "cos_sim": sims[ai, bi]}
            )

    return df.select(id_col, vec_col).mapInPandas(score, schema=out_schema)


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


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|, code =
    round(x * 127 / scale). 4× storage/shuffle reduction for embedding
    columns — at 100 TB the codes (array<tinyint-sized ints> + one
    double) are what you persist and shuffle; dequantize lazily at use.

    Pure Column expressions (transform/array_max — codegen, no UDF);
    deterministic, so an oracle can replay the arithmetic exactly.
    Zero vectors are guarded with a tiny epsilon scale.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(v, F.abs)), F.lit(1e-12)
    )
    df = df.withColumn(f"{prefix}_scale", scale)
    codes = F.transform(
        v, lambda x: F.round(x * 127.0 / F.col(f"{prefix}_scale")).cast("int")
    )
    return df.withColumn(f"{prefix}_codes", codes)


def dequantize_error(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Mean absolute reconstruction error of the int8 codes vs the
    original vector — the quality metric that decides whether the
    quantized index is usable for retrieval."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    recon = F.transform(
        F.col(f"{prefix}_codes"),
        lambda c: c * F.col(f"{prefix}_scale") / 127.0,
    )
    abs_err = F.zip_with(v, recon, lambda a, b: F.abs(a - b))
    mean_err = F.aggregate(
        abs_err, F.lit(0.0), lambda acc, x: acc + x
    ) / F.size(F.col(vec_col))
    return df.withColumn(f"{prefix}_abs_err", mean_err)
