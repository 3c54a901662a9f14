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


def deterministic_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Pseudo-random hyperplanes from a fixed LCG — no RNG state, fully
    reproducible across engines/runs."""
    planes = []
    state = 42
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 20) % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def pairwise_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 1_000_000,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """k-NN join: for every query vector, top-k corpus neighbors.

    Small corpora (≤ max_broadcast_rows): broadcast the corpus and rank
    per query with a window — exact, the oracle-checkable baseline.

    Bigger corpora: the broadcast theta-join is an O(n·q) scale-killer
    (it ships the WHOLE corpus to every task), so the join routes
    through ann_lsh_topk — hyperplane-bucketed candidate generation +
    exact rerank within buckets, same output schema, approximate recall
    (recall floor pytest'd). One count() picks the path — deliberately
    NOT limit(threshold+1).count(): a GlobalLimit is a single-partition
    shuffle of up to threshold+1 rows, while count() over a scan reads
    an EMPTY column set (row-group metadata) and ships one long per
    task, so the plain count is the cheaper probe at every scale.
    """
    if corpus.count() > max_broadcast_rows:
        if planes is None:
            dim = len(corpus.select(vec_col).head()[0])
            planes = deterministic_planes(8, dim)
        return ann_lsh_topk(queries, corpus, planes, k, id_col, vec_col)
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

    NOTE (r12, negative result): the explode-free alternative — ONE
    HashAggregate of 64 column-wise avg(vec[i]) buffers per label —
    measured consistently SLOWER in a 6-rep interleaved A/B through the
    emb_ivf_topk shape at sf0.1 (min 1.02 -> 1.23 s, med 1.17 -> 1.31,
    identical results), even with the dim probe hoisted out: 128
    aggregate sub-expressions (sum+count per avg) blow past the codegen
    aggregate fallback thresholds while the explode shape runs small
    codegen'd aggs. Not a scale hazard either way — partial aggregation
    collapses the exploded rows to labels x dim per map task before the
    one narrow exchange, so per-task CPU (which the A/B measures) is
    the only difference. Kept the explode.
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
    max_block_rows: int = 50_000,
) -> DataFrame:
    """Exact embedding near-dup pairs via distributed block-pair BLAS.

    Same result set as cosine_near_dup_pairs, different physical plan:
    the corpus is hash-split into B row blocks; every unordered block
    pair (i ≤ j) becomes one applyInPandas group that matmuls
    (block_i_norm @ block_j_norm.T) in numpy — ~100× the throughput of
    interpreted per-pair folds. Every id pair lands in EXACTLY one
    group (blocks are disjoint; the group key is the sorted block
    pair), so the result is exact with no dedup pass.

    Scale shape: no driver materialization and no full-corpus
    broadcast — per-task memory is two blocks (max_block_rows × dim ×
    8 B each; 50 k × 768 ≈ 300 MB) plus one ~80 MB sims chunk (the
    matmul iterates row chunks of ~10^7 elements: the FULL block-pair
    product is |a|×|b| doubles, 14 GB at 42 k×42 k — the transient
    that OOM-killed an unchunked 100× run), and each row is shuffled
    B times (the unavoidable O(n²/block) data movement of exact
    all-pairs).
    B adapts: enough blocks to spread across the cluster, more when n
    outgrows max_block_rows. One count() sizes it.

    Rounding: half-up at 6 digits (floor(x·1e6 + 0.5)/1e6), matching
    Spark's HALF_UP and DuckDB's round-half-away for the positive
    cosines a near-dup threshold selects.
    """
    import math

    slim = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    n = slim.count()
    if n == 0:
        return df.sparkSession.createDataFrame([], "a_id long, b_id long, cos_sim double")
    par = df.sparkSession.sparkContext.defaultParallelism
    # B(B+1)/2 groups ≈ 2·cores for full occupancy; memory-capped blocks.
    # r13: the occupancy term only applies while blocks keep >= ~1k rows —
    # below that the corpus is small enough that B(B+1)/2 applyInPandas
    # groups cost more in per-group Python-call overhead than the matmul
    # itself (measured at sf0.1: 12 blocks/78 groups of 167 rows ->
    # 2 blocks/3 groups, min 1.022 -> 0.862 s, identical pairs). At any
    # n where parallelism matters the formula is unchanged.
    n_blocks = max(
        int(math.ceil(n / max_block_rows)),
        min(int(math.ceil(math.sqrt(4.0 * par))), max(1, int(math.ceil(n / 1024)))),
    )

    blk = F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks)).cast("int")
    tagged = slim.withColumn("_blk", blk)
    # row of block b participates in groups (i=b, j≥b) as the LEFT side
    # and (i<b, j=b) as the RIGHT side; the diagonal group gets each row
    # once (left only) and scores within-block pairs a<b itself.
    left = tagged.select(
        "_id", "_vec",
        F.col("_blk").alias("gi"),
        F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1))).alias("gj"),
        F.lit(0).alias("_side"),
    ).select("_id", "_vec", "gi", "gj", "_side")
    right = tagged.where(F.col("_blk") > 0).select(
        "_id", "_vec",
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("gi"),
        F.col("_blk").alias("gj"),
        F.lit(1).alias("_side"),
    ).select("_id", "_vec", "gi", "gj", "_side")
    thr = float(threshold)

    def score_group(pdf):
        # self-contained: runs on workers that may not import this package
        import numpy as np
        import pandas as pd

        def matn(frame):
            ids = frame["_id"].to_numpy(dtype=np.int64)
            m = np.array(list(frame["_vec"]), dtype=np.float64)
            nrm = np.sqrt((m * m).sum(axis=1))
            nrm[nrm == 0] = 1.0
            return ids, m / nrm[:, None]

        diagonal = bool((pdf["gi"] == pdf["gj"]).iloc[0]) if len(pdf) else True
        if diagonal:
            a_ids, a = matn(pdf)
            b_ids, b = a_ids, a
        else:
            a_ids, a = matn(pdf[pdf["_side"] == 0])
            b_ids, b = matn(pdf[pdf["_side"] == 1])
        if len(a_ids) == 0 or len(b_ids) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cos_sim": "float64"}
            )
        # Chunk the matmul: a full block-pair product is
        # len(a) × len(b) doubles — 42k×42k would be a 14 GB transient
        # PER WORKER (observed OOM-killing a 100× run). Cap the sims
        # chunk at ~10^7 elements (~80 MB); hits are sparse, so only
        # the selected pairs survive each chunk.
        chunk = max(1, 10_000_000 // max(1, len(b_ids)))
        outs = []
        for s in range(0, len(a_ids), chunk):
            sims = a[s : s + chunk] @ b.T
            sims = np.floor(sims * 1e6 + 0.5) / 1e6  # half-up, 6 digits
            ca_ids = a_ids[s : s + chunk]
            if diagonal:
                ai, bi = np.nonzero(
                    (sims >= thr) & (ca_ids[:, None] < b_ids[None, :])
                )
            else:
                # cross-block ids are unordered — emit every hit
                ai, bi = np.nonzero(sims >= thr)
            x, y = ca_ids[ai], b_ids[bi]
            outs.append(
                pd.DataFrame(
                    {
                        "a_id": np.minimum(x, y),
                        "b_id": np.maximum(x, y),
                        "cos_sim": sims[ai, bi],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            {"a_id": [], "b_id": [], "cos_sim": []}
        ).astype({"a_id": "int64", "b_id": "int64", "cos_sim": "float64"})

    return (
        left.unionByName(right)
        .groupBy("gi", "gj")
        .applyInPandas(score_group, schema="a_id long, b_id long, cos_sim double")
    )


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
