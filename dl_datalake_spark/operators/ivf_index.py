"""Persistent IVF (inverted-file) ANN index: train → write → serve.

The in-query `ivf_topk` rebuilds its coarse quantizer per call; a 100 TB
corpus trains ONCE and serves many queries, so the index here is a
durable artifact with the layout doing the heavy lifting:

- `train_ivf`: Lloyd iterations expressed relationally (assign = argmax
  cosine vs broadcast centroids; update = posexplode + per-dim avg) —
  no UDF, no driver collect, deterministic init (xxhash64-ranked seed
  vectors) so retraining reproduces the same index bit-for-bit.
- `write_ivf_index`: vectors land in parquet PARTITIONED BY CELL.
  That single decision is the query-time win: probing `nprobe` of
  `num_cells` cells scans only those partition directories — Spark's
  partition pruning turns ANN's "touch 1/64th of the data" promise
  into actual file-level I/O skipping, verified by inputFiles() in the
  tests.
- `search_ivf_index`: queries pick cells against the broadcast
  centroid table; the candidate cell set (≤ num_cells values) becomes
  an IN-list partition filter; exact cosine rerank within the pruned
  scan.

(The reference has no vector surface at all; this is LLM-extension
territory on the same lake layout discipline as lake/writer.py's
Hive partitioning.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.operators.similarity import _with_norm, cosine, cosine_scored

CENTROIDS_DIR = "centroids"
VECTORS_DIR = "vectors"


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid cell per vector (ties → smallest cell id).

    argmax as min(struct(-sim, cell)) — a hash agg with map-side
    partial merge, so the num_cells× exploded scoring rows collapse
    BEFORE the shuffle. A row_number window here would sort-shuffle
    the full exploded set; the agg form shuffles one row per vector.
    first(embedding) is safe: every scored row of a vec_id carries the
    identical vector.
    """
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cell",
        F.round(cosine(F.col("embedding"), F.col("cv")), 6).alias("sim"),
    )
    return scored.groupBy("vec_id").agg(
        F.first("embedding").alias("embedding"),
        F.min(F.struct((-F.col("sim")).alias("neg"), F.col("cell").alias("cell")))[
            "cell"
        ].alias("cell"),
    )


def _means(assigned: DataFrame) -> DataFrame:
    """Per-cell centroid: posexplode + per-dim avg (order-independent
    enough for convergence; determinism of the FINAL index comes from
    the rounded assignment step, not the raw means)."""
    exploded = assigned.select(
        "cell", F.posexplode("embedding").alias("i", "v_raw")
    ).select("cell", "i", F.col("v_raw").cast("double").alias("v"))
    dims = exploded.groupBy("cell", "i").agg(F.avg("v").alias("mean_v"))
    return dims.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mean_v"))), lambda s: s.mean_v
        ).alias("cv")
    )


def _seed_centroids(vecs: DataFrame, num_cells: int) -> DataFrame:
    """Deterministic seeds: top-k by hash via orderBy().limit(), which
    compiles to TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows) — NOT a global row_number window, which would
    sort the whole corpus on one partition (plan-pinned in tests).
    The k survivors then rank locally."""
    seeds = (
        vecs.select("vec_id", "embedding", F.xxhash64("vec_id").alias("_h"))
        .orderBy("_h", "vec_id")
        .limit(num_cells)
    )
    seed_w = Window.orderBy("_h", "vec_id")  # num_cells rows — trivial
    return seeds.withColumn("rn", F.row_number().over(seed_w)).select(
        (F.col("rn") - 1).cast("int").alias("cell"), F.col("embedding").alias("cv")
    )


def train_ivf(
    df: DataFrame,
    num_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """K-means coarse quantizer, returns (cell int, cv array<double>).

    Seeds are the `num_cells` vectors ranking first by xxhash64(id) —
    a deterministic pseudo-random spread with no driver round-trip.
    Empty cells keep their previous centroid (left-join coalesce), so
    the cell count never silently shrinks.
    """
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("embedding"),
    )
    # localCheckpoint pins the seed ranking so iterations don't replay it
    cents = _seed_centroids(vecs, num_cells).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = _assign(vecs, cents)
        new = _means(assigned)
        cents = (
            cents.select("cell", F.col("cv").alias("old_cv"))
            .join(new, "cell", "left")
            .select("cell", F.coalesce(F.col("cv"), F.col("old_cv")).alias("cv"))
            .localCheckpoint(eager=True)
        )
    return cents


def write_ivf_index(
    df: DataFrame,
    cents: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the index: centroids (tiny) + vectors partitioned by
    cell — the partition layout IS the inverted file."""
    import shutil
    import uuid

    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("embedding"),
    )
    assigned = _assign(vecs, cents)
    # build the whole index in a staging dir NEXT TO the destination
    # (same parent => same filesystem), then swap with os.rename —
    # a rebuild never leaves a reader facing half-written cells.
    # Staging in /tmp would make the final move a recursive copy when
    # the index lives on a different mount, voiding the atomicity.
    tmp = path.rstrip("/") + f".staging.{uuid.uuid4().hex}"
    cents.write.mode("overwrite").parquet(os.path.join(tmp, CENTROIDS_DIR))
    (
        assigned.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(tmp, VECTORS_DIR))
    )
    old_dir = path.rstrip("/") + f".old.{uuid.uuid4().hex}"
    if os.path.exists(path):
        os.rename(path, old_dir)
    os.rename(tmp, path)
    shutil.rmtree(old_dir, ignore_errors=True)


def read_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    cents = spark.read.parquet(os.path.join(path, CENTROIDS_DIR))
    vectors = spark.read.parquet(os.path.join(path, VECTORS_DIR))
    return cents, vectors


def search_ivf_index(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors from the persisted index, touching only
    the probed cells' files. Returns (q_id, c_id, cos_sim, rank)."""
    cents, vectors = read_ivf_index(spark, path)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    aw = Window.partitionBy("q_id").orderBy(F.desc("cent_sim"), F.asc("cell"))
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rn", F.row_number().over(aw))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "qv", "cell")
    )
    # the probed-cell set is ≤ num_cells scalars — an IN-list literal
    # is what lets the file source prune partition directories
    cells = [r["cell"] for r in probed.select("cell").distinct().collect()]
    cand = vectors.where(F.col("cell").isin(cells)).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv2"), "cell"
    )
    scored = (
        _with_norm(probed, "qv", "q_nrm")
        .join(
            _with_norm(cand, "cv2", "c_nrm"),
            "cell",
        )
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                cosine_scored(F.col("qv"), F.col("cv2"), "q_nrm", "c_nrm"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def upsert_ivf_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally absorb a batch of vectors into a persisted index —
    the 100 TB maintenance path: a daily embedding batch must NOT cost
    a full retrain + rewrite.

    Mechanics mirror the lake writer's upsert: new vectors are assigned
    to cells against the EXISTING (frozen) centroids, only the touched
    cell partitions are read back, keep-last per vec_id resolves
    re-inserts, and dynamic partition overwrite rewrites just those
    cells. Cost is O(batch + touched cells), never O(index).

    Contract: embeddings are immutable per vec_id. A re-insert of an
    existing id with the SAME vector replaces it in place (dedup). A
    CHANGED vector would re-assign to a different cell while the stale
    copy sits in an untouched partition — that is a retrain/rebuild
    (`train_ivf` + `write_ivf_index`), not an upsert; centroid drift
    from accumulated inserts is likewise the scheduled-retrain signal.

    Returns the number of rows now present in the touched cells.
    """
    cents = spark.read.parquet(os.path.join(path, CENTROIDS_DIR))
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("embedding"),
    )
    assigned = _assign(vecs, cents)
    cells = [r["cell"] for r in assigned.select("cell").distinct().collect()]
    if not cells:
        return 0
    vdir = os.path.join(path, VECTORS_DIR)
    existing = spark.read.parquet(vdir).where(F.col("cell").isin(cells))
    old = existing.withColumn("_src", F.lit(0))
    new = assigned.withColumn("_src", F.lit(1))
    w = Window.partitionBy("vec_id").orderBy(F.desc("_src"))
    merged = (
        old.unionByName(new)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
        .persist()
    )
    try:
        n = merged.count()  # pin rows before the overwrite drops inputs
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.repartition("cell")
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(vdir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    finally:
        merged.unpersist()
    return n
