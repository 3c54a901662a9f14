"""Multimodal-pipeline query: binary payload → Arrow-batched feature
extraction → per-language accounting.

This runs the real `mapInPandas` decode plumbing (the codec itself is
the deterministic sha256-fake — media libs are out of scope), and the
oracle reproduces the digest/byte accounting exactly: DuckDB's
`sha256()` and hashlib agree on lowercase hex over the same UTF-8
payload bytes, so the value hash verifies that the binary column,
batch shape, and UDF signature are wired correctly end-to-end.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.operators.multimodal import attach_binary_column, extract_features
from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table


@register(
    "media_feature_digest",
    sql="""
SELECT lang,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_payloads
FROM documents
GROUP BY lang ORDER BY lang
""",
)
def media_feature_digest(spark: SparkSession, sf_dir: str):
    # spread="bytes" (r13, guide §2/§4): the Arrow mapInPandas pass is
    # byte-light per row (sha256 stub), so fanning a sub-MB table to 32
    # partitions paid ~0.3 s of pure Python-task round-trips — sizing
    # the fan-out from input bytes (1 partition at sf0.1) measured
    # 0.867 -> 0.520 s min interleaved with identical results; at real
    # media scale the scan arrives with many splits and this is a no-op.
    docs = load_table(spark, sf_dir, "documents", spread="bytes")
    # lang rides THROUGH the Arrow boundary (r12, guide §8): the old
    # shape scanned documents a second time and broadcast-joined it
    # back onto the features just to re-attach lang; carrying the
    # 2-byte tag with the payload pass costs nothing and drops the
    # plan to one scan, zero joins.
    media = attach_binary_column(docs, carry_cols=["lang"])
    feats = extract_features(media, carry_cols=["lang"])
    return (
        feats
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("byte_len").alias("total_bytes"),
            F.countDistinct("digest").alias("n_distinct_payloads"),
        )
        .orderBy("lang")
    )


@register(
    "media_frame_sample",
    sql="""
WITH m AS (
  SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
  FROM documents WHERE doc_id < 100
),
f AS (
  SELECT media_id, unnest(generate_series(0, duration_ms, 5000)) AS frame_ts
  FROM m
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       MAX(frame_ts) AS last_frame_ts
FROM f GROUP BY media_id
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str):
    """Video frame-sampling plumbing: duration metadata → (media_id,
    frame_ts) rows every 5 s, then per-media frame accounting. The
    sequence+explode never touches the payload, so the frame plan is a
    narrow map — no shuffle until the final accounting agg."""
    from dl_datalake_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    # n_chars rides through attach_binary_column (r12) instead of a
    # second docs scan + join-back — same carry pattern as
    # media_feature_digest.
    media = attach_binary_column(docs, carry_cols=["n_chars"])
    with_duration = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ),
    )
    frames = frame_sample(with_duration, every_ms=5000)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ts").alias("last_frame_ts"),
    )


@register(
    "media_binary_dedup",
    sql="""
WITH h AS (
  SELECT sha256(text) AS digest, octet_length(encode(text)) AS nb
  FROM documents
),
g AS (SELECT digest, CAST(COUNT(*) AS BIGINT) AS n, MAX(nb) AS nb FROM h GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_unique_payloads,
       CAST(SUM(n) AS BIGINT) AS n_payloads,
       CAST(SUM((n - 1) * nb) AS BIGINT) AS reclaimable_bytes
FROM g
""",
)
def media_binary_dedup(spark: SparkSession, sf_dir: str):
    """Content-addressable dedup over the BINARY payload column: digest
    with JVM-side sha2 (no Python touches the bytes), group by digest,
    and report how many payload copies a content-addressed store would
    reclaim. This is the storage-level dedup a media lake runs before
    any decoding — byte-identical images/clips collapse to one object.

    Scale: one hash-agg keyed on a 64-hex digest; payload bytes leave
    the scan stage only as their length. The digest agg shards evenly
    (sha256 keys don't skew), so this survives arbitrary corpus size.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = attach_binary_column(docs)
    g = media.select(
        F.sha2(F.col("payload"), 256).alias("digest"),
        F.length(F.col("payload")).alias("nb"),
    ).groupBy("digest").agg(
        F.count(F.lit(1)).alias("n"), F.max("nb").alias("nb")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_unique_payloads"),
        F.sum("n").alias("n_payloads"),
        F.sum((F.col("n") - 1) * F.col("nb")).alias("reclaimable_bytes"),
    )
