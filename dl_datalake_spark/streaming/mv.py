"""Incremental materialized-view maintenance over a stream.

The view is stored as PER-BATCH partial aggregate states (mergeable
monoids: count/sum/min/max) in a parquet table partitioned by
`_batch_id`; reading the view merges the partials. Two properties fall
out of that layout, and they are the whole design:

- **Exactly-once without transactions**: foreachBatch may re-deliver a
  batch after a crash, but each batch writes ONLY its own
  `_batch_id=N` partition with dynamic partition overwrite — a replay
  overwrites the identical partition instead of double-counting. The
  checkpoint's batch numbering is the idempotency key.
- **Refresh cost ∝ batch, not history**: a new micro-batch appends one
  partial partition; nothing rescans or rewrites the view's past. The
  read-time merge is O(groups × retained batches) — `compact_mv`
  folds old partitions into a single baseline when that factor grows.

This is the streaming twin of the batch `agg_partial_merge` query
(same monoid-merge proof, oracle-checked there). The reference's
analogue is its imperative 5,000-row flush loop (SURVEY §2.9 T2);
here the state lives in the lake layout, not in process memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

MV_AGG_COLS = ("_n", "_sum", "_min", "_max")


def _partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    distinct_col: str | None = None,
) -> DataFrame:
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(value_col).alias("_sum"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    ]
    if distinct_col is not None:
        # Datasketches HLL: a MERGEABLE distinct-count state — the one
        # aggregate family exact partials can't give you incrementally
        # (exact distinct needs the full key set, not per-batch counts)
        aggs.append(F.hll_sketch_agg(distinct_col).alias("_hll"))
    return df.groupBy(*group_cols).agg(*aggs)


def write_mv_batch(
    batch_df: DataFrame,
    batch_id: int,
    group_cols: list[str],
    value_col: str,
    mv_path: str,
    distinct_col: str | None = None,
) -> None:
    """One micro-batch → one partial-state partition. Safe to replay:
    same batch_id always lands in (and fully replaces) one partition."""
    spark = batch_df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            _partials(batch_df, group_cols, value_col, distinct_col)
            .withColumn("_batch_id", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .parquet(mv_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def incremental_mv(
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    mv_path: str,
    checkpoint_dir: str,
    distinct_col: str | None = None,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Maintain the view from a streaming DataFrame. Default trigger is
    availableNow (catch-up refresh that terminates); pass
    processing_time (e.g. "30 seconds") for continuous live
    maintenance — the same upsert code path either way."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        write_mv_batch(batch_df, batch_id, group_cols, value_col, mv_path, distinct_col)

    writer = stream_df.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_mv(spark: SparkSession, mv_path: str, group_cols: list[str]) -> DataFrame:
    """The view: merge partial states across batch partitions. avg is
    derived from merged sum/count — never averaged across batches."""
    partials = spark.read.parquet(mv_path)
    aggs = [
        F.sum("_n").alias("n"),
        F.sum("_sum").alias("sum_value"),
        (F.sum("_sum") / F.sum("_n")).alias("avg_value"),
        F.min("_min").alias("min_value"),
        F.max("_max").alias("max_value"),
    ]
    if "_hll" in partials.columns:
        aggs.append(
            F.hll_sketch_estimate(F.hll_union_agg("_hll")).alias("approx_distinct")
        )
    return partials.groupBy(*group_cols).agg(*aggs)


def compact_mv(spark: SparkSession, mv_path: str, group_cols: list[str]) -> None:
    """Fold every batch partition into a single `_batch_id=-1` baseline
    (atomic tmp-dir swap, same protocol as the manifest store). Run when
    retained-batch count makes the read-time merge noticeable."""
    import os
    import shutil
    import tempfile
    import uuid

    partials = spark.read.parquet(mv_path)
    aggs = [
        F.sum("_n").alias("_n"),
        F.sum("_sum").alias("_sum"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    ]
    if "_hll" in partials.columns:
        aggs.append(F.hll_union_agg("_hll").alias("_hll"))  # sketches merge losslessly
    merged = (
        partials.groupBy(*group_cols)
        .agg(*aggs)
        .withColumn("_batch_id", F.lit(-1))
    )
    tmp = os.path.join(tempfile.gettempdir(), f"_mv_compact_{uuid.uuid4().hex}")
    merged.coalesce(1).write.mode("overwrite").partitionBy("_batch_id").parquet(tmp)
    old = mv_path.rstrip("/") + f".old.{uuid.uuid4().hex}"
    os.rename(mv_path, old)
    shutil.move(tmp, mv_path)
    shutil.rmtree(old, ignore_errors=True)
