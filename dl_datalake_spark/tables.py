"""Loaders for the driver-provided benchmark/correctness tables.

TPC-H-ish star schema + an `events` stream table + LLM-pipeline tables
(`documents`, `embeddings`), one parquet file per table per scale
factor (see /root/repo/TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dl_datalake_spark.session import ensure_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# `events.ts` arrives as int64 epoch-nanoseconds (see session.RUNTIME_CONFS).
NS_PER_SEC = 1_000_000_000
NS_PER_HOUR = 3_600 * NS_PER_SEC


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one testdata table.

    spread=True repartitions a small scan up to the session's default
    parallelism before CPU-heavy downstream work (shingling, hashing,
    vector math). A single small parquet file arrives as one input
    split, which would otherwise serialize the whole pipeline on one
    core; at real scale the scan has many splits and the repartition is
    a no-op (we never shrink partitioning here).
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}
