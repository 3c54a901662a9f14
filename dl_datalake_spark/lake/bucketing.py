"""Bucketed table layout for co-located (shuffle-free) joins.

The reference never joins, so it never pays a shuffle; our engine adds
the full join surface, and at 100 TB the dominant cost of a
fact-to-fact join (lineitem ⋈ orders) is shuffling both sides on the
key. Hive-style bucketing pre-shuffles at WRITE time: both tables are
hash-partitioned into the same number of buckets on the join key, so
Catalyst plans a SortMergeJoin with NO Exchange on either side — the
shuffle is paid once at ingest, amortized over every subsequent join.

This is the write-side twin of the broadcast hints used for dim joins:
broadcast what's small, bucket what's joined repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.

    Bucketed output requires the table catalog (saveAsTable) — plain
    .parquet(path) loses bucket metadata. Sorting within buckets lets
    the sort-merge join skip its sort too.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with matching
    bucket specs Catalyst elides both Exchanges."""
    return spark.table(left).join(spark.table(right), on)
