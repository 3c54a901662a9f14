"""Round-6 additions: the row-level change feed (CDF) end-to-end.

`events_change_feed` exercises the lake's Delta-style change-data-feed
(LakeWriter(emit_cdf=True) -> reader.read_change_feed) through a real
write/upsert/delete cycle in a throwaway lake, then verifies the emitted
feed against a pure-SQL reconstruction of the expected deltas:

- commit 0: insert one row per user bucket (sum of 'view' cents);
- commit 1: upsert 'click' sums into buckets 0-3 (update_postimage where
  the bucket existed, insert otherwise) plus two brand-new keys from
  'purchase' sums (always inserts);
- commit 2: delete_range over the first three buckets — the feed must
  carry the PRE-IMAGE rows (the value current at delete time).

Money stays in integer cents (per-row ROUND(value*100) BIGINT, the
pattern every events money query here uses) so the feed rows hash-match
across engines exactly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table

_JAN = 1672574400000  # 2023-01-01T12:00Z (ms)
_CENTS_SQL = "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"


def _bucket_cents(ev, event_type: str, max_bucket: int = 8):
    return (
        ev.where(F.col("event_type") == event_type)
        .where((F.col("user_id") % 8) < max_bucket)
        .groupBy((F.col("user_id") % 8).alias("b"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("price_cents"))
    )


@register(
    "events_change_feed",
    sql=f"""
WITH v AS (
  SELECT user_id % 8 AS b, {_CENTS_SQL} AS c
  FROM events WHERE event_type = 'view' GROUP BY 1),
k AS (
  SELECT user_id % 8 AS b, {_CENTS_SQL} AS c
  FROM events WHERE event_type = 'click' AND user_id % 8 < 4 GROUP BY 1),
p AS (
  SELECT user_id % 8 AS b, {_CENTS_SQL} AS c
  FROM events WHERE event_type = 'purchase' AND user_id % 8 < 2 GROUP BY 1),
state1 AS (  -- merged keep-last state after commit 1, per original bucket
  SELECT COALESCE(k.b, v.b) AS b, COALESCE(k.c, v.c) AS c
  FROM v FULL JOIN k ON v.b = k.b)
SELECT CAST(0 AS BIGINT) AS commit_version, 'insert' AS change_type,
       CAST({_JAN} + b * 60000 AS BIGINT) AS ts, c AS price_cents
FROM v
UNION ALL
SELECT CAST(1 AS BIGINT),
       CASE WHEN v.b IS NOT NULL THEN 'update_postimage' ELSE 'insert' END,
       CAST({_JAN} + k.b * 60000 AS BIGINT), k.c
FROM k LEFT JOIN v ON v.b = k.b
UNION ALL
SELECT CAST(1 AS BIGINT), 'insert',
       CAST({_JAN} + (10 + b) * 60000 AS BIGINT), c
FROM p
UNION ALL
SELECT CAST(2 AS BIGINT), 'delete',
       CAST({_JAN} + b * 60000 AS BIGINT), c
FROM state1 WHERE b <= 2
""",
)
def events_change_feed(spark: SparkSession, sf_dir: str):
    return _change_feed_impl(spark, sf_dir, streaming=False)


@register(
    "events_stream_change_feed",
    sql=f"""
WITH v AS (
  SELECT user_id % 8 AS b, {_CENTS_SQL} AS c
  FROM events WHERE event_type = 'view' GROUP BY 1),
k AS (
  SELECT user_id % 8 AS b, {_CENTS_SQL} AS c
  FROM events WHERE event_type = 'click' AND user_id % 8 < 4 GROUP BY 1),
p AS (
  SELECT user_id % 8 AS b, {_CENTS_SQL} AS c
  FROM events WHERE event_type = 'purchase' AND user_id % 8 < 2 GROUP BY 1),
state1 AS (
  SELECT COALESCE(k.b, v.b) AS b, COALESCE(k.c, v.c) AS c
  FROM v FULL JOIN k ON v.b = k.b)
SELECT CAST(0 AS BIGINT) AS commit_version, 'insert' AS change_type,
       CAST({_JAN} + b * 60000 AS BIGINT) AS ts, c AS price_cents
FROM v
UNION ALL
SELECT CAST(1 AS BIGINT),
       CASE WHEN v.b IS NOT NULL THEN 'update_postimage' ELSE 'insert' END,
       CAST({_JAN} + k.b * 60000 AS BIGINT), k.c
FROM k LEFT JOIN v ON v.b = k.b
UNION ALL
SELECT CAST(1 AS BIGINT), 'insert',
       CAST({_JAN} + (10 + b) * 60000 AS BIGINT), c
FROM p
UNION ALL
SELECT CAST(2 AS BIGINT), 'delete',
       CAST({_JAN} + b * 60000 AS BIGINT), c
FROM state1 WHERE b <= 2
""",
)
def events_stream_change_feed(spark: SparkSession, sf_dir: str):
    """The SAME write/upsert/delete cycle as events_change_feed, but the
    feed arrives through the `lake_cdf` STREAMING source
    (sources/cdf_source.py, offsets = commit versions) drained with
    trigger(availableNow=True) into a memory sink — proving streaming
    replay == the batch feed == the SQL oracle, the Delta-CDF
    subscribe-not-poll contract."""
    return _change_feed_impl(spark, sf_dir, streaming=True)


def _change_feed_impl(spark: SparkSession, sf_dir: str, streaming: bool):
    import shutil
    import tempfile
    import uuid

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    ev = load_table(spark, sf_dir, "events")
    batch0 = _bucket_cents(ev, "view").select(
        (F.lit(_JAN) + F.col("b") * 60000).cast("long").alias("ts"), "price_cents"
    )
    batch1 = (
        _bucket_cents(ev, "click", max_bucket=4)
        .select((F.lit(_JAN) + F.col("b") * 60000).cast("long").alias("ts"), "price_cents")
        .unionByName(
            _bucket_cents(ev, "purchase", max_bucket=2).select(
                (F.lit(_JAN) + (F.col("b") + 10) * 60000).cast("long").alias("ts"),
                "price_cents",
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="dl_cdf_lake_")
    try:
        w = LakeWriter(spark, tmp, emit_cdf=True)
        key = DatasetKey("SIM", "SPOT", "FEED", "ticks", "1m")
        w.write_ticks(batch0, key)  # commit 0: inserts
        w.write_ticks(batch1, key)  # commit 1: updates + inserts
        w.delete_range(key, _JAN, _JAN + 2 * 60000)  # commit 2: pre-images
        if streaming:
            from dl_datalake_spark.sources.cdf_source import stream_change_feed

            name = f"cdf_feed_{uuid.uuid4().hex[:8]}"
            q = (
                stream_change_feed(spark, w.dataset_path(key))
                .writeStream.format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            feed = spark.table(name)
        else:
            feed, _cursor = LakeReader(spark, tmp).read_change_feed(
                key, after_version=-1
            )
        rows = (
            feed.select(
                F.col("commit_version").cast("long").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
                F.col("ts").cast("long").alias("ts"),
                F.col("price_cents").cast("long").alias("price_cents"),
            )
            .orderBy("commit_version", "ts")
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # the throwaway lake is gone; re-materialize the (bounded: <=22-row)
    # feed for the caller — same re-wrap shape as the streaming entries
    return spark.createDataFrame(
        rows, "commit_version long, change_type string, ts long, price_cents long"
    )
