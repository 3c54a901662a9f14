"""Round-7 additions: dataset time travel end-to-end.

`events_time_travel` exercises the lake's Delta-style ``VERSION AS OF``
(commit-pinned file lists + MVCC tombstones -> `read_dataset_at`,
lake/reader.py) through a real write/upsert/delete cycle in a throwaway
lake, then verifies EVERY historical snapshot against a pure-SQL
reconstruction:

- version 0: one row per user bucket ('view' cents);
- version 1: 'click' sums upserted into buckets 0-3 (keep-last wins)
  plus two new 'purchase' keys;
- version 2: delete_range removes the first three buckets.

Reading version 0 AFTER versions 1 and 2 have rewritten/deleted its
rows is the whole point: superseded files are tombstoned, not deleted,
so the old snapshot still resolves (reproduce yesterday's training
run; audit what a purge removed).  The reference has catalog-snapshot
time travel only (manifest history, `dl-datalake/src/dl_datalake/
metadata/manifest.py`), no row-level dataset time travel.
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
    "events_time_travel",
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
snap1 AS (  -- keep-last state after the upsert commit
  SELECT CAST({_JAN} + COALESCE(k.b, v.b) * 60000 AS BIGINT) AS ts,
         COALESCE(k.c, v.c) AS c
  FROM v FULL JOIN k ON v.b = k.b
  UNION ALL
  SELECT CAST({_JAN} + (10 + b) * 60000 AS BIGINT), c FROM p)
SELECT CAST(0 AS BIGINT) AS version,
       CAST({_JAN} + b * 60000 AS BIGINT) AS ts, c AS price_cents
FROM v
UNION ALL
SELECT CAST(1 AS BIGINT), ts, c FROM snap1
UNION ALL
SELECT CAST(2 AS BIGINT), ts, c FROM snap1 WHERE ts > {_JAN + 2 * 60000}
""",
)
def events_time_travel(spark: SparkSession, sf_dir: str):
    import shutil
    import tempfile

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
    tmp = tempfile.mkdtemp(prefix="dl_tt_lake_")
    try:
        w = LakeWriter(spark, tmp)
        key = DatasetKey("SIM", "SPOT", "TT", "ticks", "1m")
        w.write_ticks(batch0, key)                    # version 0
        w.write_ticks(batch1, key)                    # version 1: upsert
        w.delete_range(key, _JAN, _JAN + 2 * 60000)   # version 2: delete
        r = LakeReader(spark, tmp)
        rows = []
        for version in (0, 1, 2):
            snap = r.read_dataset_at(key, version).select(
                F.lit(version).cast("long").alias("version"),
                F.col("ts").cast("long").alias("ts"),
                F.col("price_cents").cast("long").alias("price_cents"),
            )
            rows.extend(snap.collect())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # the throwaway lake is gone; re-materialize the (bounded: 25-row)
    # result for the caller — same re-wrap shape as events_change_feed
    return spark.createDataFrame(rows, "version long, ts long, price_cents long")
