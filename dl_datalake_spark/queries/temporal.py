"""Temporal joins over `events`: backward as-of join (click → latest
prior purchase) and a banded range join (errors within 60 s after each
click). The reference associates feature rows to raw rows by (symbol,
ts) convention without ever joining (SURVEY §2.3, J3 —
features/manager.py:72-81); these queries make that association a real
operator.

Oracle notes: DuckDB reads the events parquet's TIMESTAMP_NS as µs
TIMESTAMP, Spark reads it as int64 ns (nanosAsLong) — both sides
therefore work in the µs domain (`ts DIV 1000` ↔ `epoch_us(ts)`), and
all range arithmetic is integer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.operators.joins import asof_join, range_count_join
from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.tables import load_table, with_tsu

US_PER_HOUR = 3_600_000_000

US_MINUTE = 60_000_000


def _events_us(spark: SparkSession, sf_dir: str):
    return with_tsu(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# as-of join: each click picks up the latest prior purchase per user
# ---------------------------------------------------------------------------
@register(
    "events_asof_join",
    sql="""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS tsu, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
c AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.tsu AS click_tsu,
       p.tsu AS purchase_tsu,
       ROUND(p.purchase_value, 6) AS purchase_value
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.tsu >= p.tsu
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str):
    ev = _events_us(spark, sf_dir)
    # pre-aggregate purchases per (user, tsu): as-of tie-breaks among
    # equal timestamps are engine-defined, so make the key unique first
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "tsu")
        .agg(F.max("value").alias("purchase_value"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "tsu", "event_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="tsu",
        by=["user_id"],
        value_cols=["purchase_value"],
        right_on_alias="purchase_tsu",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("tsu").alias("click_tsu"),
        "purchase_tsu",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# nearest as-of join with tolerance: each click pairs with the CLOSEST
# purchase (before or after) within 2 minutes; ties prefer backward —
# pandas.merge_asof(direction="nearest", tolerance=...) semantics.
# ---------------------------------------------------------------------------
@register(
    "events_asof_nearest",
    sql=f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS tsu, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
c AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.tsu AS click_tsu,
       n.tsu AS purchase_tsu,
       ROUND(n.purchase_value, 6) AS purchase_value
FROM c LEFT JOIN LATERAL (
  SELECT p.tsu, p.purchase_value
  FROM p
  WHERE p.user_id = c.user_id AND abs(p.tsu - c.tsu) <= {2 * US_MINUTE}
  ORDER BY abs(p.tsu - c.tsu), (CASE WHEN p.tsu <= c.tsu THEN 0 ELSE 1 END)
  LIMIT 1
) n ON TRUE
""",
)
def events_asof_nearest(spark: SparkSession, sf_dir: str):
    ev = _events_us(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "tsu")
        .agg(F.max("value").alias("purchase_value"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "tsu", "event_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="tsu",
        by=["user_id"],
        value_cols=["purchase_value"],
        right_on_alias="purchase_tsu",
        direction="nearest",
        tolerance=2 * US_MINUTE,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("tsu").alias("click_tsu"),
        "purchase_tsu",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# banded range join: errors within [click, click+60s) per user
# ---------------------------------------------------------------------------
@register(
    "events_range_join",
    sql=f"""
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu
  FROM events WHERE event_type = 'click'
),
e AS (
  SELECT user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'error'
)
SELECT c.event_id, c.user_id, c.tsu AS click_tsu,
       COUNT(e.tsu) AS error_cnt
FROM c LEFT JOIN e
  ON c.user_id = e.user_id
 AND e.tsu >= c.tsu AND e.tsu < c.tsu + {US_MINUTE}
GROUP BY 1, 2, 3
""",
)
def events_range_join(spark: SparkSession, sf_dir: str):
    ev = _events_us(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "tsu"
    )
    errors = ev.where(F.col("event_type") == "error").select("user_id", "tsu")
    counted = range_count_join(
        clicks,
        errors,
        on="tsu",
        by=["user_id"],
        lower=0,
        upper=US_MINUTE,
        count_alias="error_cnt",
    )
    return counted.select(
        "event_id", "user_id", F.col("tsu").alias("click_tsu"), "error_cnt"
    )


# ---------------------------------------------------------------------------
# last-touch attribution: purchases credited to the preceding channel event
# ---------------------------------------------------------------------------
@register(
    "events_last_touch_attribution",
    sql=f"""
WITH p AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events
      WHERE event_type <> 'purchase'),
m AS (
  SELECT p.user_id, p.tsu, p.value,
         (SELECT c.event_type FROM c
          WHERE c.user_id = p.user_id AND c.tsu <= p.tsu
            AND c.tsu >= p.tsu - {US_PER_HOUR}
          ORDER BY c.tsu DESC LIMIT 1) AS channel
  FROM p
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(value), 4) AS sum_value
FROM m GROUP BY 1
""",
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str):
    """Last-touch attribution: each purchase credits the most recent
    non-purchase event by the same user within the preceding hour;
    purchases with no qualifying touch are 'direct'. The oracle says it
    with a correlated LIMIT-1 subquery (fine at oracle scale); the
    Spark side is the distributed as-of join (operators/joins.py:
    union-by-tag + per-user prefix window — one shuffle, no range
    explosion), with the hour bound as the as-of tolerance.
    """
    ev = with_tsu(load_table(spark, sf_dir, "events"))
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "tsu", "value")
    c = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "tsu", F.col("event_type").alias("channel")
    )
    m = asof_join(
        p, c, on="tsu", by=["user_id"], value_cols=["channel"],
        direction="backward", tolerance=US_PER_HOUR,
    )
    return m.groupBy(
        F.coalesce(F.col("channel"), F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
