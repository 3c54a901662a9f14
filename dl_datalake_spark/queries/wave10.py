"""Round-6 wave 4: abuse detection, capacity, engagement, dup hygiene.

- bot-rate detection: per-user peak events-per-minute (a pure integer
  per-user window) with the flag threshold applied cross-engine;
- peak concurrent sessions (classic sweep line: +1/−1 boundary events,
  running sum, max — the capacity number a serving platform sizes to);
- DAU/WAU stickiness per week (distinct-user counts + exact ratio);
- per-source exact-duplicate rate (md5 groups — the dup hygiene number
  tracked per ingestion source before any near-dup pass).

Scale notes: the sweep line's running sum is a single global ordering
over SESSION BOUNDARIES (2 rows per session, not per event) — at 100 TB
you'd segment by day and prefix-sum the per-segment offsets; the
per-event work stays partitioned by user.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu as _with_tsu

US_PER_MIN = 60_000_000
US_PER_DAY = 86_400_000_000
US_PER_WEEK = 604_800_000_000
US_30MIN = 1_800_000_000


# ---------------------------------------------------------------------------
# bot-rate detection: peak events-per-minute per user
# ---------------------------------------------------------------------------
@register(
    "events_bot_rate_flags",
    sql=f"""
WITH m AS (
  SELECT user_id, epoch_us(ts) // {US_PER_MIN} AS minute,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
p AS (
  SELECT user_id, CAST(MAX(n) AS BIGINT) AS peak_per_min,
         CAST(COUNT(*) AS BIGINT) AS active_minutes,
         CAST(SUM(n) AS BIGINT) AS total_events
  FROM m GROUP BY user_id)
SELECT user_id, peak_per_min, active_minutes, total_events,
       peak_per_min >= 3 AS flagged
FROM p
""",
)
def events_bot_rate_flags(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    m = (
        ev.withColumn("minute", F.expr(f"tsu DIV {US_PER_MIN}"))
        .groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return m.groupBy("user_id").agg(
        F.max("n").alias("peak_per_min"),
        F.count(F.lit(1)).alias("active_minutes"),
        F.sum("n").alias("total_events"),
        (F.max("n") >= 3).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# peak concurrent sessions: sweep line over session boundaries
# ---------------------------------------------------------------------------
@register(
    "events_concurrent_sessions_peak",
    sql=f"""
WITH t AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
d AS (
  SELECT user_id, tsu,
         CASE WHEN LAG(tsu) OVER w IS NULL
                OR tsu - LAG(tsu) OVER w > {US_30MIN} THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
s AS (
  SELECT user_id,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq,
         tsu
  FROM d),
iv AS (SELECT user_id, seq, MIN(tsu) AS t0, MAX(tsu) AS t1
       FROM s GROUP BY user_id, seq),
-- boundary events: +1 at start, -1 just after end; ties (same µs)
-- process starts BEFORE ends so instantaneous overlap counts, with a
-- deterministic total order on (tsu, delta DESC, user, seq)
b AS (
  SELECT t0 AS tsu, 1 AS delta, user_id, seq FROM iv
  UNION ALL
  SELECT t1 + 1, -1, user_id, seq FROM iv),
r AS (
  SELECT CAST(SUM(delta) OVER (ORDER BY tsu, delta DESC, user_id, seq
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS live
  FROM b)
SELECT CAST(MAX(live) AS BIGINT) AS peak_concurrent,
       CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_sessions
FROM r
""",
)
def events_concurrent_sessions_peak(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.windows import ordered_running_sum, sessionize

    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    sess = sessionize(ev, user_col="user_id", ts_col="tsu", gap=US_30MIN)
    iv = sess.groupBy("user_id", "session_seq").agg(
        F.min("tsu").alias("t0"), F.max("tsu").alias("t1")
    )
    starts = iv.select(
        F.col("t0").alias("tsu"), F.lit(1).alias("delta"), "user_id", "session_seq"
    )
    ends = iv.select(
        (F.col("t1") + 1).alias("tsu"), F.lit(-1).alias("delta"), "user_id", "session_seq"
    )
    b = starts.unionByName(ends)
    # the global sweep-line running sum is DISTRIBUTED: ts-range buckets
    # + per-bucket prefix sums + a broadcast bucket-offset table — never
    # one task holding every session boundary (2 rows/session at 100 TB)
    live = ordered_running_sum(
        b,
        "tsu",
        [F.desc("delta"), F.asc("user_id"), F.asc("session_seq")],
        "delta",
        num_buckets=64,
        out_col="live",
    )
    n_sessions = iv.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        live.agg(F.max("live").alias("peak_concurrent"))
        .crossJoin(F.broadcast(n_sessions))
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness per week
# ---------------------------------------------------------------------------
@register(
    "events_dau_wau_stickiness",
    sql=f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // {US_PER_DAY} AS day,
         epoch_us(ts) // {US_PER_WEEK} AS wk
  FROM events),
dau AS (SELECT wk, day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY wk, day),
agg AS (
  SELECT wk, CAST(SUM(dau) AS BIGINT) AS dau_days,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dau GROUP BY wk),
wau AS (SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM ud GROUP BY wk)
SELECT agg.wk AS week, wau.wau, agg.dau_days, agg.n_days,
       {ratio_round_sql("agg.dau_days", "agg.n_days * wau.wau")} AS stickiness
FROM agg JOIN wau ON wau.wk = agg.wk
""",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    ud = ev.select(
        "user_id",
        F.expr(f"tsu DIV {US_PER_DAY}").alias("day"),
        F.expr(f"tsu DIV {US_PER_WEEK}").alias("wk"),
    ).distinct()
    dau = ud.groupBy("wk", "day").agg(F.count(F.lit(1)).alias("dau"))
    agg = dau.groupBy("wk").agg(
        F.sum("dau").alias("dau_days"), F.count(F.lit(1)).alias("n_days")
    )
    wau = ud.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    return agg.join(wau, "wk").select(
        F.col("wk").alias("week"),
        "wau",
        "dau_days",
        "n_days",
        ratio_round(F.col("dau_days"), F.col("n_days") * F.col("wau")).alias(
            "stickiness"
        ),
    )


# ---------------------------------------------------------------------------
# exact-duplicate rate per ingestion source (md5 text groups)
# ---------------------------------------------------------------------------
@register(
    "docs_source_dup_rate",
    sql=f"""
WITH h AS (SELECT source, md5(text) AS hh FROM documents),
g AS (SELECT source, hh, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY source, hh)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_redundant,
       {ratio_round_sql("SUM(n) - COUNT(*)", "SUM(n)")} AS dup_rate
FROM g GROUP BY source
""",
)
def docs_source_dup_rate(spark: SparkSession, sf_dir: str):
    d = load_table(spark, sf_dir, "documents", spread=True)
    g = d.select("source", F.md5("text").alias("hh")).groupBy("source", "hh").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_redundant"),
        ratio_round(F.sum("n") - F.count(F.lit(1)), F.sum("n")).alias("dup_rate"),
    )
