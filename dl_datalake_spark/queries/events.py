"""Event-stream queries: tumbling windows, sessionization, gap scan,
keep-last dedup, JSON extraction, min_by/max_by — SURVEY §2.4-§2.5/§2.9
semantics over the `events` table.

Timestamp discipline: events.ts is int64 epoch-NANOSECONDS on the Spark
side (nanosAsLong conf) but DuckDB's parquet reader truncates
TIMESTAMP_NANOS to microsecond TIMESTAMP — so every query here works in
the µs domain (`ts DIV 1000` ↔ `epoch_us(ts)`), where ts values are
globally unique at all scale factors. All bucket/gap arithmetic is
integer (`DIV` / `//`) because epoch-µs ~1.7e15 is near double's 2^53
mantissa limit.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.operators.windows import scd2_intervals, sessionize
from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu as _with_tsu

US_PER_HOUR = 3_600_000_000
US_30MIN = 1_800_000_000


# ---------------------------------------------------------------------------
# tumbling hourly aggregation (T8 / A1 shape)
# ---------------------------------------------------------------------------
@register(
    "events_tumbling_hourly",
    sql=f"""
SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value,
       ((2 * CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) * 1000000 + CAST(100 * COUNT(*) AS BIGINT)) // (2 * CAST(100 * COUNT(*) AS BIGINT))) / 1000000.0 AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    return (
        ev.withColumn("hour_bucket", F.expr(f"tsu DIV {US_PER_HOUR}"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            ratio_round(
                F.sum(F.round(F.col("value") * 100).cast("long")),
                F.count(F.lit(1)) * 100,
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC resample of the value stream (A1: deterministic first/last via
# min_by/max_by keyed on ts — arg_min/arg_max in DuckDB)
# ---------------------------------------------------------------------------
@register(
    "events_ohlc_resample",
    sql=f"""
SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
       event_type,
       arg_min(value, epoch_us(ts)) AS open,
       MAX(value)                   AS high,
       MIN(value)                   AS low,
       arg_max(value, epoch_us(ts)) AS close,
       ROUND(SUM(value), 4)         AS volume
FROM events
GROUP BY 1, 2
""",
)
def events_ohlc_resample(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    return (
        ev.withColumn("hour_bucket", F.expr(f"tsu DIV {US_PER_HOUR}"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.min_by("value", "tsu").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "tsu").alias("close"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# sessionization (gap > 30 min per user)
# ---------------------------------------------------------------------------
@register(
    "events_sessionize",
    sql=f"""
WITH t AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
d AS (
  SELECT user_id, tsu, value,
         CASE WHEN LAG(tsu) OVER w IS NULL
                OR tsu - LAG(tsu) OVER w > {US_30MIN} THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tsu)
),
s AS (
  SELECT user_id, tsu, value,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM d
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MAX(tsu) - MIN(tsu) AS span_us,
       ROUND(SUM(value), 4) AS session_value
FROM s GROUP BY user_id, session_seq
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    sess = sessionize(ev, user_col="user_id", ts_col="tsu", gap=US_30MIN)
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("tsu") - F.min("tsu")).alias("span_us"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# gap scan (W1 generalization: per-user deltas above threshold)
# ---------------------------------------------------------------------------
@register(
    "events_gap_scan",
    sql=f"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS tsu,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS delta
  FROM events
)
SELECT user_id,
       COUNT(*) FILTER (WHERE delta > {US_PER_HOUR}) AS n_gaps,
       MAX(delta) AS max_delta
FROM t GROUP BY user_id
HAVING COUNT(*) FILTER (WHERE delta > {US_PER_HOUR}) > 0
""",
)
def events_gap_scan(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("tsu")
    return (
        ev.withColumn("delta", F.col("tsu") - F.lag("tsu").over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("delta") > US_PER_HOUR, 1)).alias("n_gaps"),
            F.max("delta").alias("max_delta"),
        )
        .where(F.col("n_gaps") > 0)
    )


# ---------------------------------------------------------------------------
# keep-last dedup (W3 / upsert semantics on a keyed stream)
# ---------------------------------------------------------------------------
@register(
    "events_keep_last",
    sql="""
SELECT user_id, event_type, tsu, value FROM (
  SELECT user_id, event_type, epoch_us(ts) AS tsu, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def events_keep_last(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("tsu"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "tsu", "value")
    )


# ---------------------------------------------------------------------------
# JSON extraction from props (F8)
# ---------------------------------------------------------------------------
@register(
    "events_json_extract",
    sql="""
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       ((2 * CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS avg_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        ratio_round(F.sum(k), F.count(F.lit(1))).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# sliding windows (T8): 1h windows every 30min via native F.window(slide)
# — Spark's Expand generates both bucket memberships JVM-side; the oracle
# reproduces the expansion with UNNEST of the two aligned grid starts
# ---------------------------------------------------------------------------
@register(
    "events_sliding_windows",
    sql=f"""
SELECT wid, event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM (SELECT unnest([epoch_us(ts) // {US_30MIN} - 1,
                     epoch_us(ts) // {US_30MIN}]) AS wid,
             event_type, value
      FROM events)
GROUP BY wid, event_type
""",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            F.window(F.timestamp_micros(F.col("tsu")), "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.expr(f"unix_micros(w.start) DIV {US_30MIN}").alias("wid"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# built-in session windows (T8/streaming-compatible): F.session_window
# merges events whose gap is < 30min; a new session starts at gap >= 30min
# (interval end is exclusive), which is exactly the lag-island condition
# in the oracle
# ---------------------------------------------------------------------------
@register(
    "events_session_window_builtin",
    sql=f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS tsu, value,
         CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                   >= {US_30MIN} OR
                   LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events),
sessions AS (
  SELECT user_id, tsu, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY tsu
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT user_id, MIN(tsu) AS session_start_us,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM sessions GROUP BY user_id, sid
""",
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str):
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            F.session_window(F.timestamp_micros(F.col("tsu")), "30 minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming end-to-end, oracle-checked: the events table
# replayed as a file STREAM (readStream → availableNow → memory sink),
# hourly per-type aggregation in complete mode. availableNow processes
# the whole history and terminates, so the streaming result equals the
# batch result bit-for-bit — which is exactly what lets a SQL oracle
# hash-match a streaming pipeline. The same plan incrementalizes: on a
# live source the trigger keeps firing and the sink keeps updating.
# ---------------------------------------------------------------------------
@register(
    "events_stream_tumbling",
    sql=f"""
SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_stream_tumbling(spark: SparkSession, sf_dir: str):
    import tempfile
    import uuid

    from dl_datalake_spark.tables import epoch_us

    static = load_table(spark, sf_dir, "events")
    # the file stream source lists a DIRECTORY; pathGlobFilter narrows
    # the listing to the events table within the sf dir
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    bucketed = stream.withColumn(
        "hour_bucket", (epoch_us(stream) / F.lit(US_PER_HOUR)).cast("long")
    )
    agg = bucketed.groupBy("hour_bucket", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="dl_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the memory-sink table is session-resident; the checkpoint is
    # only needed across restarts of a LIVE stream — reclaim it
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Stream-stream interval join, oracle-checked: clicks and errors read
# as two file streams, watermarked on both sides, errors joined within
# [click, click+6 h) per user (streaming/joins.py). availableNow
# replays the whole history — both sides of every pair land in the
# same micro-batch, the inner join emits each pair exactly once, and
# the appended result hash-matches the batch SQL. On live sources the
# same plan keeps state O(watermark window) per side.
# ---------------------------------------------------------------------------
@register(
    "events_stream_interval_join",
    sql="""
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000 AS tsms
  FROM events WHERE event_type = 'click'
),
e AS (
  SELECT user_id, epoch_us(ts) // 1000 AS tsms FROM events WHERE event_type = 'error'
)
SELECT c.event_id, c.user_id, c.tsms AS click_tsms, e.tsms AS matched_tsms
FROM c JOIN e
  ON c.user_id = e.user_id
 AND e.tsms >= c.tsms AND e.tsms < c.tsms + 21600000
""",
)
def events_stream_interval_join(spark: SparkSession, sf_dir: str):
    import tempfile
    import uuid

    from dl_datalake_spark.streaming.joins import stream_interval_join
    from dl_datalake_spark.tables import epoch_us

    static = load_table(spark, sf_dir, "events")

    def stream():
        return (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir.rstrip("/"))
        )

    s1, s2 = stream(), stream()
    clicks = (
        s1.where(F.col("event_type") == "click")
        .withColumn("ts_ms", (epoch_us(s1) / 1000).cast("long"))
        .select("event_id", "user_id", "ts_ms")
        .withColumnRenamed("ts_ms", "ts")
    )
    errors = (
        s2.where(F.col("event_type") == "error")
        .withColumn("ts_ms", (epoch_us(s2) / 1000).cast("long"))
        .select("user_id", "ts_ms")
        .withColumnRenamed("ts_ms", "ts")
    )
    joined = stream_interval_join(
        clicks, errors, by=["user_id"], band_ms=21_600_000, watermark_delay="30 minutes"
    )
    out = joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_tsms"),
        F.col("matched_ts").alias("matched_tsms"),
    )
    name = f"stream_ij_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="dl_stream_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Custom stateful streaming, oracle-checked: per-user running
# (count, sum, last_ts) maintained in the state store via
# applyInPandasWithState (streaming/stateful.py), replayed over the
# full history with availableNow. Each user's final update row carries
# the whole-history aggregate, so the streaming result hash-matches a
# plain batch GROUP BY — the correctness contract for the stateful
# operator itself. Multi-batch replays are reduced with max_by on the
# monotone event count.
# ---------------------------------------------------------------------------
@register(
    "events_stateful_running_stats",
    sql="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_tsu
FROM events GROUP BY user_id
""",
)
def events_stateful_running_stats(spark: SparkSession, sf_dir: str):
    import shutil
    import tempfile
    import uuid

    from dl_datalake_spark.streaming.stateful import running_user_stats
    from dl_datalake_spark.tables import epoch_us

    static = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    prep = stream.select(
        "user_id", epoch_us(stream).alias("ts"), "value"
    )
    out = running_user_stats(prep)
    name = f"stateful_stats_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="dl_stream_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    t = spark.table(name)
    # update mode appends one row per (user, batch); the final row has
    # the largest monotone n_events — reduce to it
    return t.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("sum_value", "n_events"), 4).alias("sum_value"),
        F.max("last_ts").alias("last_tsu"),
    )


# ---------------------------------------------------------------------------
# SCD-2 dimension build: change capture -> validity intervals
# ---------------------------------------------------------------------------
@register(
    "events_scd2_intervals",
    sql="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
o AS (SELECT user_id, event_type, tsu,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY tsu) AS prev_type
      FROM e),
ch AS (SELECT user_id, event_type, tsu FROM o
       WHERE prev_type IS NULL OR prev_type <> event_type),
iv AS (SELECT user_id, event_type, tsu AS valid_from,
              LEAD(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS valid_to
       FROM ch)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) - COUNT(valid_to) AS BIGINT) AS n_open,
       CAST(SUM(valid_to - valid_from) AS BIGINT) AS total_dwell_us,
       CAST(MAX(valid_to - valid_from) AS BIGINT) AS max_dwell_us
FROM iv GROUP BY event_type
""",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str):
    """Slowly-changing-dimension type-2 build from an event stream (CDC
    shape): per user, each event_type transition closes the previous
    validity interval and opens a new one — lag() for change capture,
    lead() for the interval close, both over the same (user_id, tsu)
    window so Spark computes them in ONE sort+shuffle per step.

    Scale: both windows partition by user_id — no global sort, no
    skew beyond the hottest user; the change-capture filter shrinks
    the stream before the second window. This is the batch mirror of
    the reference's watermark-resume ingest state tracking
    (metadata/manifest.py watermarks) applied to dimension history.
    """
    ev = _with_tsu(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "tsu"
    )
    iv = scd2_intervals(ev, key="user_id", ts_col="tsu", attr_col="event_type")
    dwell = F.col("valid_to") - F.col("valid_from")
    return iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (F.count(F.lit(1)) - F.count("valid_to")).alias("n_open"),
        F.sum(dwell).alias("total_dwell_us"),
        F.max(dwell).alias("max_dwell_us"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming session windows, oracle-checked: the events table
# replayed through the file stream source, sessionized per user with the
# builtin session_window + watermark, availableNow → memory sink. Full-
# history replay makes streaming == batch, so the result hash-matches
# the same island-detection SQL as the batch variant. On a live source
# the watermark bounds session state to (gap + lateness) per user.
# ---------------------------------------------------------------------------
@register(
    "events_stream_session",
    sql=f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS tsu, value,
         CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                   >= {US_30MIN} OR
                   LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events),
sessions AS (
  SELECT user_id, tsu, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY tsu
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT user_id, MIN(tsu) AS session_start_us,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM sessions GROUP BY user_id, sid
""",
)
def events_stream_session(spark: SparkSession, sf_dir: str):
    import shutil
    import tempfile
    import uuid

    from dl_datalake_spark.tables import epoch_us

    static = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    ev = stream.withColumn("event_time", F.timestamp_micros(epoch_us(stream)))
    agg = (
        ev.withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )
    name = f"stream_session_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="dl_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# trailing-window anomaly scores over the hourly aggregate
# ---------------------------------------------------------------------------
@register(
    "events_hourly_anomaly",
    sql=f"""
WITH h AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket, COUNT(*) AS n
  FROM events GROUP BY 1
),
z AS (
  SELECT hour_bucket, CAST(n AS BIGINT) AS n,
         AVG(n) OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sd,
         COUNT(*) OVER w AS m
  FROM h
  WINDOW w AS (ORDER BY hour_bucket ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour_bucket, n,
       ROUND(mu, 4) AS trailing_avg,
       ROUND(CASE WHEN sd > 0 THEN (n - mu) / sd END, 3) AS zscore,
       CASE WHEN sd > 0 AND ABS((n - mu) / sd) >= 3 THEN TRUE ELSE FALSE END AS is_spike
FROM z WHERE m >= 12
""",
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str):
    """Trailing-window anomaly detection: hourly event counts scored
    against the mean/stddev of the PREVIOUS 24 hours (frame excludes
    the current row, so a spike can't mask itself). Rows need >= 12
    trailing hours before scoring — no z-scores from a cold start.

    Scale note: the global-order window runs over the HOURLY AGGREGATE
    (24 rows/day — a few thousand rows even for a year of 100 TB
    telemetry), not the raw stream; the only full-data pass is the
    hash-agg that builds it. This two-level shape (massive agg →
    tiny single-partition window) is the standard way to get
    sequential statistics without a global sort of the fact table.
    """
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        F.expr(f"tsu DIV {US_PER_HOUR}").alias("hour_bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.orderBy("hour_bucket").rowsBetween(-24, -1)
    )
    z = hourly.select(
        "hour_bucket",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("m"),
    ).where(F.col("m") >= 12)
    zscore = F.when(F.col("sd") > 0, (F.col("n") - F.col("mu")) / F.col("sd"))
    return z.select(
        "hour_bucket",
        "n",
        F.round("mu", 4).alias("trailing_avg"),
        F.round(zscore, 3).alias("zscore"),
        F.when(zscore.isNotNull() & (F.abs(zscore) >= 3), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_spike"),
    )


# ---------------------------------------------------------------------------
# salted two-phase aggregation (skew-proof), oracle = the plain aggregate
# ---------------------------------------------------------------------------
@register(
    "events_salted_type_stats",
    sql="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS count_value,
       ROUND(SUM(value), 4) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
""",
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str):
    """Two-phase salted aggregation on a LOW-cardinality group key —
    the skew case AQE cannot split (a hash agg funnels each key into
    one task; 5 event types = 5 tasks no matter how many executors).
    Salting fans phase 1 across key x salt_buckets tasks; phase 2
    merges partials. The oracle is the PLAIN aggregate: salting must
    be invisible in the result, which is exactly what the hash check
    proves (count/sum/min/max are re-combinable monoids; the rounding
    happens only after the final merge).
    """
    from dl_datalake_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs=[("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")],
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("count_value"),
        F.round("sum_value", 4).alias("sum_value"),
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# value-position window frames: first/last/nth per user timeline
# ---------------------------------------------------------------------------
@register(
    "events_value_frames",
    sql="""
WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value, event_type FROM events
           WHERE user_id < 50)
SELECT user_id, tsu,
       FIRST_VALUE(value) OVER w AS first_val,
       LAST_VALUE(value) OVER w AS running_last,
       NTH_VALUE(value, 2) OVER w AS second_val,
       FIRST_VALUE(event_type) OVER w AS first_type
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY tsu
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def events_value_frames(spark: SparkSession, sf_dir: str):
    """first_value / last_value / nth_value over a running frame — the
    navigation-function family the window suite didn't yet pin. The
    frame is explicit (UNBOUNDED PRECEDING..CURRENT ROW) because
    last_value under the DEFAULT frame is the famous footgun (default
    RANGE..CURRENT ROW makes it the current row's value in both
    engines, but only by coincidence of frame semantics — pin it).
    """
    ev = (
        _with_tsu(load_table(spark, sf_dir, "events"))
        .where(F.col("user_id") < 50)
        .select("user_id", "tsu", "value", "event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "tsu",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("running_last"),
        F.nth_value("value", 2).over(w).alias("second_val"),
        F.first("event_type").over(w).alias("first_type"),
    )


# ---------------------------------------------------------------------------
# hot-key diagnosis: the report you run before picking salt_buckets
# ---------------------------------------------------------------------------
@register(
    "events_key_skew_report",
    sql="""
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nkeys FROM c)
SELECT user_id, n,
       ((2 * CAST(n AS BIGINT) * 1000000 + CAST(tot AS BIGINT)) // (2 * CAST(tot AS BIGINT))) / 1000000.0 AS share,
       ((2 * CAST(n * nkeys AS BIGINT) * 10000 + CAST(tot AS BIGINT)) // (2 * CAST(tot AS BIGINT))) / 10000.0 AS x_mean
FROM c, t
ORDER BY n DESC, user_id
LIMIT 10
""",
)
def events_key_skew_report(spark: SparkSession, sf_dir: str):
    """Top-10 hottest user_ids with row share and multiple-of-mean —
    the skew diagnosis feeding salted_agg's bucket choice (see
    events_salted_type_stats). TakeOrdered top-k, no global sort."""
    from dl_datalake_spark.operators.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "events"), ["user_id"], top_n=10)


# ---------------------------------------------------------------------------
# rolling median: holistic aggregate emulated over a bounded frame
# ---------------------------------------------------------------------------
@register(
    "events_rolling_median",
    sql=f"""
WITH h AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT hour_bucket, n,
       quantile_disc(n, 0.5) OVER (ORDER BY hour_bucket
                                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
         AS med_24h
FROM h
""",
)
def events_rolling_median(spark: SparkSession, sf_dir: str):
    """Rolling 24-hour median of hourly counts. Spark has no holistic
    aggregates over moving frames, so the frame's values ride a
    collect_list window and the discrete median is picked positionally
    from the sorted array: element floor((m-1)/2)+1 — exactly DuckDB's
    quantile_disc(0.5) index, so the hash check pins the emulation.

    Cost model: the frame is BOUNDED (24 rows), so the array is O(24)
    per output row — this pattern is linear in frame x rows and runs
    over the hourly aggregate, not the raw stream. For unbounded or
    large frames use approx sketches instead (agg_approx_quantile_audit
    is the accuracy contract for that swap).
    """
    ev = _with_tsu(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(F.expr(f"tsu DIV {US_PER_HOUR}").alias("hour_bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("hour_bucket").rowsBetween(-23, Window.currentRow)
    vals = F.sort_array(F.collect_list("n").over(w))
    idx = (F.floor((F.size(vals) - 1) / 2) + 1).cast("int")
    return hourly.select(
        "hour_bucket", "n", F.element_at(vals, idx).alias("med_24h")
    )


# ---------------------------------------------------------------------------
# incremental materialized view, oracle-checked end-to-end: the events
# stream maintains per-type partial states (streaming/mv.py) in a temp
# lake dir; the returned view merges them. Full-history availableNow
# replay makes the MV equal the direct aggregate, and the HLL distinct
# state is audited against the exact count with a boolean tolerance.
# ---------------------------------------------------------------------------
@register(
    "events_stream_incremental_mv",
    sql="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_within_tol
FROM events GROUP BY event_type
""",
)
def events_stream_incremental_mv(spark: SparkSession, sf_dir: str):
    import shutil
    import tempfile

    from dl_datalake_spark.streaming.mv import incremental_mv, read_mv

    static = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    mv_path = tempfile.mkdtemp(prefix="dl_mv_")
    ckpt = tempfile.mkdtemp(prefix="dl_mv_ckpt_")
    try:
        q = incremental_mv(
            stream.select("event_type", "value", "user_id"),
            ["event_type"],
            "value",
            mv_path,
            ckpt,
            distinct_col="user_id",
        )
        q.awaitTermination()
        view = read_mv(spark, mv_path, ["event_type"])
        exact = static.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("exact_users")
        )
        out = (
            view.join(exact, "event_type")
            .select(
                "event_type",
                F.col("n"),
                F.round("sum_value", 4).alias("sum_value"),
                "min_value",
                "max_value",
                "exact_users",
                (
                    F.abs(F.col("approx_distinct") - F.col("exact_users"))
                    <= 0.05 * F.col("exact_users")
                ).alias("hll_within_tol"),
            )
            .collect()
        )
        return spark.createDataFrame(
            out,
            "event_type string, n long, sum_value double, min_value double, "
            "max_value double, exact_users long, hll_within_tol boolean",
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(mv_path, ignore_errors=True)


# ---------------------------------------------------------------------------
# session-depth histogram: how long do sessions run?
# ---------------------------------------------------------------------------
@register(
    "events_session_depth_histogram",
    sql=f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS tsu,
         CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                   >= {US_30MIN} OR
                   LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events),
sessions AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY tsu
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
depth AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM sessions GROUP BY user_id, sid)
SELECT LEAST(n_events, 20) AS depth_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS events_covered
FROM depth GROUP BY 1
""",
)
def events_session_depth_histogram(spark: SparkSession, sf_dir: str):
    """Engagement-depth distribution: events per session (30-minute
    gap sessions), histogrammed with a 20+ tail bucket. The product
    question behind it — are sessions getting shallower? — reads
    straight off consecutive snapshots of this output. Three stages,
    all sharded by user: change capture, running session id, per-
    session count; the histogram is an aggregate of the aggregate.
    """
    ev = _with_tsu(load_table(spark, sf_dir, "events")).select("user_id", "tsu")
    w = Window.partitionBy("user_id").orderBy("tsu")
    prev = F.lag("tsu").over(w)
    marked = ev.withColumn(
        "is_start",
        F.when(prev.isNull() | (F.col("tsu") - prev >= US_30MIN), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_start").over(
            Window.partitionBy("user_id").orderBy("tsu").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    depth = sess.groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("n_events"))
    return depth.groupBy(
        F.least(F.col("n_events"), F.lit(20)).alias("depth_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("events_covered"),
    )


# ---------------------------------------------------------------------------
# audience overlap: Jaccard of user sets between event types
# ---------------------------------------------------------------------------
@register(
    "events_type_user_overlap",
    sql="""
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz FROM tu GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, inter,
       ((2 * inter * 1000000 + (sa.sz + sb.sz - inter))
        // (2 * (sa.sz + sb.sz - inter))) / 1e6 AS jaccard
FROM inter JOIN sz sa ON type_a = sa.event_type
           JOIN sz sb ON type_b = sb.event_type
""",
)
def events_type_user_overlap(spark: SparkSession, sf_dir: str):
    """Audience overlap between event types: Jaccard of their distinct
    user sets via the inverted-index join (users sharing a pair of
    types meet on user_id — never a cross join), ratio in exact
    micros. The segmentation question "do purchasers and errorers
    overlap" as one equi-join; the same shape as the n-gram Jaccard
    dedup, applied to ID sets.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sz = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a = ev.select(F.col("event_type").alias("type_a"), "user_id")
    b = ev.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("sz").alias("sa"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("sz").alias("sb"))
    union_sz = F.col("sa") + F.col("sb") - F.col("inter")
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "inter",
            ratio_round(F.col("inter"), union_sz).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming exactly-once dedup, oracle-checked (SURVEY §2.9 T3's
# registry twin): the same events directory is read as TWO file
# streams and unioned — a faithful model of at-least-once redelivery
# (every event arrives twice) — then dropDuplicates(event_id) restores
# exactly-once before a keyed aggregate. availableNow replays the full
# history, so the deduped streaming result hash-matches the plain
# batch aggregate over the ORIGINAL table. On a live source the same
# plan bounds state with dropDuplicatesWithinWatermark
# (streaming/ingest.py:86).
# ---------------------------------------------------------------------------
@register(
    "events_stream_dedup",
    sql="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type
""",
)
def events_stream_dedup(spark: SparkSession, sf_dir: str):
    import shutil
    import tempfile
    import uuid

    static = load_table(spark, sf_dir, "events")

    def source():
        return (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir.rstrip("/"))
        )

    doubled = source().unionByName(source())  # at-least-once: 2x delivery
    deduped = doubled.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="dl_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
