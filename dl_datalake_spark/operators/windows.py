"""Event-stream window operators: sessionization, gap scan, keep-last dedup.

These generalize the reference's lag-diff machinery
(`ingest/pipeline.py:180-196`, `writer.py:92`) to arbitrary keyed
streams. All timestamps here are INTEGER epoch values (ms or ns) — the
driver testdata's events.ts is int64 nanoseconds, and 1.7e18 does not
fit double's mantissa, so arithmetic stays in longs throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS_PER_MIN = 60 * 1_000_000_000


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: int = 30 * NS_PER_MIN,
) -> DataFrame:
    """Assign session ids: a session breaks when the per-user gap > `gap`.

    Two windows over the SAME (user, ts) ordering → one shuffle + one
    sort total; Spark reuses the sorted partition for both.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    is_new = F.when(
        (F.col(ts_col) - F.lag(ts_col).over(w)).isNull()
        | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap),
        1,
    ).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_seq", F.sum("_new_session").over(w)
    ).drop("_new_session")


def keep_last(df: DataFrame, keys: list[str], ts_col: str = "ts", tiebreak: str | None = None) -> DataFrame:
    """Keep the newest row per key (reference upsert semantics, W3)."""
    order = [F.desc(ts_col)] + ([F.desc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def lag_gaps(df: DataFrame, keys: list[str], ts_col: str = "ts", threshold: int = 0) -> DataFrame:
    """Per-key ts deltas; rows whose delta exceeds `threshold`."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    return (
        df.withColumn("prev_ts", F.lag(ts_col).over(w))
        .withColumn("delta", F.col(ts_col) - F.col("prev_ts"))
        .where(F.col("delta") > threshold)
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
) -> DataFrame:
    """SCD type-2 history build from a change stream: per `key`, keep
    only rows where `attr_col` CHANGES (lag-based change capture), then
    close each surviving row's validity interval with the next change's
    timestamp (lead) — [valid_from, valid_to), valid_to null for the
    open current interval.

    Both window functions share one (key, ts) sort, so Spark plans a
    single shuffle+sort; the change filter shrinks the stream before
    the second window pass. Partitioned by key — no global sort, scales
    with the hottest key only. (The reference tracks only a LATEST
    watermark per dataset, metadata/manifest.py:38; full attribute
    history is this same shape applied per-key.)
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    changes = df.withColumn("_prev", F.lag(attr_col).over(w)).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col))
    )
    return changes.select(
        key,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def bucketed_cumsum(
    df: DataFrame,
    value_col: str,
    id_col: str,
    num_buckets: int = 64,
) -> DataFrame:
    """Distributed prefix sum over (value DESC, id ASC) order — the
    scalable replacement for `SUM(v) OVER (ORDER BY ...)`'s
    single-partition window.

    Three stages, none global: (1) range-bucket rows by value using
    approx-percentile boundaries (a metadata-sized literal — the same
    sampling trick as Spark's range partitioner; boundary placement
    affects only the PLAN, never the result, because ties share a
    bucket and the within-bucket sort carries the full tie-break);
    (2) per-bucket running sum + row_number — parallel across buckets;
    (3) per-bucket totals (num_buckets rows) turned into bucket-prefix
    offsets by a window over that TINY table, broadcast back.

    Returns df + columns: cum_sum (inclusive running sum), rnk (1-based
    position), tot_sum (grand total on every row).
    """
    qs = []
    if num_buckets > 1:
        qs = (
            df.agg(
                F.percentile_approx(
                    value_col,
                    [i / num_buckets for i in range(1, num_buckets)],
                    10_000,
                )
            ).first()[0]
            or []
        )
    if qs:
        boundaries = F.array(*[F.lit(float(q)) for q in qs])
        b = F.size(F.filter(boundaries, lambda q: q > F.col(value_col)))
    else:
        b = F.lit(0)  # degenerate single bucket (empty input / 1 bucket)
    bucketed = df.withColumn("_b", b)
    wb = Window.partitionBy("_b").orderBy(F.desc(value_col), F.asc(id_col))
    within = bucketed.withColumn("_c", F.sum(value_col).over(wb)).withColumn(
        "_r", F.row_number().over(wb).cast("long")
    )
    btot = bucketed.groupBy("_b").agg(
        F.sum(value_col).alias("_bs"), F.count(F.lit(1)).alias("_bc")
    )
    wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "_b",
        # int literal so coalesce preserves the input's type: a LONG
        # value column keeps exact integer prefix sums (the drift-free
        # money path); lit(0.0) would silently widen cum_sum to double
        F.coalesce(F.sum("_bs").over(wo), F.lit(0)).alias("_off"),
        F.coalesce(F.sum("_bc").over(wo), F.lit(0)).cast("long").alias("_offc"),
        F.sum("_bs").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot_sum"),
    )
    return (
        within.join(F.broadcast(offsets), "_b")
        .withColumn("cum_sum", F.col("_off") + F.col("_c"))
        .withColumn("rnk", F.col("_offc") + F.col("_r"))
        .drop("_b", "_c", "_r", "_off", "_offc", "_bs", "_bc")
    )


def ordered_running_sum(
    df: DataFrame,
    range_col: str,
    tie_cols: list,
    value_col: str,
    num_buckets: int = 64,
    out_col: str = "run_sum",
) -> DataFrame:
    """Distributed running SUM(value_col) over the total order
    (range_col ASC, *tie_cols) — the scale-safe replacement for
    ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` whenever
    the leading sort key is a dense numeric (timestamps, sweep-line
    boundaries). Generalizes `bucketed_cumsum` to an arbitrary
    tie-break and a value column distinct from the ordering key.

    Stage shape (none global): (1) ascending range-bucket rows on
    range_col via approx-percentile boundaries. Boundary placement is
    plan-only: `b = #boundaries < range_col` gives every tied
    range_col value the same bucket, so the multi-key tie-break always
    resolves WITHIN one bucket and bucket concatenation reproduces the
    global order exactly. (2) per-bucket running sum — parallel.
    (3) per-bucket totals (num_buckets rows) → prefix offsets via a
    window over that tiny table, broadcast back.

    `tie_cols` take Column sort expressions (e.g. ``F.desc("delta")``).
    """
    qs = []
    if num_buckets > 1:
        qs = (
            df.agg(
                F.percentile_approx(
                    range_col,
                    [i / num_buckets for i in range(1, num_buckets)],
                    10_000,
                )
            ).first()[0]
            or []
        )
    if qs:
        # float boundaries are safe even for int64-ns timestamps: a
        # lossy boundary only shifts WHERE a bucket splits, never
        # separates equal range_col values (fixed b compares equally)
        boundaries = F.array(*[F.lit(float(q)) for q in qs])
        b = F.size(F.filter(boundaries, lambda q: q < F.col(range_col)))
    else:
        b = F.lit(0)
    bucketed = df.withColumn("_b", b)
    wb = (
        Window.partitionBy("_b")
        .orderBy(F.asc(range_col), *tie_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("_c", F.sum(value_col).over(wb))
    btot = bucketed.groupBy("_b").agg(F.sum(value_col).alias("_bs"))
    wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "_b", F.coalesce(F.sum("_bs").over(wo), F.lit(0)).alias("_off")
    )
    return (
        within.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, F.col("_off") + F.col("_c"))
        .drop("_b", "_c", "_off")
    )
