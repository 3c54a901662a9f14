"""Stream-stream joins: watermarked interval join between two live
streams.

The batch engine's temporal joins (operators/joins.py: as-of, banded
range-count) have a streaming sibling: joining two UNBOUNDED streams
requires both sides to be watermarked and the join condition to bound
how long a row can wait for its match — Spark then sizes and expires
the join state automatically. Without the time bound the state grows
forever; with it, state is O(watermark window), the same bounding idea
as the reference's incremental cursor (exchange_connector.py:89-105)
applied to two streams at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    band_ms: int,
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of `right` landing within [left.ts, left.ts + band_ms)
    per `by` keys, on two streaming (or batch — same plan) frames.

    Epoch-ms long ts on both sides; each side gets its own event-time
    watermark. Output carries left columns plus right's ts as
    `matched_ts` — project further downstream as needed.
    """
    lt = F.timestamp_millis(F.col(ts_col).cast("long"))
    rt = F.timestamp_millis(F.col(ts_col).cast("long"))
    l = left.withColumn("_lt", lt)
    r = right.withColumn("_rt", rt).withColumnRenamed(ts_col, "matched_ts")
    for c in by:
        r = r.withColumnRenamed(c, f"_r_{c}")
    if l.isStreaming:
        l = l.withWatermark("_lt", watermark_delay)
    if r.isStreaming:
        r = r.withWatermark("_rt", watermark_delay)
    cond = F.lit(True)
    for c in by:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    cond = (
        cond
        & (F.col("_rt") >= F.col("_lt"))
        & (F.col("_rt") < F.col("_lt") + F.expr(f"INTERVAL {band_ms} MILLISECONDS"))
    )
    out = l.join(r, cond, how)
    return out.drop("_lt", "_rt", *[f"_r_{c}" for c in by])
