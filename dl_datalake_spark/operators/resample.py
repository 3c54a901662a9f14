"""OHLCV resample: tumbling-window aggregation over candle series.

Reference: `orchestration/flows.py:76-90` — Polars
`group_by_dynamic(every=tf).agg(open.first, high.max, low.min,
close.last, volume.sum, ts.first)`, which is deterministic only because
the input frame is pre-sorted. Under Spark parallelism F.first/F.last
are order-dependent, so we use min_by/max_by keyed on ts — deterministic
regardless of partitioning (SURVEY §4.2), and still a single hash
aggregate (map-side partial + final), no sort, no shuffle beyond the
group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DURATION_MS = {
    "1m": 60_000,
    "5m": 300_000,
    "15m": 900_000,
    "30m": 1_800_000,
    "1h": 3_600_000,
    "4h": 14_400_000,
    "1d": 86_400_000,
    # reference spelling (flows.py:74 duration map)
    "1min": 60_000,
    "15min": 900_000,
}


def timeframe_ms(tf: str) -> int:
    if tf not in _DURATION_MS:
        raise ValueError(f"unknown timeframe {tf!r}; known: {sorted(_DURATION_MS)}")
    return _DURATION_MS[tf]


def resample_ohlcv(
    df: DataFrame,
    every: str,
    ts_col: str = "ts",
    by: list[str] | None = None,
) -> DataFrame:
    """1m candles → `every` candles. `ts` = epoch ms.

    Integer bucket arithmetic (ts DIV step * step) instead of
    F.window(): keeps ts in the reference's epoch-ms domain, avoids a
    timestamp round-trip, and groups on a single long column — cheap to
    shuffle and exactly reproducible in any SQL engine.
    """
    step = timeframe_ms(every)
    bucket = (F.col(ts_col).cast("long") - (F.col(ts_col).cast("long") % F.lit(step))).alias("ts")
    keys = [F.col(c) for c in (by or [])]
    return (
        df.groupBy(*keys, bucket)
        .agg(
            F.min_by("open", ts_col).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts_col).alias("close"),
            F.sum("volume").alias("volume"),
        )
        .orderBy(*(by or []), "ts")
    )
