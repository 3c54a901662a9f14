"""Terminal-format CSV export (SURVEY §2.1 S9, §2.2 P6).

The reference exports OHLC segments to the classic charting-terminal
column layout `<TICKER>,<PER>,<DATE>,<TIME>,<OPEN>,<HIGH>,<LOW>,
<CLOSE>,<VOL>` (dl-datalake-ui backend/routers/data.py:154-239;
aggregated variant :243-359: concat all manifest segments → sort by
ts → optionally resample → project → one CSV file).

Spark shape: the projection is a single narrow select over the scan
(F.lit ticker/period columns, date_format for <DATE>/<TIME>), the
optional resample is the shared resample_ohlcv operator, and the file
write is `df.write.csv`. A single output file is what terminals
ingest, so the default coalesces to 1 — for bulk exports at scale pass
single_file=False and let executors write in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dl_datalake_spark.operators.resample import resample_ohlcv

TERMINAL_COLUMNS = [
    "<TICKER>",
    "<PER>",
    "<DATE>",
    "<TIME>",
    "<OPEN>",
    "<HIGH>",
    "<LOW>",
    "<CLOSE>",
    "<VOL>",
]


def terminal_projection(df: DataFrame, ticker: str, period: str) -> DataFrame:
    """Project an OHLC frame (ts epoch-ms) to the terminal layout.

    Mirrors data.py:205-215 / :325-335: literal ticker/period columns,
    UTC yyyyMMdd / HHmmss strings from the epoch-ms ts, ordered by ts.
    """
    t = F.timestamp_millis(F.col("ts").cast("long"))
    return df.orderBy("ts").select(
        F.lit(ticker).alias("<TICKER>"),
        F.lit(period).alias("<PER>"),
        F.date_format(t, "yyyyMMdd").alias("<DATE>"),
        F.date_format(t, "HHmmss").alias("<TIME>"),
        F.col("open").alias("<OPEN>"),
        F.col("high").alias("<HIGH>"),
        F.col("low").alias("<LOW>"),
        F.col("close").alias("<CLOSE>"),
        F.col("volume").alias("<VOL>"),
    )


def export_terminal_csv(
    df: DataFrame,
    path: str,
    ticker: str,
    period: str,
    resample_to: str | None = None,
    single_file: bool = True,
) -> None:
    """Export an OHLC frame to terminal CSV, optionally resampling
    first (the aggregated-export variant, data.py:243-359)."""
    if resample_to is not None:
        df = resample_ohlcv(df, resample_to)
        period = resample_to
    out = terminal_projection(df, ticker, period)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", "true").csv(path)
