"""The engine's scalar-function surface (SURVEY §2.8 F1-F11), named.

Pure Column expressions — every one stays JVM-side inside whole-stage
codegen. This module is the public index; heavier per-domain helpers
live next to their operators (text, similarity, curation) and are
re-exported here so a user of the reference's utility surface finds
one import path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dl_datalake_spark.lake.paths import sanitize_symbol  # F6 (driver-side key sanitize)
from dl_datalake_spark.operators.curation import hash_key  # deterministic sampling key
from dl_datalake_spark.operators.dedup import tokens  # tokenizer used across text ops
from dl_datalake_spark.operators.similarity import cosine  # array<float> cosine

__all__ = [
    "epoch_ms_to_ts", "ts_to_epoch_ms", "trunc_month", "ts_to_date",
    "strftime_col", "iso_to_epoch_ms_col", "sanitize_symbol", "lit_tag",
    "json_get", "sha256_hex", "ts_diff", "path_timeframe",
    "tokens", "cosine", "hash_key",
]


def epoch_ms_to_ts(col) -> Column:
    """F1 — int64 epoch-ms → timestamp (`pl.from_epoch(ms)`)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def ts_to_epoch_ms(col) -> Column:
    """F1 inverse — timestamp → int64 epoch-ms."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def trunc_month(col) -> Column:
    """F2 — truncate timestamp to month start (`dt.truncate('1mo')`)."""
    return F.date_trunc("month", F.col(col) if isinstance(col, str) else col)


def ts_to_date(col) -> Column:
    """F3 — timestamp → date (`dt.date()`)."""
    return F.to_date(F.col(col) if isinstance(col, str) else col)


def strftime_col(col, fmt: str = "yyyyMMdd") -> Column:
    """F4 — strftime projection for exports (`%Y%m%d` → `yyyyMMdd`)."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, fmt)


def iso_to_epoch_ms_col(col) -> Column:
    """F5 — ISO date/timestamp string → epoch-ms, UTC (fixes the
    reference's local-tz wobble, reader.py:53)."""
    return F.unix_millis(F.to_timestamp(F.col(col) if isinstance(col, str) else col))


def lit_tag(value) -> Column:
    """F7 — injected literal column (symbol/timeframe tags in exports)."""
    return F.lit(value)


def json_get(col, path: str) -> Column:
    """F8 — JSON field extraction as an engine expression (the
    reference json.loads's row-at-a-time, pipeline.py:153-158)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def sha256_hex(col) -> Column:
    """F9 — row-level sha256 hex (file-level checksums stay driver-side
    in FeatureStore/IngestPipeline, matching the reference)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def ts_diff(col, ts_col: str = "ts") -> Column:
    """F10 — arithmetic on ts columns (gap math, pipeline.py:181)."""
    return (F.col(col) if isinstance(col, str) else col) - F.col(ts_col)


def path_timeframe(col) -> Column:
    """F11 — parse the timeframe path segment after raw|ticks|agg|feature
    (data.py:60-71); obsolete once period is a real partition column,
    kept for manifest rows written by older layouts."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "/")

    def after(marker: str) -> Column:
        idx = F.array_position(parts, marker)
        return F.when(idx > 0, F.element_at(parts, (idx + 1).cast("int")))

    return F.coalesce(*[after(m) for m in ("raw", "ticks", "agg", "feature")])
