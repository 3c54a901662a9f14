"""Exchange REST connector: driver-side paged download loop feeding
chunked lake appends.

Re-expresses the reference's `ingest/exchange_connector.py:55-446`
mechanics — watermark resume, paged fetch, continuity check, empty-page
gap jump, rate-limit retry, chunked incremental flush — against an
injectable client so tests use a fake exchange (the CCXT dependency is
optional and the network is out of scope).

Boundary discipline (SURVEY §7.4): all cursor/retry/backoff state lives
on the driver; the data plane only ever sees `spark.createDataFrame(
chunk, OHLCV_SCHEMA)` → LakeWriter.write_ohlc. On a cluster this is a
thin feeder; Structured Streaming (streaming/ingest.py) is the
continuous variant.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.writer import LakeWriter

OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
    ]
)


class RateLimitError(Exception):
    """Raised by clients on HTTP 429 / DDoS protection."""


@dataclass
class ConnectorConfig:
    page_limit: int = 1000          # candles per request (Binance max)
    flush_chunk: int = 5000         # rows per incremental lake flush
    rate_limit_sleep: float = 30.0  # seconds after a 429
    max_rate_retries: int = 5
    generic_backoff: float = 1.0
    max_empty_jumps: int = 10       # consecutive empty pages → stop
    sleep: Callable[[float], None] = field(default=lambda: time.sleep)


class ExchangeConnector:
    """`client.fetch_ohlcv(symbol, timeframe, since, limit)` →
    list[[ts, o, h, l, c, v]] — the CCXT signature, injectable."""

    def __init__(
        self,
        spark: SparkSession,
        writer: LakeWriter,
        client,
        config: ConnectorConfig | None = None,
    ):
        self.spark = spark
        self.writer = writer
        self.client = client
        self.cfg = config or ConnectorConfig()

    def download_ohlcv(
        self,
        key: DatasetKey,
        timeframe_ms: int,
        since: int | None = None,
        until: int | None = None,
        progress: Callable[[int], None] | None = None,
    ) -> int:
        """Paged incremental download; returns rows written.

        Resume: `since` defaults to manifest watermark + 1
        (exchange_connector.py:89-105 semantics).
        """
        cfg = self.cfg
        manifest = self.writer.manifest
        if since is None and manifest is not None:
            wm = manifest.watermark(key.exchange, key.symbol, key.data_type)
            since = (wm + 1) if wm is not None else 0
        since = since or 0
        # T7 (exchange_connector.py:271-273): with no explicit `until`,
        # track "now" as the download runs — a multi-day backfill would
        # otherwise stop at the clock reading taken when it started
        track_now = until is None
        until = until if until is not None else int(time.time() * 1000)

        buffer: list[Sequence] = []
        total = 0
        empty_jumps = 0
        rate_retries = 0
        expected_next: int | None = None

        while since < until:
            if track_now:
                until = int(time.time() * 1000)
            try:
                page = self.client.fetch_ohlcv(
                    key.symbol, timeframe_ms, since=since, limit=cfg.page_limit
                )
            except RateLimitError:
                rate_retries += 1
                if rate_retries > cfg.max_rate_retries:
                    break
                cfg.sleep(cfg.rate_limit_sleep)
                continue
            except Exception:
                cfg.sleep(cfg.generic_backoff)
                break
            rate_retries = 0

            if not page:
                # empty page: jump the cursor (delisted/genesis gaps)
                empty_jumps += 1
                if empty_jumps > cfg.max_empty_jumps:
                    break
                since += cfg.page_limit * timeframe_ms
                continue
            empty_jumps = 0

            # continuity check across pages (T4)
            if expected_next is not None and page[0][0] != expected_next:
                pass  # gap or overlap — logged by caller via verify; data kept
            buffer.extend(page)
            last_ts = page[-1][0]
            expected_next = last_ts + timeframe_ms
            since = last_ts + timeframe_ms

            if len(buffer) >= cfg.flush_chunk:
                total += self._flush(buffer, key)
                buffer = []
                if progress:
                    progress(total)
            if len(page) < cfg.page_limit and since >= until:
                break

        if buffer:
            total += self._flush(buffer, key)
            if progress:
                progress(total)
        return total

    def probe_listing_date(self, symbol: str, timeframe_ms: int) -> int | None:
        """First-available candle timestamp (T6, exchange_connector.py:126-186).

        Primary probe: `fetch_ohlcv(since=0, limit=1)` — most exchanges
        return the earliest candle. Fallback: probe from 5 years back.
        Rate-limited probes retry ≤3 times (the reference's tighter
        probe budget vs the ≤5 of the main loop).
        """
        cfg = self.cfg
        five_years_ago = int(time.time() * 1000) - 5 * 365 * 86_400_000
        for since in (0, five_years_ago):
            retries = 0
            while retries <= 3:
                try:
                    page = self.client.fetch_ohlcv(symbol, timeframe_ms, since=since, limit=1)
                except RateLimitError:
                    retries += 1
                    cfg.sleep(cfg.rate_limit_sleep)
                    continue
                except Exception:
                    break
                if page:
                    return int(page[0][0])
                break
        return None

    def download_funding(
        self,
        key: DatasetKey,
        since: int | None = None,
        until: int | None = None,
        page_ms: int = 8 * 3_600_000 * 1000,
    ) -> int:
        """Funding-rate history ingest (exchange_connector.py:355-446).

        `client.fetch_funding_rate_history(symbol, since, limit)` →
        list of {"timestamp": ms, "fundingRate": f, "symbol": s} dicts
        (the CCXT shape). Watermark resume is per data_type — funding
        and raw cursors never mix (reference bug class avoided by
        keying the manifest on data_type, not on metadata substring
        matching). Rows land via write_ticks (ts + arbitrary columns).
        """
        cfg = self.cfg
        manifest = self.writer.manifest
        if since is None and manifest is not None:
            wm = manifest.watermark(key.exchange, key.symbol, key.data_type)
            since = (wm + 1) if wm is not None else 0
        since = since or 0
        until = until if until is not None else int(time.time() * 1000)

        total = 0
        rate_retries = 0
        buffer: list[dict] = []
        while since < until:
            try:
                page = self.client.fetch_funding_rate_history(
                    key.symbol, since=since, limit=cfg.page_limit
                )
            except RateLimitError:
                rate_retries += 1
                if rate_retries > cfg.max_rate_retries:
                    break
                cfg.sleep(cfg.rate_limit_sleep)
                continue
            except Exception:
                cfg.sleep(cfg.generic_backoff)
                break
            rate_retries = 0
            if not page:
                break
            buffer.extend(page)
            since = int(page[-1]["timestamp"]) + 1
            if len(buffer) >= cfg.flush_chunk:
                total += self._flush_funding(buffer, key)
                buffer = []
        if buffer:
            total += self._flush_funding(buffer, key)
        return total

    def _flush_funding(self, rows: list[dict], key: DatasetKey) -> int:
        df = self.spark.createDataFrame(
            [
                (int(r["timestamp"]), float(r["fundingRate"]), str(r.get("symbol", key.symbol)))
                for r in rows
            ],
            "ts long, funding_rate double, symbol string",
        )
        self.writer.write_ticks(df, key)
        return len(rows)

    def _flush(self, rows: list[Sequence], key: DatasetKey) -> int:
        if not rows:
            return 0
        df = self.spark.createDataFrame(
            [(int(r[0]), float(r[1]), float(r[2]), float(r[3]), float(r[4]), float(r[5])) for r in rows],
            OHLCV_SCHEMA,
        )
        self.writer.write_ohlc(df, key)
        # WriteResult.rows counts the MERGED dataset (existing ∪ batch);
        # the download total is the number of fetched candles
        return len(rows)
