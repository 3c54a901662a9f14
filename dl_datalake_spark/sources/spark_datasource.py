"""PySpark Python Data Source for exchange OHLCV — batch + streaming.

SURVEY §2.1 S5 maps the reference's driver-side CCXT loop
(`ingest/exchange_connector.py:55-316`) to "a custom streaming Source
for bonus points"; this module is that source, built on the Spark 4
Python Data Source API:

- **batch**: ``spark.read.format("exchange_ohlcv")`` — one input
  partition per (symbol, time-slice), so page fetching runs ON THE
  EXECUTORS in parallel instead of a single driver loop. At 1000
  symbols × years of history this is the difference between a day-long
  driver crawl and an hour of cluster fan-out (rate limits permitting:
  page budget per partition stays the reference's 1000-candle page).
- **pushdown**: ``pushFilters`` consumes `ts` range predicates and
  `symbol` equality/IN — `WHERE ts >= X` narrows the fetch window at
  the source, the REST analogue of parquet row-group pruning.
- **streaming**: ``spark.readStream.format("exchange_ohlcv")`` —
  micro-batch offsets are `{"until_ms": N}` watermarks over immutable
  candle history, so any (start, end] range is replayable and the
  checkpoint gives exactly-once (the reference's manifest-watermark
  resume, `exchange_connector.py:89-105`, upgraded to a real
  Structured Streaming source with driver-managed offsets).

Transport: workers receive only pickled string options, never live
client objects. The default transport is a deterministic synthetic
exchange (integer-mix pseudo-random walk — this container has no
network and no ccxt); a real CCXT transport plugs in with
``option("transport", "ccxt")`` where the library exists. Candle
values are a pure function of (symbol, bucket, seed): any slice of
any partition regenerates identically, which is what makes both the
batch retry story and the streaming replay story exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SCHEMA = (
    "symbol string, ts long, open double, high double, low double, "
    "close double, volume double"
)


def _mix64(x: int) -> int:
    """splitmix64 finalizer — stateless integer hash, exact on any host."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _sym_seed(symbol: str, seed: int) -> int:
    h = seed & 0xFFFFFFFFFFFFFFFF
    for ch in symbol:
        h = _mix64(h ^ ord(ch))
    return h


class SyntheticExchange:
    """Deterministic fake exchange with the CCXT ``fetch_ohlcv``
    signature. close(i) is a pure function of (symbol, bucket i), and
    open(i) = close(i-1) — O(1) random access, so a partition can start
    mid-history without replaying from genesis."""

    def __init__(self, timeframe_ms: int, seed: int = 42, listing_ms: int = 0):
        self.tf = timeframe_ms
        self.seed = seed
        self.listing_ms = listing_ms

    def _close(self, s: int, i: int) -> float:
        return 100.0 + ((_mix64(s ^ (i * 0x2545F4914F6CDD1D)) % 2001) - 1000) / 100.0

    def fetch_ohlcv(self, symbol, timeframe_ms, since=0, limit=1000, until=None):
        tf = timeframe_ms or self.tf
        s = _sym_seed(symbol, self.seed)
        first = max(int(since), self.listing_ms)
        i0 = -(-first // tf)  # ceil-align to the candle grid
        rows = []
        for i in range(i0, i0 + int(limit)):
            ts = i * tf
            if until is not None and ts >= until:
                break
            c = self._close(s, i)
            o = self._close(s, i - 1)
            u = _mix64(s ^ i ^ 0xDEADBEEF)
            hi = max(o, c) + (u % 100) / 100.0
            lo = min(o, c) - ((u >> 32) % 100) / 100.0
            vol = 1.0 + (_mix64(u) % 10_000) / 100.0
            rows.append([ts, o, hi, lo, c, vol])
        return rows


def make_transport(options: dict):
    """Build a transport from (string) reader options — runs on the
    worker, so it must construct everything from scratch."""
    kind = options.get("transport", "synthetic")
    tf = int(options.get("timeframe_ms", 60_000))
    if kind == "synthetic":
        return SyntheticExchange(
            timeframe_ms=tf,
            seed=int(options.get("seed", 42)),
            listing_ms=int(options.get("listing_ms", 0)),
        )
    if kind == "ccxt":  # pragma: no cover — ccxt absent in this environment
        import ccxt

        return getattr(ccxt, options.get("exchange", "binance"))()
    raise ValueError(f"unknown transport {kind!r}")


@dataclass
class SlicePartition(InputPartition):
    symbol: str
    start_ms: int  # inclusive
    end_ms: int    # exclusive


def _read_slice(part: SlicePartition, options: dict):
    """Paged fetch of one (symbol, slice) — the executor-side loop.
    Mirrors the reference's paging (1000/page) but is stateless:
    retries/rescheduling just rerun the slice."""
    transport = make_transport(options)
    tf = int(options.get("timeframe_ms", 60_000))
    page_limit = int(options.get("page_limit", 1000))
    since = part.start_ms
    while since < part.end_ms:
        page = transport.fetch_ohlcv(
            part.symbol, tf, since=since, limit=page_limit, until=part.end_ms
        )
        if not page:
            break
        for ts, o, h, lo, c, v in page:
            if ts >= part.end_ms:
                return
            yield (part.symbol, int(ts), float(o), float(h), float(lo), float(c), float(v))
        since = int(page[-1][0]) + tf


def _slices(symbols, start_ms: int, end_ms: int, slice_ms: int):
    parts = []
    for sym in symbols:
        lo = start_ms
        while lo < end_ms:
            hi = min(lo + slice_ms, end_ms)
            parts.append(SlicePartition(sym, lo, hi))
            lo = hi
    return parts


class ExchangeBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.symbols = [
            s.strip() for s in options.get("symbols", "BTC_USDT").split(",") if s.strip()
        ]
        self.start_ms = int(options.get("start_ms", 0))
        self.end_ms = int(options["end_ms"])
        tf = int(options.get("timeframe_ms", 60_000))
        page = int(options.get("page_limit", 1000))
        # default slice: 10 pages of candles per task — enough rows to
        # amortize task overhead, small enough to fan out
        self.slice_ms = int(options.get("slice_ms", 10 * page * tf))

    def pushFilters(self, filters):
        """Consume ts-range and symbol filters; the fetch window and
        symbol list shrink BEFORE any REST call happens. Must be eager
        (not a generator): partitions() reads the narrowed bounds."""
        remaining = []
        for f in filters:
            if isinstance(f, GreaterThanOrEqual) and f.attribute == ("ts",):
                self.start_ms = max(self.start_ms, int(f.value))
            elif isinstance(f, GreaterThan) and f.attribute == ("ts",):
                self.start_ms = max(self.start_ms, int(f.value) + 1)
            elif isinstance(f, LessThan) and f.attribute == ("ts",):
                self.end_ms = min(self.end_ms, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("ts",):
                self.end_ms = min(self.end_ms, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("symbol",):
                self.symbols = [s for s in self.symbols if s == f.value]
            elif isinstance(f, In) and f.attribute == ("symbol",):
                keep = set(f.value)
                self.symbols = [s for s in self.symbols if s in keep]
            else:
                remaining.append(f)  # not ours — Spark keeps it
        return remaining

    def partitions(self):
        return _slices(self.symbols, self.start_ms, self.end_ms, self.slice_ms)

    def read(self, partition):
        return _read_slice(partition, self.options)


class ExchangeStreamReader(DataSourceStreamReader):
    """Micro-batch source over immutable candle history. Offsets are
    `{"until_ms": N}`: everything with ts < N has been emitted. Each
    batch advances toward min(now, end_ms); ranges are replayable, so a
    restart from checkpoint re-reads exactly the uncommitted span."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.symbols = [
            s.strip() for s in options.get("symbols", "BTC_USDT").split(",") if s.strip()
        ]
        self.start_ms = int(options.get("start_ms", 0))
        self.end_ms = int(options["end_ms"]) if "end_ms" in options else None
        tf = int(options.get("timeframe_ms", 60_000))
        page = int(options.get("page_limit", 1000))
        self.slice_ms = int(options.get("slice_ms", 10 * page * tf))
        # cap candles per micro-batch so a deep backfill streams in
        # bounded pieces instead of one giant batch
        self.max_batch_ms = int(options.get("max_batch_ms", 1000 * page * tf))
        self._last = self.start_ms

    def initialOffset(self) -> dict:
        return {"until_ms": self.start_ms}

    def _now_ms(self) -> int:
        if self.end_ms is not None:
            return self.end_ms
        import time

        return int(time.time() * 1000)

    def latestOffset(self) -> dict:
        target = min(self._now_ms(), self._last + self.max_batch_ms)
        self._last = max(self._last, target)
        return {"until_ms": self._last}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["until_ms"]), int(end["until_ms"])
        # After a checkpointed restart this reader is fresh (_last ==
        # start_ms) while Spark replans from the committed offset; clamp
        # the cursor to the planned range so latestOffset() resumes from
        # the checkpoint instead of re-walking from start_ms (which would
        # stall availableNow runs whose first batch is already committed).
        self._last = max(self._last, lo, hi)
        if hi <= lo:
            return [SlicePartition("", 0, 0)]  # empty batch placeholder
        return _slices(self.symbols, lo, hi, self.slice_ms)

    def read(self, partition):
        if not partition.symbol:
            return iter(())
        return _read_slice(partition, self.options)

    def commit(self, end: dict) -> None:
        pass  # history is immutable; nothing to clean up


class ExchangeOHLCVDataSource(DataSource):
    """``spark.dataSource.register(ExchangeOHLCVDataSource)`` then
    ``spark.read.format("exchange_ohlcv")`` / ``spark.readStream...``."""

    @classmethod
    def name(cls) -> str:
        return "exchange_ohlcv"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ExchangeBatchReader:
        return ExchangeBatchReader(self.options)

    def streamReader(self, schema) -> ExchangeStreamReader:
        return ExchangeStreamReader(self.options)


def register_exchange_source(spark) -> None:
    # opt-in runtime conf: lets pushFilters() reach the reader
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ExchangeOHLCVDataSource)
