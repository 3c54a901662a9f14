"""Python Data Source tests: batch read determinism, partition fan-out,
filter pushdown, and the streaming reader's offset/replay contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dl_datalake_spark.sources.spark_datasource import (
    ExchangeBatchReader,
    ExchangeStreamReader,
    SyntheticExchange,
    register_exchange_source,
)

TF = 60_000  # 1m candles
HOUR = 60 * TF


def _reader(spark, **opts):
    base = {
        "symbols": "BTC_USDT,ETH_USDT",
        "timeframe_ms": str(TF),
        "start_ms": "0",
        "end_ms": str(2 * HOUR),
        "slice_ms": str(HOUR),
    }
    base.update({k: str(v) for k, v in opts.items()})
    register_exchange_source(spark)
    r = spark.read.format("exchange_ohlcv")
    for k, v in base.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_counts_and_determinism(spark):
    df = _reader(spark)
    # 2 symbols x 2 hours x 60 candles/hour
    assert df.count() == 2 * 2 * 60
    a = sorted(df.collect())
    b = sorted(_reader(spark).collect())
    assert a == b  # pure function of (symbol, bucket, seed)
    row = a[0]
    assert row["low"] <= min(row["open"], row["close"])
    assert row["high"] >= max(row["open"], row["close"])
    # open(i) == close(i-1): a random walk, not independent noise
    per_sym = [r for r in a if r["symbol"] == "BTC_USDT"]
    assert per_sym[1]["open"] == per_sym[0]["close"]


def test_batch_partition_fanout():
    reader = ExchangeBatchReader(
        {
            "symbols": "A,B,C",
            "timeframe_ms": str(TF),
            "start_ms": "0",
            "end_ms": str(4 * HOUR),
            "slice_ms": str(HOUR),
        }
    )
    parts = reader.partitions()
    assert len(parts) == 3 * 4  # symbols x slices: executor-side fan-out
    assert {p.symbol for p in parts} == {"A", "B", "C"}


def test_filter_pushdown_narrows_fetch_window(spark):
    df = _reader(spark).where(
        (F.col("ts") >= HOUR) & (F.col("symbol") == "ETH_USDT")
    )
    rows = df.collect()
    assert len(rows) == 60  # second hour only, one symbol
    assert all(r["symbol"] == "ETH_USDT" and r["ts"] >= HOUR for r in rows)
    # the reader itself consumed the filters (window + symbol list shrink)
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    reader = ExchangeBatchReader(
        {"symbols": "A,B", "timeframe_ms": str(TF), "start_ms": "0", "end_ms": str(2 * HOUR)}
    )
    remaining = reader.pushFilters(
        [GreaterThanOrEqual(("ts",), HOUR), EqualTo(("symbol",), "B")]
    )
    assert list(remaining) == []
    assert reader.start_ms == HOUR and reader.symbols == ["B"]


def test_synthetic_exchange_page_alignment():
    ex = SyntheticExchange(timeframe_ms=TF, seed=7)
    page = ex.fetch_ohlcv("X", TF, since=90_001, limit=5)
    # ceil-aligned to the grid: first candle strictly covers `since`
    assert page[0][0] == 120_000 and len(page) == 5
    again = ex.fetch_ohlcv("X", TF, since=120_000, limit=5)
    assert page[0] == again[0]  # O(1) random access, same values


def test_stream_reader_offsets_and_batches(spark):
    register_exchange_source(spark)
    sdf = (
        spark.readStream.format("exchange_ohlcv")
        .option("symbols", "BTC_USDT")
        .option("timeframe_ms", str(TF))
        .option("start_ms", "0")
        .option("end_ms", str(2 * HOUR))
        .option("slice_ms", str(HOUR))  # still 2 input partitions per batch
        .load()
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("ohlcv_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ohlcv_stream").collect()
    assert len(out) == 2 * 60  # both hours, exactly once
    assert len({r["ts"] for r in out}) == 2 * 60
    batch_df = _reader(spark, symbols="BTC_USDT")
    assert sorted(out) == sorted(batch_df.collect())  # stream == batch replay


def test_stream_offset_contract():
    r = ExchangeStreamReader(
        {
            "symbols": "A",
            "timeframe_ms": str(TF),
            "start_ms": "0",
            "end_ms": str(3 * HOUR),
            "max_batch_ms": str(HOUR),
            "slice_ms": str(HOUR),
        }
    )
    assert r.initialOffset() == {"until_ms": 0}
    o1 = r.latestOffset()
    o2 = r.latestOffset()
    o3 = r.latestOffset()
    assert [o["until_ms"] for o in (o1, o2, o3)] == [HOUR, 2 * HOUR, 3 * HOUR]
    # bounded: never past end_ms
    assert r.latestOffset() == {"until_ms": 3 * HOUR}
    parts = r.partitions({"until_ms": 0}, {"until_ms": 2 * HOUR})
    assert len(parts) == 2
    # empty range → placeholder partition, read yields nothing
    empty = r.partitions({"until_ms": HOUR}, {"until_ms": HOUR})
    assert list(r.read(empty[0])) == []


def test_stream_offset_resumes_after_checkpointed_restart():
    """A FRESH reader (restart) must clamp its cursor to the offsets
    Spark replans from the checkpoint; otherwise latestOffset() re-walks
    from start_ms and an availableNow run ingests nothing forever."""
    opts = {
        "symbols": "A",
        "timeframe_ms": str(TF),
        "start_ms": "0",
        "end_ms": str(4 * HOUR),
        "max_batch_ms": str(HOUR),
        "slice_ms": str(HOUR),
    }
    r = ExchangeStreamReader(opts)
    # simulate: 2 hours already committed in the checkpoint before restart
    r2 = ExchangeStreamReader(opts)  # fresh instance, _last == start_ms
    r2.partitions({"until_ms": 2 * HOUR}, {"until_ms": 2 * HOUR})
    # next planned batch advances PAST the committed offset, not from 0
    assert r2.latestOffset() == {"until_ms": 3 * HOUR}
    assert r.latestOffset() == {"until_ms": HOUR}  # fresh start unaffected


def test_backfill_flow_writes_lake_and_resumes(spark, tmp_path):
    """Data source → lake: parallel backfill lands partitioned OHLC with
    manifest rows, and a second run resumes from the watermark."""
    from dl_datalake_spark.client import DataLakeClient
    from dl_datalake_spark.flows import backfill_flow

    client = DataLakeClient(spark, str(tmp_path / "base"))
    first = backfill_flow(
        client, ["BTC_USDT"], timeframe_ms=TF, start_ms=0, end_ms=HOUR
    )
    assert first["BTC_USDT"].rows == 60
    wm = client.manifest.watermark("SYNTH", "BTC_USDT", "raw")
    assert wm == HOUR - TF  # last candle ts

    # resume: no start_ms → watermark + 1; only the second hour arrives
    second = backfill_flow(client, ["BTC_USDT"], timeframe_ms=TF, end_ms=2 * HOUR)
    df = client.read_ohlc("SYNTH", "BTC_USDT")
    assert df.count() == 120
    assert second["BTC_USDT"].rows == 120  # merged dataset size after upsert
    # values match a direct source read (idempotent, deterministic);
    # the lake read adds partition columns — compare the data columns
    cols = ["ts", "open", "high", "low", "close", "volume"]
    src = _reader(spark, symbols="BTC_USDT").drop("symbol")
    assert sorted(df.select(*cols).collect()) == sorted(src.select(*cols).collect())


def test_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Exactly-once across restarts: a second query on the same
    checkpoint picks up at the committed offset — no re-emit of hour 1,
    no gap before hour 2."""
    register_exchange_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")  # file sink: supports checkpoint recovery

    def run(end_ms):
        sdf = (
            spark.readStream.format("exchange_ohlcv")
            .option("symbols", "BTC_USDT")
            .option("timeframe_ms", str(TF))
            .option("start_ms", "0")
            .option("end_ms", str(end_ms))
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(HOUR)
    assert spark.read.parquet(out).count() == 60

    # restart with a wider horizon on the SAME checkpoint: the source
    # offset is committed, so only hour 2 is appended — no re-emit of
    # hour 1, no gap before hour 2
    run(2 * HOUR)
    ts = sorted(r["ts"] for r in spark.read.parquet(out).collect())
    assert len(ts) == 120 and len(set(ts)) == 120
    assert ts[0] == 0 and ts[60] == HOUR and ts[-1] == 2 * HOUR - TF


def test_source_listing_date_and_seed_options(spark):
    """listing_ms bounds history at the source (genesis semantics, the
    probe-listing-date analogue) and seed selects an independent
    deterministic universe."""
    late = _reader(
        spark, symbols="BTC_USDT", listing_ms=HOUR, start_ms=0, end_ms=2 * HOUR
    )
    rows = late.collect()
    assert len(rows) == 60 and min(r["ts"] for r in rows) == HOUR

    a = sorted(_reader(spark, symbols="BTC_USDT", seed=1).collect())
    b = sorted(_reader(spark, symbols="BTC_USDT", seed=2).collect())
    assert a != b  # different universes
    assert sorted(_reader(spark, symbols="BTC_USDT", seed=1).collect()) == a
