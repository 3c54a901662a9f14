"""Plain-Python flow functions (reference `orchestration/flows.py`).

The reference wraps these in Prefect @task/@flow; its own docs call the
orchestrator swappable (README §6.3), so here they are orchestrator-
agnostic callables any scheduler (Airflow/Prefect/cron) can wrap. Each
step is share-nothing — reader/writer/manifest state lives in the
client, steps coordinate only through the lake — exactly the
reference's task model (flows.py:47-49).

Fixes ported-around bug §7.5-1: the reference iterates `(path, tmin,
tmax)` tuples and passes the whole tuple as `path` to add_entry
(flows.py:94-104); here write results are typed (WriteResult) and the
writer registers manifest rows itself.
"""

from __future__ import annotations

from dl_datalake_spark.client import DataLakeClient
from dl_datalake_spark.lake.paths import DatasetKey


def ingest_pipeline_flow(
    client: DataLakeClient,
    csv_path: str,
    exchange: str,
    market: str,
    symbol: str,
    targets: tuple[str, ...] = ("15m", "1h"),
    expectations: list | None = None,
    enforce: str = "report",
) -> dict:
    """CSV → lake → [quality gate] → resampled aggregates
    (flows.py:107-124: ingest once, aggregate to 15min and 1h).

    `expectations` (lake/expectations.py constraints) are evaluated on
    the just-written dataset BEFORE any aggregate is derived, so under
    enforce="fail" a bad ingest never propagates downstream — the
    declarative version of the reference's imperative CSV shape checks.
    """
    ingest = client.ingest_csv(csv_path, exchange, market, symbol)
    result: dict = {"ingest": ingest}
    if expectations:
        from dl_datalake_spark.lake.expectations import check

        # read back through the snapshot-aware reader (a raw path read
        # would include MVCC tombstones from earlier ingests)
        just_written = client.reader.read_dataset(
            DatasetKey(exchange, market, symbol, "raw", "1m")
        )
        checked = check(just_written, expectations, enforce=enforce)
        if enforce == "quarantine":
            # check() returns (good, bad, report) in quarantine mode;
            # surface the split so callers can route the bad rows.
            good, bad, report = checked
            result["quarantined"] = bad.count()
            result["good_rows"] = good.count()
        else:
            report = checked
        result["expectations"] = [r.asDict() for r in report.collect()]
    aggs = {}
    for tf in targets:
        aggs[tf] = aggregate_ohlc_flow(client, exchange, market, symbol, "1m", tf)
    result["aggregates"] = aggs
    return result


def aggregate_ohlc_flow(
    client: DataLakeClient,
    exchange: str,
    market: str,
    symbol: str,
    source_period: str,
    target_period: str,
):
    """One resample task (flows.py:31-104): read raw, window-aggregate
    with deterministic first/last, write to the agg dataset + manifest."""
    return client.aggregate_ohlc(exchange, market, symbol, source_period, target_period)


def refresh_rollup_flow(
    client: DataLakeClient,
    exchange: str,
    market: str,
    symbol: str,
    source_period: str = "1m",
    targets: tuple[str, ...] = ("15m", "1h"),
) -> dict:
    """Continuous-aggregate refresh: bring each target rollup up to
    date incrementally (only raw data at/after each rollup's watermark
    is re-read — the scheduled-flow shape for a 100 TB lake, vs the
    reference's full re-read per run, flows.py:52-62)."""
    return {
        tf: client.refresh_rollup(exchange, market, symbol, source_period, tf)
        for tf in targets
    }


def backfill_flow(
    client: DataLakeClient,
    symbols: list[str],
    timeframe_ms: int = 60_000,
    start_ms: int | None = None,
    end_ms: int | None = None,
    exchange: str = "SYNTH",
    market: str = "SPOT",
    period: str = "1m",
    source_options: dict | None = None,
) -> dict:
    """Parallel history backfill through the Python Data Source.

    The reference backfills with a serial driver loop per symbol
    (exchange_connector.py:201-308). Here each symbol's history arrives
    via ``format("exchange_ohlcv")`` — page fetching fans out across
    executors, and `pushFilters` prunes the fetch window per symbol at
    the source. Resume comes from the manifest watermark, same T1
    semantics as the REST connector.
    """
    import time as _time

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.sources.spark_datasource import register_exchange_source

    register_exchange_source(client.spark)
    end_ms = end_ms if end_ms is not None else int(_time.time() * 1000)
    written = {}
    for sym in symbols:
        key = DatasetKey(exchange, market, sym, "raw", period)
        since = start_ms
        if since is None:
            wm = client.manifest.watermark(exchange, sym, "raw")
            since = (wm + 1) if wm is not None else 0
        opts = {
            "symbols": sym,
            "timeframe_ms": str(timeframe_ms),
            "start_ms": str(since),
            "end_ms": str(end_ms),
        }
        opts.update({k: str(v) for k, v in (source_options or {}).items()})
        candles = (
            client.spark.read.format("exchange_ohlcv").options(**opts).load().drop("symbol")
        )
        written[sym] = client.writer.write_ohlc(candles, key)
    return written


def daily_offload_flow(client: DataLakeClient) -> None:
    """The reference's compaction placeholder (flows.py:127-130) made
    real: partition-preserving small-file compaction."""
    from dl_datalake_spark.lake.maintenance import compact

    compact(client.spark, client.base_path)
