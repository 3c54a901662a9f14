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


def ingest_pipeline_flow(
    client: DataLakeClient,
    csv_path: str,
    exchange: str,
    market: str,
    symbol: str,
    targets: tuple[str, ...] = ("15m", "1h"),
) -> dict:
    """CSV → lake → resampled aggregates (flows.py:107-124: ingest once,
    aggregate to 15min and 1h)."""
    ingest = client.ingest_csv(csv_path, exchange, market, symbol)
    aggs = {}
    for tf in targets:
        aggs[tf] = aggregate_ohlc_flow(client, exchange, market, symbol, "1m", tf)
    return {"ingest": ingest, "aggregates": aggs}


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


def daily_offload_flow(client: DataLakeClient) -> None:
    """The reference's compaction placeholder (flows.py:127-130) made
    real: partition-preserving small-file compaction."""
    from dl_datalake_spark.lake.maintenance import compact

    compact(client.spark, client.base_path)
