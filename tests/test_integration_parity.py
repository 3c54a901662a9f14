"""Integration-parity tests mirroring the reference's no-mock suite
(`tests/integration/`, SURVEY §5.2): concurrent ingestion (test_06),
bad-data rejection leaving no partial catalog state (test_06), and
manifest cold-start across instances (test_03).
"""

from __future__ import annotations

import pytest

from dl_datalake_spark.client import DataLakeClient
from dl_datalake_spark.lake.manifest import ManifestManager
from dl_datalake_spark.sources.csv_source import CsvIngestError
from dl_datalake_spark.sources.download_manager import DownloadManager


def _csv(tmp_path, name, n, start=0):
    p = tmp_path / name
    p.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{start + i*60000},1,2,0.5,1.5,10" for i in range(n))
    )
    return str(p)


def test_concurrent_ingest_two_symbols(spark, tmp_path):
    """Reference test_06: two concurrent ingests land fully and
    independently; the manifest sees both datasets."""
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    a = _csv(tmp_path, "a.csv", 50)
    b = _csv(tmp_path, "b.csv", 70)

    mgr = DownloadManager(connector_factory=lambda ex: client, per_exchange=5)
    ta = mgr.submit("binance", "AAAUSDT", lambda c: c.ingest_csv(a, "binance", "spot", "AAAUSDT").rows)
    tb = mgr.submit("binance", "BBBUSDT", lambda c: c.ingest_csv(b, "binance", "spot", "BBBUSDT").rows)
    assert ta.wait(120) and tb.wait(120)
    assert ta.status == "completed" and tb.status == "completed", (ta.error, tb.error)
    mgr.shutdown()

    assert client.read_ohlc("binance", "AAAUSDT").count() == 50
    assert client.read_ohlc("binance", "BBBUSDT").count() == 70
    assert client.manifest.list_entries(symbol="AAAUSDT").count() >= 1
    assert client.manifest.list_entries(symbol="BBBUSDT").count() >= 1


def test_bad_data_leaves_no_partial_manifest(spark, tmp_path):
    """Reference test_06: a rejected ingest must not leave catalog rows."""
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    bad = tmp_path / "bad.csv"
    bad.write_text("open,high\n1,2\n")  # no ts, wrong arity
    with pytest.raises(CsvIngestError):
        client.ingest_csv(str(bad), "binance", "spot", "XXXUSDT")
    assert client.manifest.list_entries(symbol="XXXUSDT").count() == 0


def test_manifest_cold_start_across_instances(spark, tmp_path):
    """Reference test_03: a fresh ManifestManager over the same path
    sees everything a previous instance wrote."""
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    client.ingest_csv(_csv(tmp_path, "c.csv", 10), "binance", "spot", "BTCUSDT")
    fresh = ManifestManager(spark, str(tmp_path / "lake") + "_manifest")
    entries = fresh.list_entries(symbol="BTCUSDT").collect()
    assert len(entries) >= 1
    assert all(e["time_from"] is not None and e["time_to"] is not None for e in entries)


def test_concurrent_upserts_same_dataset_lose_nothing(spark, tmp_path):
    """Two concurrent upserts into the SAME dataset (disjoint ts ranges)
    must both land — the writer serializes same-dataset merges."""
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    a = _csv(tmp_path, "sa.csv", 40, start=0)
    b = _csv(tmp_path, "sb.csv", 40, start=40 * 60000)

    mgr = DownloadManager(connector_factory=lambda ex: client, per_exchange=5)
    ta = mgr.submit("binance", "SAME", lambda c: c.ingest_csv(a, "binance", "spot", "SAMEUSDT").rows)
    tb = mgr.submit("binance", "SAME", lambda c: c.ingest_csv(b, "binance", "spot", "SAMEUSDT").rows)
    assert ta.wait(120) and tb.wait(120)
    assert ta.status == "completed" and tb.status == "completed", (ta.error, tb.error)
    mgr.shutdown()
    assert client.read_ohlc("binance", "SAMEUSDT").count() == 80


def test_ingest_pipeline_flow(spark, tmp_path):
    """Reference flows.py:107-124: one ingest, two resample aggregates,
    all landing in the lake with manifest rows."""
    from dl_datalake_spark.flows import ingest_pipeline_flow
    from dl_datalake_spark.lake.paths import DatasetKey

    client = DataLakeClient(spark, str(tmp_path / "lake"))
    out = ingest_pipeline_flow(
        client, _csv(tmp_path, "f.csv", 120), "binance", "spot", "BTCUSDT"
    )
    assert out["ingest"].rows == 120
    # 120 minutes → 8× 15m candles and 2× 1h candles
    agg15 = client.reader.read_dataset(DatasetKey("binance", "agg", "BTCUSDT", "agg", "15m"))
    agg1h = client.reader.read_dataset(DatasetKey("binance", "agg", "BTCUSDT", "agg", "1h"))
    assert agg15.count() == 8
    assert agg1h.count() == 2
    assert client.manifest.list_entries(symbol="BTCUSDT", data_type="agg").count() >= 1


def test_missing_root_is_empty_not_half_created(spark, tmp_path):
    """Reference test_13_config analogue: a nonexistent lake root reads
    as an EMPTY dataset (documented graceful behavior — a typo'd symbol
    and a typo'd root look the same to a reader: no matching files),
    must not half-create state, and a corrupt root fails loudly."""
    import os

    import pytest as _pytest

    from dl_datalake_spark.client import DataLakeClient
    from dl_datalake_spark.lake.reader import LakeReader

    missing = str(tmp_path / "never" / "created")
    reader = LakeReader(spark, missing)
    assert reader.read_range("BINANCE", "BTCUSDT", "raw").count() == 0
    assert not os.path.exists(missing)  # read did not create anything

    # client on a fresh root initializes lazily: nothing on disk until a write
    client = DataLakeClient(spark, str(tmp_path / "fresh"))
    assert client.manifest.load().count() == 0
    assert not os.path.exists(client.base_path)

    # corrupt data under the root fails loudly, not silently empty
    bad = tmp_path / "corrupt" / "exchange=B" / "market=S" / "symbol=X" / "data_type=raw" / "period=1m"
    bad.mkdir(parents=True)
    (bad / "junk.parquet").write_bytes(b"not parquet at all")
    r2 = LakeReader(spark, str(tmp_path / "corrupt"))
    with _pytest.raises(Exception):
        r2.read_range("B", "X", "raw").collect()


def test_ingest_pipeline_flow_quality_gate(spark, tmp_path):
    """Expectations gate the flow: a clean ingest reports green; a
    violated fail-mode constraint aborts before aggregates derive."""
    import pytest as _pytest

    from dl_datalake_spark.flows import ingest_pipeline_flow
    from dl_datalake_spark.lake.expectations import (
        ExpectationError,
        accepted_range,
        not_null,
        unique,
    )

    client = DataLakeClient(spark, str(tmp_path / "lake"))
    exps = [not_null("ts"), accepted_range("volume", 0.0, 1e12), unique("ts")]
    out = ingest_pipeline_flow(
        client, _csv(tmp_path, "g.csv", 60), "binance", "spot", "ETHUSDT",
        targets=("1h",), expectations=exps, enforce="report",
    )
    assert all(r["passed"] for r in out["expectations"])

    with _pytest.raises(ExpectationError, match="range_close"):
        ingest_pipeline_flow(
            client, _csv(tmp_path, "h.csv", 60), "binance", "spot", "XRPUSDT",
            targets=("1h",),
            expectations=[accepted_range("close", -1.0, -0.5)],  # impossible
            enforce="fail",
        )
    # the gate fired BEFORE aggregation: no agg dataset for XRPUSDT
    assert client.manifest.list_entries(symbol="XRPUSDT", data_type="agg").count() == 0


def test_full_lake_lifecycle(spark, tmp_path):
    """End-to-end lifecycle chain: ingest → aggregate → audit-clean →
    orphan appears → vacuum reclaims → delete dataset → catalog time
    travel still reconstructs the pre-delete state."""
    import os
    import time

    from dl_datalake_spark.lake.maintenance import audit_lists, vacuum

    base = str(tmp_path / "lake")
    client = DataLakeClient(spark, base)
    client.ingest_csv(_csv(tmp_path, "l1.csv", 120), "binance", "spot", "BTCUSDT")
    client.ingest_csv(_csv(tmp_path, "l2.csv", 60), "binance", "spot", "ETHUSDT")
    client.aggregate_ohlc("binance", "spot", "BTCUSDT", "1m", "1h")
    t_full = int(time.time() * 1_000_000)
    n_entries_full = client.manifest.load().count()
    assert n_entries_full >= 3  # two raw + one agg

    # clean lake: audit reports nothing
    rep = audit_lists(spark, base, client.manifest)
    assert rep["orphan_files"] == [] and rep["dead_links"] == []

    # an uncatalogued directory appears → audit flags it, vacuum
    # dry-run only reports, real vacuum reclaims
    orphan_dir = os.path.join(base, "binance", "spot", "ORPHAN", "raw", "1m")
    os.makedirs(orphan_dir)
    spark.range(5).write.mode("overwrite").parquet(orphan_dir)
    assert audit_lists(spark, base, client.manifest)["orphan_files"] != []
    vacuum(spark, base, client.manifest, dry_run=True)
    assert os.path.exists(orphan_dir)
    vacuum(spark, base, client.manifest, dry_run=False)
    assert not os.path.exists(orphan_dir)
    assert audit_lists(spark, base, client.manifest)["orphan_files"] == []

    # delete a dataset from the catalog; the current view shrinks but
    # time travel reconstructs the pre-delete catalog exactly
    client.manifest.delete_entries(symbol="ETHUSDT")
    assert client.manifest.load().count() < n_entries_full
    past = client.manifest.load_at(t_full)
    assert past.count() == n_entries_full
    assert past.where("symbol = 'ETHUSDT'").count() >= 1


def test_concurrent_ingest_four_symbols_disjoint_staging(spark, tmp_path):
    """Pins the shared-_temporary fix: four concurrent single-dataset
    ingests (disjoint datasets, one lake) must all land — before the
    per-dataset staging change, Hadoop's committer cleanup on the first
    finishing job could delete an in-flight peer's task files under the
    shared <base>/_temporary/0/ tree."""
    client = DataLakeClient(spark, str(tmp_path / "lake4"))
    syms = ["AAAUSDT", "BBBUSDT", "CCCUSDT", "DDDUSDT"]
    csvs = {s: _csv(tmp_path, f"{s}.csv", 40 + i) for i, s in enumerate(syms)}

    mgr = DownloadManager(connector_factory=lambda ex: client, per_exchange=8)
    tasks = {
        s: mgr.submit(
            "binance", s,
            lambda c, path=csvs[s], sym=s: c.ingest_csv(path, "binance", "spot", sym).rows,
        )
        for s in syms
    }
    for s, t in tasks.items():
        assert t.wait(180), s
        assert t.status == "completed", (s, t.error)
    mgr.shutdown()
    for i, s in enumerate(syms):
        assert client.read_ohlc("binance", s).count() == 40 + i
        # and no stray staging left behind in any dataset dir
    import os

    leftovers = [
        os.path.join(r, d)
        for r, dirs, _ in os.walk(str(tmp_path / "lake4"))
        for d in dirs
        if d == "_temporary"
    ]
    assert leftovers == [], leftovers
