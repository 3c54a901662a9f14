"""Reader range semantics + manifest CRUD/versioning/watermark —
mirrors reference tests/storage/test_reader.py and
tests/metadata/test_manifest.py intents."""

from __future__ import annotations

import pytest

from dl_datalake_spark.lake import LakeReader, LakeWriter, ManifestManager
from dl_datalake_spark.lake.paths import DatasetKey

KEY = DatasetKey("binance", "spot", "BTCUSDT", "raw", "1m")


@pytest.fixture()
def lake(tmp_path, spark):
    base = str(tmp_path / "base")
    manifest = ManifestManager(spark, str(tmp_path / "manifest"))
    return LakeWriter(spark, base, manifest), LakeReader(spark, base), manifest


def test_read_range_inclusive_bounds(lake, ohlc_df):
    writer, reader, _ = lake
    writer.write_ohlc(ohlc_df, KEY)
    # full day window
    got = reader.read_range("binance", "BTCUSDT", "raw", "2023-01-01", "2023-01-02")
    assert got.count() == 100
    # window covering exactly the first 10 candles (inclusive both ends)
    got = reader.read_range(
        "binance", "BTCUSDT", "raw", "2023-01-01T12:00:00", "2023-01-01T12:09:00"
    )
    ts = [r["ts"] for r in got.collect()]
    assert len(ts) == 10
    assert ts == sorted(ts)


def test_read_range_empty(lake, ohlc_df):
    writer, reader, _ = lake
    writer.write_ohlc(ohlc_df, KEY)
    got = reader.read_range("binance", "BTCUSDT", "raw", "2024-01-01", "2024-01-02")
    assert got.count() == 0


def test_list_symbols(lake, ohlc_df):
    writer, reader, _ = lake
    writer.write_ohlc(ohlc_df, KEY)
    writer.write_ohlc(ohlc_df, DatasetKey("binance", "spot", "ETH/USDT"))
    assert reader.list_symbols("binance") == ["BTC_USDT", "ETHUSDT"] or reader.list_symbols(
        "binance"
    ) == ["BTCUSDT", "ETH_USDT"]


def test_preview_pagination(lake, ohlc_df):
    writer, reader, _ = lake
    writer.write_ohlc(ohlc_df, KEY)
    df = reader.read_dataset(KEY).orderBy("ts")
    total, page = reader.preview(df, offset=10, limit=5)
    assert total == 100
    ts = [r["ts"] for r in page.collect()]
    assert len(ts) == 5
    assert ts[0] == 1672574400000 + 10 * 60000


def test_manifest_crud_and_latest_version(spark, tmp_path):
    m = ManifestManager(spark, str(tmp_path / "m"))
    for v in ("1", "2", "10"):
        m.add_entry("binance", "spot", "BTCUSDT", f"/lake/p{v}", "raw", 0, 1000, version=v)
    assert m.list_entries(symbol="BTCUSDT").count() == 3
    # numeric versions sort numerically (reference int-cast fast path)
    assert m.get_latest_version("BTCUSDT", "raw") == "10"
    # semver does not crash (reference bug — SURVEY §7.5)
    m.add_entry("binance", "spot", "ETHUSDT", "/lake/e1", "raw", 0, 1000, version="1.0.0")
    m.add_entry("binance", "spot", "ETHUSDT", "/lake/e2", "raw", 0, 1000, version="1.2.0")
    assert m.get_latest_version("ETHUSDT", "raw") == "1.2.0"


def test_manifest_path_upsert_and_delete(spark, tmp_path):
    m = ManifestManager(spark, str(tmp_path / "m"))
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/p1", "raw", 0, 1000)
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/p1", "raw", 0, 2000)  # upsert same path
    entries = m.list_entries(symbol="BTCUSDT").collect()
    assert len(entries) == 1
    assert entries[0]["time_to"] == 2000
    assert m.delete_entries(symbol="BTCUSDT") == 1
    assert m.list_entries().count() == 0


def test_manifest_watermark(spark, tmp_path):
    m = ManifestManager(spark, str(tmp_path / "m"))
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/p1", "raw", 0, 1000)
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/p2", "raw", 1001, 5000)
    assert m.watermark("binance", "BTCUSDT") == 5000
    assert m.watermark("binance", "NOPE") is None


def test_manifest_timeframe_json_filter(spark, tmp_path):
    m = ManifestManager(spark, str(tmp_path / "m"))
    m.add_entry(
        "binance", "spot", "BTCUSDT", "/lake/a", "raw", 0, 1000,
        metadata={"timeframe": "1m"},
    )
    m.add_entry(
        "binance", "spot", "BTCUSDT", "/lake/b", "agg", 0, 1000,
        metadata={"timeframe": "15m"},
    )
    assert m.list_entries(timeframe="15m").count() == 1
    assert m.list_entries(timeframe="15m").first()["path"] == "/lake/b"
    assert m.list_entries(timeframe="1h").count() == 0


def test_manifest_time_travel(spark, tmp_path):
    """Snapshot log: load_at reconstructs any committed catalog state;
    the upsert that replaced a path is invisible at the earlier
    snapshot; prune_history keeps the newest states readable."""
    import time

    m = ManifestManager(spark, str(tmp_path / "m"))
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/a", "raw", 0, 1000, version="1")
    t_after_first = int(time.time() * 1_000_000)
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/a", "raw", 0, 2000, version="2")
    m.add_entry("binance", "spot", "ETHUSDT", "/lake/b", "raw", 0, 500, version="1")

    snaps = m.snapshots()
    assert len(snaps) == 3 and snaps == sorted(snaps)

    old = m.load_at(t_after_first)
    assert old.count() == 1
    row = old.collect()[0]
    assert (row["version"], row["time_to"]) == ("1", 1000)

    # "now" sees the current catalog: upserted path + second symbol
    now = m.load_at(int(time.time() * 1_000_000))
    assert now.count() == 2
    assert {r["version"] for r in now.where("path = '/lake/a'").collect()} == {"2"}
    # pre-history instant → empty catalog
    assert m.load_at(snaps[0] - 1).count() == 0

    removed = m.prune_history(keep_last=2)
    assert removed == 1 and len(m.snapshots()) == 2
    # the pruned snapshot is gone; the retained ones still reconstruct
    assert m.load_at(t_after_first).count() == 0  # earliest state pruned away
    assert m.load_at(int(time.time() * 1_000_000)).count() == 2

    # keep_history=False: no log side effects
    m2 = ManifestManager(spark, str(tmp_path / "m2"), keep_history=False)
    m2.add_entry("binance", "spot", "BTCUSDT", "/lake/z", "raw", 0, 10, version="1")
    assert m2.snapshots() == []
