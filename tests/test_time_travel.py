"""Dataset time travel (Delta ``VERSION AS OF`` on plain parquet).

`CommitLog.files_at` + MVCC tombstones make every committed snapshot
reconstructible until vacuum retention passes; `read_dataset_at` is the
reader surface.  The reference has catalog-snapshot time travel only
(manifest history) — row-level dataset time travel is lake-layer
surface the 100 TB story needs (reproduce yesterday's training run,
audit what a purge removed).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.manifest import ManifestManager
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.writer import LakeWriter

KEY = DatasetKey("BINANCE", "SPOT", "BTC_USDT", "raw", "1m")
T0 = 1672574400000


@pytest.fixture()
def lake(tmp_path, spark):
    base = str(tmp_path / "base")
    manifest = ManifestManager(spark, str(tmp_path / "manifest"))
    return LakeWriter(spark, base, manifest), LakeReader(spark, base), manifest


def _candles(spark, n, start=T0, price=1.0):
    rows = [
        (start + i * 60000, price, price + 1, price - 0.5, price + 0.5, 10.0)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "ts long, open double, high double, low double, close double, volume double",
    )


def test_read_dataset_at_reconstructs_each_version(lake, spark):
    writer, reader, _ = lake
    writer.write_ohlc(_candles(spark, 10), KEY)                      # v0
    writer.write_ohlc(_candles(spark, 5, price=9.0), KEY)            # v1: upsert 5
    writer.delete_where(KEY, F.col("ts") >= T0 + 8 * 60000)          # v2: drop 2

    assert reader.read_dataset_at(KEY, 0).count() == 10
    assert reader.read_dataset_at(KEY, 0).where(F.col("open") == 9.0).count() == 0
    v1 = reader.read_dataset_at(KEY, 1)
    assert v1.count() == 10
    assert v1.where(F.col("open") == 9.0).count() == 5
    v2 = reader.read_dataset_at(KEY, 2)
    assert v2.count() == 8
    # the head snapshot equals the plain read
    assert v2.count() == reader.read_dataset(KEY).count()
    # history names the versions with their modes
    hist = reader.dataset_history(KEY)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["mode"] == "delete"


def test_read_dataset_at_edges(lake, spark):
    writer, reader, _ = lake
    writer.write_ohlc(_candles(spark, 3), KEY)
    assert reader.read_dataset_at(KEY, -1).count() == 0  # before first commit
    with pytest.raises(ValueError, match="does not exist"):
        reader.read_dataset_at(KEY, 5)
    # pruned history is unknowable, not silently served wrong
    writer.write_ohlc(_candles(spark, 2, price=7.0), KEY)
    log = writer.commit_log(KEY)
    log.prune(keep_last=1)
    with pytest.raises(ValueError, match="pruned|predates"):
        reader.read_dataset_at(KEY, 0)
    # head still serves
    assert reader.read_dataset_at(KEY, log.latest_version()).count() == 3


def test_client_time_travel_surface(spark, tmp_path):
    from dl_datalake_spark.client import DataLakeClient

    client = DataLakeClient(spark, str(tmp_path / "lake"))
    client.writer.write_ohlc(_candles(spark, 4), KEY)
    client.writer.write_ohlc(_candles(spark, 2, start=T0 + 10 * 60000), KEY)
    assert client.read_ohlc_at("BINANCE", "BTC_USDT", 0).count() == 4
    assert client.read_ohlc_at("BINANCE", "BTC_USDT", 1).count() == 6
    assert [h["version"] for h in client.dataset_history("BINANCE", "BTC_USDT")] == [0, 1]


def test_vacuumed_snapshot_raises_loudly(lake, spark):
    """A version whose tombstoned files were reclaimed by vacuum must
    raise a clear error, never FILE_NOT_EXIST mid-scan."""
    from dl_datalake_spark.lake.maintenance import vacuum_tombstones

    writer, reader, _ = lake
    writer.write_ohlc(_candles(spark, 4), KEY)                 # v0
    writer.write_ohlc(_candles(spark, 4, price=9.0), KEY)      # v1 rewrites month
    assert reader.read_dataset_at(KEY, 0).count() == 4         # tombstones intact
    vacuum_tombstones(spark, writer.base_path, retention_s=0.0, dry_run=False)
    with pytest.raises(ValueError, match="vacuum"):
        reader.read_dataset_at(KEY, 0)
    # the head is untouched
    assert reader.read_dataset_at(KEY, 1).count() == 4
