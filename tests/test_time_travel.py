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


def test_timestamp_before_pruned_history_raises(lake, spark):
    """TIMESTAMP AS OF before the oldest RETAINED commit on a pruned
    log must raise, not resolve to -1 — the dataset may have existed
    then, and -1 would serve an empty frame as if it never had data
    (Delta raises the same way).  On an UNPRUNED log the same timestamp
    is a true before-first-commit cut: version -1, empty frame."""
    writer, reader, _ = lake
    writer.write_ohlc(_candles(spark, 3), KEY)        # v0
    log = writer.commit_log(KEY)
    t_before = float(log.committed_entry(0)["committed_at"]) - 10.0
    # unpruned: genuinely before the dataset existed
    assert log.version_at_time(t_before) == -1
    assert reader.read_datasets_at_time([KEY], t_before)[KEY.symbol].count() == 0
    writer.write_ohlc(_candles(spark, 2, price=7.0), KEY)  # v1
    log.prune(keep_last=1)
    with pytest.raises(ValueError, match="pruned|predates"):
        log.version_at_time(t_before)
    with pytest.raises(ValueError, match="pruned|predates"):
        reader.read_datasets_at_time([KEY], t_before)
    # timestamps at/after the oldest retained commit still resolve
    head_at = float(log.committed_entry(1)["committed_at"])
    assert log.version_at_time(head_at) == 1


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


def test_restore_dataset_rolls_back_metadata_only(spark, tmp_path):
    """Delta RESTORE parity: after write -> upsert -> delete, restoring
    to version 0 serves exactly v0's rows as the new head WITHOUT
    rewriting data; the rolled-back versions stay time-travelable; CDC
    consumers see the touched months with the delete-aware flag; a
    vacuumed target raises."""
    from dl_datalake_spark.lake.maintenance import vacuum_tombstones
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    base = str(tmp_path / "rlake")
    w = LakeWriter(spark, base)
    r = LakeReader(spark, base)
    key = DatasetKey("SIM", "SPOT", "RST", "ticks", "1m")
    jan = 1672574400000
    w.write_ticks(
        spark.createDataFrame(
            [(jan + i * 60000, float(i)) for i in range(10)], "ts long, price double"
        ),
        key,
    )  # v0
    w.write_ticks(
        spark.createDataFrame([(jan, 99.0)], "ts long, price double"), key
    )  # v1 upsert
    w.delete_range(key, jan, jan + 3 * 60000)  # v2: drop 4 rows
    assert r.read_dataset(key).count() == 6

    res = w.restore_dataset(key, 0)  # v3
    assert res.rows == 10
    got = {x["ts"]: x["price"] for x in r.read_dataset(key).collect()}
    assert len(got) == 10 and got[jan] == 0.0  # v1's overwrite rolled back
    log = w.commit_log(key)
    assert log.history()[-1]["mode"] == "restore"
    assert log.history()[-1]["restored_to"] == 0
    # rolled-back versions still time-travelable
    assert r.read_dataset_at(key, 2).count() == 6
    assert r.read_dataset_at(key, 1).collect() and True
    # CDC: the restore slice touches january and is delete-aware
    cs = r.changes_since(key, 2)
    assert cs.touched == [(2023, 1)] and cs.has_delete
    # restore to the current head is a cdc-noop (no partitions changed)
    res2 = w.restore_dataset(key, 3)
    assert log.history()[-1]["partitions"] == []
    # a vacuumed target raises loudly
    vacuum_tombstones(spark, base, retention_s=0.0, dry_run=False)
    # v2's snapshot excluded some files now reclaimed? the head (v0 set)
    # survives; restoring to a version whose files were reclaimed fails
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no longer restorable|no pinned"):
        w.restore_dataset(key, 1)


def test_restore_emits_synthetic_cdf_or_loud_gap(spark, tmp_path):
    """Round-9 upgrade of the restore/CDF contract: with emit_cdf=True
    the restore EMITS a synthetic head-vs-target diff, so a feed
    consumer folds straight through the restore to the restored state;
    without emit_cdf the documented loud ValueError gap remains."""
    import pytest as _pytest

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    base = str(tmp_path / "clake")
    w = LakeWriter(spark, base, emit_cdf=True)
    key = DatasetKey("SIM", "SPOT", "CRST", "ticks", "1m")
    jan = 1672574400000
    w.write_ticks(
        spark.createDataFrame([(jan, 1.0), (jan + 60000, 2.0)], "ts long, price double"),
        key,
    )  # v0
    w.write_ticks(
        spark.createDataFrame(
            [(jan, 9.0), (jan + 120000, 3.0)], "ts long, price double"
        ),
        key,
    )  # v1: update + insert
    r = LakeReader(spark, base)
    feed, cur = r.read_change_feed(key, after_version=-1)
    assert cur == 1 and feed.count() == 4  # 3 inserts + the upsert postimage

    w.restore_dataset(key, 0)  # v2: synthetic CDF diff
    feed2, cur2 = r.read_change_feed(key, after_version=1)
    assert cur2 == 2
    changes = {
        (x["ts"], x["_change_type"]): x["price"] for x in feed2.collect()
    }
    # the vanished v1 insert is a delete pre-image; v0 rows re-emitted
    assert changes[(jan + 120000, "delete")] == 3.0
    assert changes[(jan, "update_postimage")] == 1.0
    assert changes[(jan + 60000, "update_postimage")] == 2.0
    # folding the feed reproduces the restored state
    upserts = {
        x["ts"]: x["price"]
        for x in feed2.where("_change_type != 'delete'").collect()
    }
    restored = {x["ts"]: x["price"] for x in r.read_dataset(key).collect()}
    assert upserts == restored

    # no emit_cdf: the loud gap stays
    w2 = LakeWriter(spark, base)  # same lake, CDF off
    w2.write_ticks(
        spark.createDataFrame([(jan, 5.0)], "ts long, price double"), key
    )  # v3 (no cdf)
    w2.restore_dataset(key, 2)  # v4 (no cdf)
    with _pytest.raises(ValueError, match="no row-level change data"):
        r.read_change_feed(key, after_version=2)


def test_history_table_reports_null_sizes_past_pruned_history(spark, tmp_path):
    """history_table's snapshot sizes: NULL for retained delta commits
    whose chain base was pruned (unknowable), exact again from the next
    checkpoint on — never a fabricated count."""
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    base = str(tmp_path / "hlake")
    w = LakeWriter(spark, base)
    key = DatasetKey("SIM", "SPOT", "HPR", "ticks", "1m")
    jan = 1672574400000
    for i in range(13):  # past the 10-version checkpoint cadence
        w.write_ticks(
            spark.createDataFrame(
                [(jan + (100 + i) * 60000, float(i))], "ts long, price double"
            ),
            key,
            mode="append",
        )
    log = w.commit_log(key)
    log.prune(keep_last=5)
    hist = LakeReader(spark, base).history_table(key).orderBy("version").collect()
    assert len(hist) >= 5
    sizes = {r["version"]: r["n_files"] for r in hist}
    # versions from the retained checkpoint (v10) onward are exact
    assert sizes[12] == 13 and sizes[10] == 11
    # any retained pre-checkpoint delta rows report NULL, never a guess
    for v, n in sizes.items():
        assert n is None or n == v + 1
