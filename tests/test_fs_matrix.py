"""Object-store matrix (VERDICT r8 #7): the read-modify-delete
maintenance sequences — MultiCommitLog.fold, vacuum_tombstones,
restore_dataset — exercised over every Filesystem family the lake
deploys on:

- LocalFS            (POSIX: fully atomic primitives)
- HadoopFS(file://)  (the JVM path an s3a://gs:// base takes, minus the store)
- S3LikeFS           (ConditionalConsumeFS x LocalFS with a deliberately
                      NON-atomic copy+delete rename — the S3 emulation the
                      fence CAS suite uses, tests/test_commitlog.py)

Each case builds its lake through the normal LakeWriter so the
maintenance runs over real commit/multilog state, not fabricated files.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.fs import ConditionalConsumeFS, LocalFS, get_fs
from dl_datalake_spark.lake.multilog import MultiCommitLog
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.writer import LakeWriter

JAN = 1672574400000
KEY = DatasetKey("SIM", "SPOT", "MTX", "raw", "1m")


class S3LikeFS(ConditionalConsumeFS, LocalFS):
    """LocalFS with S3's copy+delete rename (non-atomic); the
    conditional-CAS mixin supplies consume_rename's one-winner rule."""

    ATOMIC_RENAME = False

    def rename(self, src: str, dst: str) -> None:
        data = self.read_bytes(src)
        self.write_bytes_atomic(dst, data)
        try:
            self.remove(src)
        except OSError:
            pass


def _variants():
    return ["local", "hadoop_file", "s3like"]


def _make(variant, tmp_path, spark):
    """(base_path, fs) for the variant."""
    if variant == "local":
        base = str(tmp_path / "lake")
        return base, LocalFS()
    if variant == "hadoop_file":
        base = f"file://{tmp_path}/lake"
        return base, get_fs(base, spark)
    base = str(tmp_path / "lake")
    return base, S3LikeFS()


def _candles(spark, n, start=JAN, price=1.0):
    rows = [
        (start + i * 60000, price, price + 1, price - 0.5, price + 0.5, 10.0)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "ts long, open double, high double, low double, close double, volume double",
    )


def _multi(spark, n=2, price=1.0):
    rows = [
        (sym, JAN + i * 60000, price, price + 1, price - 0.5, price + 0.5, 10.0)
        for sym in ("AAA/USD", "BBB/USD")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, ts long, open double, high double, low double, "
        "close double, volume double",
    )


@pytest.mark.parametrize("variant", _variants())
def test_multilog_fold_over_fs_matrix(variant, tmp_path, spark):
    """fold() merges resolved intents into one segment and deletes the
    live files it absorbed — a listing+write+delete sequence that must
    behave identically on every backend (incl. non-atomic rename)."""
    base, fs = _make(variant, tmp_path, spark)
    w = LakeWriter(spark, base, fs=fs)
    w.write_ohlc_multi(_multi(spark, n=1), "sim", "spot")
    ml = MultiCommitLog(base, fs=fs)
    # fabricate additional resolved, fold-eligible records
    old = time.time() - 7200
    for i in range(6):
        txid = f"mtx{i:04d}" + "0" * 24
        ml.begin({"ds/a": i + 1, "ds/b": i + 1}, txid=txid)
        ml.commit(txid)
        import json

        rec = json.loads(fs.read_bytes(ml._path(txid)))
        rec["ts"] = old
        fs.write_bytes_atomic(ml._path(txid), json.dumps(rec).encode())
    rep = ml.fold(keep_last=0, ttl_s=3600.0)
    assert rep["folded"] >= 6 and rep["segment"]
    # every folded record still resolvable; live files gone
    for i in range(6):
        txid = f"mtx{i:04d}" + "0" * 24
        assert ml.record(txid)["status"] == "committed"
        assert not fs.exists(ml._path(txid))
    # second fold with nothing new: no-op, still one segment
    rep2 = ml.fold(keep_last=0, ttl_s=3600.0)
    assert rep2["folded"] == 0
    recs = ml.records()
    assert sum(1 for r in recs if r["txid"].startswith("mtx")) == 6


@pytest.mark.parametrize("variant", _variants())
def test_vacuum_tombstones_over_fs_matrix(variant, tmp_path, spark):
    """vacuum's supersession-aged delete sweep: upsert tombstones the
    replaced files; retention 0 reclaims exactly them; live data and
    reads survive on every backend."""
    from dl_datalake_spark.lake.maintenance import vacuum_tombstones

    base, fs = _make(variant, tmp_path, spark)
    w = LakeWriter(spark, base, fs=fs)
    w.write_ohlc(_candles(spark, 6), KEY)                    # v0
    w.write_ohlc(_candles(spark, 6, price=9.0), KEY)         # v1 rewrites the month
    reader = LakeReader(spark, base)
    assert reader.read_dataset(KEY).count() == 6

    rep = vacuum_tombstones(spark, base, retention_s=3600.0, dry_run=False, fs=fs)
    assert rep["removed"] == [] and rep["retained"]          # inside horizon
    rep2 = vacuum_tombstones(spark, base, retention_s=0.0, dry_run=False, fs=fs)
    assert rep2["removed"]
    live = set(w.commit_log(KEY).latest_files())
    assert all(f.rsplit("/", 1)[-1] not in live for f in rep2["removed"])
    got = reader.read_dataset(KEY)
    assert got.count() == 6
    assert {r["open"] for r in got.collect()} == {9.0}
    # vacuumed history raises loudly, head still serves
    with pytest.raises(ValueError, match="vacuum"):
        reader.read_dataset_at(KEY, 0)
    assert reader.read_dataset_at(KEY, 1).count() == 6


@pytest.mark.parametrize("variant", _variants())
def test_restore_dataset_over_fs_matrix(variant, tmp_path, spark):
    """restore_dataset's resolve-verify-repin sequence (files_at +
    per-file existence probes + commit) on every backend; rolled-back
    epochs stay time-travelable."""
    base, fs = _make(variant, tmp_path, spark)
    w = LakeWriter(spark, base, fs=fs)
    w.write_ohlc(_candles(spark, 4), KEY)                    # v0
    w.write_ohlc(_candles(spark, 2, price=7.0), KEY)         # v1 upsert
    w.delete_range(KEY, JAN + 3 * 60000, JAN + 3 * 60000)    # v2
    reader = LakeReader(spark, base)
    assert reader.read_dataset(KEY).count() == 3

    res = w.restore_dataset(KEY, 0)
    assert res.rows == 4
    got = reader.read_dataset(KEY)
    assert got.count() == 4
    assert {r["open"] for r in got.collect()} == {1.0}
    # the rolled-back epoch is still readable; history names the restore
    assert reader.read_dataset_at(KEY, 2).count() == 3
    hist = w.commit_log(KEY).history()
    assert hist[-1]["mode"] == "restore" and hist[-1]["restored_to"] == 0
