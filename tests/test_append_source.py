"""lake_appends streaming source (sources/append_source.py): Delta's
append-file streaming semantics on the commit log — no CDF required."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.writer import LakeWriter
from dl_datalake_spark.sources.append_source import stream_appends

KEY = DatasetKey("SIM", "SPOT", "APP", "ticks", "1m")
T0 = 1672574400000
MONTH = 32 * 86400000


def _ticks(spark, n, start=T0, price=1.0):
    return spark.createDataFrame(
        [(start + i * 60000, price) for i in range(n)], "ts long, price double"
    )


def _drain(spark, ds, ckpt, name=None, rows_out=None, **kw):
    """availableNow drain into a driver-side row list via foreachBatch
    (the memory sink cannot recover from a checkpoint, which the
    resume test needs)."""
    out = rows_out if rows_out is not None else []

    def _collect(batch_df, _bid):
        out.extend(batch_df.collect())

    q = (
        stream_appends(spark, ds, **kw)
        .writeStream.foreachBatch(_collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_appends_drain_equals_batch(tmp_path, spark):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_ticks(spark, 5), KEY, mode="append")                 # v0
    w.write_ticks(_ticks(spark, 3, start=T0 + MONTH), KEY, mode="append")  # v1
    ds = w.dataset_path(KEY)
    got = _drain(spark, ds, str(tmp_path / "ck"))
    assert len(got) == 8
    # per-commit attribution + hive columns served
    assert sum(1 for r in got if r["commit_version"] == 0) == 5
    assert sum(1 for r in got if r["commit_version"] == 1 and r["month"] == 2) == 3
    # resume under the same checkpoint: only NEW commits arrive
    w.write_ticks(_ticks(spark, 2, start=T0 + 2 * MONTH), KEY, mode="append")  # v2
    got2 = _drain(spark, ds, str(tmp_path / "ck"))
    assert len(got2) == 2 and all(r["commit_version"] == 2 for r in got2)


def test_appends_change_commit_raises_by_default(tmp_path, spark):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_ticks(spark, 5), KEY, mode="append")
    w.delete_where(KEY, F.col("ts") == T0)  # CoW rewrite: change commit
    ds = w.dataset_path(KEY)
    with pytest.raises(Exception, match="append-only"):
        _drain(spark, ds, str(tmp_path / "ck"))


def test_appends_dv_commit_is_a_change(tmp_path, spark):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_ticks(spark, 5), KEY, mode="append")
    w.delete_where(KEY, F.col("ts") == T0, strategy="dv")  # listing unchanged!
    ds = w.dataset_path(KEY)
    with pytest.raises(Exception, match="append-only"):
        _drain(spark, ds, str(tmp_path / "ck"))
    # skip_change_commits drops the DV commit, serves the appends
    got = _drain(spark, ds, str(tmp_path / "ck2"), skip_change_commits=True)
    assert len(got) == 5


def test_appends_ignore_changes_serves_added_files(tmp_path, spark):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_ticks(spark, 4), KEY, mode="append")                    # v0
    # upsert rewrites month 1 (change) AND adds rows
    w.write_ticks(_ticks(spark, 2, price=9.0), KEY, mode="upsert")         # v1
    ds = w.dataset_path(KEY)
    got = _drain(spark, ds, str(tmp_path / "ck"), ignore_changes=True)
    # v0's 4 rows + v1's rewritten month (4 rows re-served, 2 updated)
    assert sum(1 for r in got if r["commit_version"] == 0) == 4
    assert sum(1 for r in got if r["commit_version"] == 1) == 4
    assert sum(1 for r in got if r["commit_version"] == 1 and r["price"] == 9.0) == 2


def test_appends_resume_at_pruned_checkpoint_refuses(tmp_path, spark):
    """Resume-after-prune must not fabricate adds: when commit pruning
    leaves a full-listing CHECKPOINT as the oldest retained entry (its
    listing is a snapshot of everything live, not its own adds), a
    consumer resuming just below it must get a loud refusal — not the
    ENTIRE dataset re-served as 'newly appended' rows."""
    from dl_datalake_spark.lake.commitlog import CommitLog
    from dl_datalake_spark.sources.append_source import (
        LakeAppendsStreamReader,
        _infer_append_schema,
    )

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    for i in range(12):  # v0..v11; v10 is a full-files checkpoint
        w.write_ticks(_ticks(spark, 1, start=T0 + i * 60000), KEY, mode="append")
    ds = w.dataset_path(KEY)
    CommitLog(ds, fs=w.fs).prune(keep_last=2)  # retained: v10 (ckpt), v11

    r = LakeAppendsStreamReader({"path": ds}, _infer_append_schema(ds))
    with pytest.raises(ValueError, match="unknowable"):
        r.partitions({"version": 9}, {"version": 11})
    # a consumer that already saw the checkpoint commit replays exactly
    parts = r.partitions({"version": 10}, {"version": 11})
    assert [p.version for p in parts] == [11] and len(parts[0].files) == 1
