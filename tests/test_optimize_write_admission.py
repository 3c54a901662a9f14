"""Round-11: write-time auto-compaction (Delta's optimizeWrite) and
byte-based streaming admission (Delta's maxBytesPerTrigger).

- `LakeWriter(optimize_write=True)` bin-packs APPEND output so each
  touched partition gets ceil(rows / target_file_rows) files instead
  of one small file per upstream task — streaming micro-batches stop
  accreting small files between `maintain` runs.
- Commits record per-added-file byte sizes (`file_bytes`) and the CDF
  delta size (`cdf_bytes`); `max_bytes_per_batch` on lake_appends /
  lake_cdf budgets a catch-up from the commit log alone (no per-poll
  file listing), falling back to the count caps for commits that
  predate size recording.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.writer import LakeWriter
from dl_datalake_spark.sources.append_source import stream_appends
from dl_datalake_spark.sources.cdf_source import stream_change_feed

JAN = 1672574400000
FEB = 1675252800000
KEY = DatasetKey("SIM", "SPOT", "OPW", "ticks", "1m")


def _wide_batch(spark, n_per_month=200, parts=16):
    df = spark.range(n_per_month).select(
        (F.lit(JAN) + F.col("id") * 60000).cast("long").alias("ts"),
        F.col("id").cast("double").alias("price"),
    ).unionAll(
        spark.range(n_per_month).select(
            (F.lit(FEB) + F.col("id") * 60000).cast("long").alias("ts"),
            (F.col("id") + 1000).cast("double").alias("price"),
        )
    )
    return df.repartition(parts)


def _month_files(log):
    files = log.latest_files()
    out: dict[str, int] = {}
    for f in files:
        m = f.rsplit("/", 1)[0]
        out[m] = out.get(m, 0) + 1
    return out


def test_optimize_write_collapses_small_files(spark, tmp_path):
    base_plain = str(tmp_path / "plain")
    base_opt = str(tmp_path / "opt")
    batch = _wide_batch(spark)
    LakeWriter(spark, base_plain).write_ticks(batch, KEY, mode="append")
    LakeWriter(spark, base_opt, optimize_write=True).write_ticks(
        batch, KEY, mode="append"
    )
    plain = _month_files(LakeWriter(spark, base_plain).commit_log(KEY))
    opt = _month_files(LakeWriter(spark, base_opt).commit_log(KEY))
    # 16 upstream tasks spray ~16 files per month; optimizeWrite packs
    # each month into ONE file at this size
    assert all(n > 4 for n in plain.values())
    assert all(n == 1 for n in opt.values())
    # identical contents
    a = LakeReader(spark, base_plain).read_dataset(KEY)
    b = LakeReader(spark, base_opt).read_dataset(KEY)
    assert a.count() == b.count() == 400
    assert a.agg(F.sum("price")).first()[0] == b.agg(F.sum("price")).first()[0]


def test_optimize_write_splits_oversized_partitions(spark, tmp_path):
    base = str(tmp_path / "opt2")
    w = LakeWriter(spark, base, optimize_write=True, target_file_rows=100)
    df = spark.range(250).select(
        (F.lit(JAN) + F.col("id") * 60000).cast("long").alias("ts"),
        F.col("id").cast("double").alias("price"),
    )
    w.write_ticks(df, KEY, mode="append")
    files = _month_files(w.commit_log(KEY))
    assert sum(files.values()) == 3  # ceil(250/100)
    assert LakeReader(spark, base).read_dataset(KEY).count() == 250


def test_commit_records_file_and_cdf_bytes(spark, tmp_path):
    base = str(tmp_path / "bytes")
    w = LakeWriter(spark, base, emit_cdf=True)
    w.write_ticks(
        spark.createDataFrame([(JAN, 1.0)], "ts long, price double"), KEY
    )
    log = w.commit_log(KEY)
    e = log.committed_entry(0)
    fb = e.get("file_bytes")
    assert fb and all(
        v == w.fs.getsize(f"{w.dataset_path(KEY)}/{rel}") for rel, v in fb.items()
    )
    assert int(e.get("cdf_bytes") or 0) > 0


def _drain_bounded(spark, stream_df, ckpt, expected_rows, timeout_s=180):
    import os

    rows, batches, bids = [], [], []

    def _c(batch_df, bid):
        got = batch_df.collect()
        rows.extend(got)
        vs = sorted({r["commit_version"] for r in got})
        if vs:
            batches.append(vs)
            bids.append(bid)

    q = (
        stream_df.writeStream.foreachBatch(_c)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + timeout_s
        while len(rows) < expected_rows and time.time() < deadline:
            time.sleep(0.3)
        # wait for the last delivering batch's checkpoint commit
        # (foreachBatch is at-least-once; see test_append_source)
        while (
            bids
            and not os.path.exists(f"{ckpt}/commits/{max(bids)}")
            and time.time() < deadline
        ):
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(60)
    return rows, batches


def test_append_stream_max_bytes_per_batch(spark, tmp_path):
    """Mixed huge/tiny commits drain in byte-bounded batches: the big
    commit fills a batch alone, the tiny ones share the next."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, optimize_write=True)
    big = spark.range(5000).select(
        (F.lit(JAN) + F.col("id") * 60000).cast("long").alias("ts"),
        F.rand(1).alias("price"),
    )
    w.write_ticks(big, KEY, mode="append")  # v0: one big file
    for i in range(3):  # v1..v3: tiny commits
        w.write_ticks(
            spark.createDataFrame(
                [(FEB + i * 60000, float(i))], "ts long, price double"
            ),
            KEY, mode="append",
        )
    log = w.commit_log(KEY)
    big_bytes = sum((log.committed_entry(0).get("file_bytes") or {}).values())
    assert big_bytes > 0
    rows, batches = _drain_bounded(
        spark,
        stream_appends(spark, w.dataset_path(KEY), max_bytes_per_batch=big_bytes),
        str(tmp_path / "ck"),
        5003,
    )
    assert len(rows) == 5003  # nothing lost or duplicated
    assert batches[0] == [0]  # the big commit exhausted the budget alone
    assert batches[1] == [1, 2, 3]  # the tiny ones fit one budget together


def test_cdf_stream_max_bytes_per_batch(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True, optimize_write=True)
    big = spark.range(5000).select(
        (F.lit(JAN) + F.col("id") * 60000).cast("long").alias("ts"),
        F.rand(1).alias("price"),
    )
    w.write_ticks(big, KEY, mode="append")
    for i in range(3):
        w.write_ticks(
            spark.createDataFrame(
                [(FEB + i * 60000, float(i))], "ts long, price double"
            ),
            KEY, mode="append",
        )
    log = w.commit_log(KEY)
    big_cdf = int(log.committed_entry(0).get("cdf_bytes") or 0)
    assert big_cdf > 0
    rows, batches = _drain_bounded(
        spark,
        stream_change_feed(spark, w.dataset_path(KEY), max_bytes_per_batch=big_cdf),
        str(tmp_path / "ck2"),
        5003,
    )
    assert len(rows) == 5003
    assert batches[0] == [0]
    assert batches[1] == [1, 2, 3]
