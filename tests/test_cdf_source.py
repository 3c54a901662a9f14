"""The `lake_cdf` streaming source (sources/cdf_source.py): offsets are
commit versions, checkpointed restarts continue exactly where they
stopped, and the loud-gap contract fails the stream instead of
silently skipping commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.writer import LakeWriter
from dl_datalake_spark.sources.cdf_source import stream_change_feed

JAN = 1672574400000
KEY = DatasetKey("SIM", "SPOT", "FEED", "ticks", "1m")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ts long, price double")


def _drain(spark, ds_path, out, ckpt):
    q = (
        stream_change_feed(spark, ds_path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"


def test_stream_restart_continues_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: run 1 drains commits 0-1; commits
    2-3 land AFTER; run 2 on the same checkpoint appends exactly the
    new commits' rows — no re-emit, no gap — and the union equals the
    batch feed."""
    base = str(tmp_path / "lake")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    w = LakeWriter(spark, base, emit_cdf=True)
    w.write_ticks(_mk(spark, [(JAN, 1.0), (JAN + 60000, 2.0)]), KEY)       # v0
    w.write_ticks(_mk(spark, [(JAN + 60000, 2.5)]), KEY)                   # v1
    ds = w.dataset_path(KEY)

    _drain(spark, ds, out, ckpt)
    first = spark.read.parquet(out).collect()
    assert {(r["commit_version"], r["ts"]) for r in first} == {
        (0, JAN), (0, JAN + 60000), (1, JAN + 60000)
    }

    w.write_ticks(_mk(spark, [(JAN + 120000, 4.0)]), KEY)                  # v2
    assert w.delete_range(KEY, JAN, JAN).rows == 1                         # v3

    _drain(spark, ds, out, ckpt)
    got = {
        (r["commit_version"], r["ts"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    }
    feed, _ = LakeReader(spark, base).read_change_feed(KEY, after_version=-1)
    want = {
        (r["commit_version"], r["ts"], r["_change_type"]) for r in feed.collect()
    }
    assert got == want  # streaming replay across a restart == batch feed
    assert len(spark.read.parquet(out).collect()) == len(want)  # no dupes


def test_stream_gap_fails_loudly(spark, tmp_path):
    """A commit written WITHOUT emit_cdf inside the planned range must
    fail the stream (planning-time ValueError), never skip silently."""
    base = str(tmp_path / "lake")
    w_cdf = LakeWriter(spark, base, emit_cdf=True)
    w_plain = LakeWriter(spark, base)
    w_cdf.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY)        # v0: has CDF
    w_plain.write_ticks(_mk(spark, [(JAN + 60000, 2.0)]), KEY)  # v1: gap
    ds = w_cdf.dataset_path(KEY)
    q = (
        stream_change_feed(spark, ds)
        .writeStream.format("memory")
        .queryName("cdf_gap_q")
        .trigger(availableNow=True)
        .start()
    )
    # the failed stream surfaces through awaitTermination itself (it
    # re-raises the StreamingQueryException); a timeout or a clean drain
    # raises the non-matching TimeoutError below, failing loudly
    with pytest.raises(Exception, match="no row-level change data"):
        q.awaitTermination(300)
        raise TimeoutError("stream drained or timed out without the gap error")


def test_stream_after_version_skips_history(spark, tmp_path):
    """after_version positions the initial offset: only later commits
    stream; a caught-up feed drains zero rows without error."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    w.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY)            # v0
    w.write_ticks(_mk(spark, [(JAN + 60000, 2.0)]), KEY)    # v1
    ds = w.dataset_path(KEY)
    sdf = stream_change_feed(spark, ds, after_version=0)
    q = (
        sdf.writeStream.format("memory")
        .queryName("cdf_after_q")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    rows = spark.table("cdf_after_q").collect()
    assert {(r["commit_version"], r["ts"]) for r in rows} == {(1, JAN + 60000)}

    caught_up = stream_change_feed(spark, ds, after_version=1)
    q2 = (
        caught_up.writeStream.format("memory")
        .queryName("cdf_caught_q")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300), "stream drain timed out"
    assert spark.table("cdf_caught_q").count() == 0


# ---------------------------------------------------------------------------
# CDF window compaction (maintenance.fold_change_feed)
# ---------------------------------------------------------------------------
def _feed_rows(spark, base, after=-1):
    feed, cursor = LakeReader(spark, base).read_change_feed(KEY, after_version=after)
    if feed is None:
        return [], cursor
    return (
        sorted(
            (r["commit_version"], r["ts"], r["_change_type"], r["price"])
            for r in feed.collect()
        ),
        cursor,
    )


def test_fold_change_feed_preserves_feed_and_drops_files(spark, tmp_path):
    from dl_datalake_spark.lake.maintenance import fold_change_feed

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    for i in range(5):  # 5 commits -> 5 per-commit _cdf dirs
        w.write_ticks(_mk(spark, [(JAN + i * 60000, float(i))]), KEY)
    ds = w.dataset_path(KEY)
    before, cur0 = _feed_rows(spark, base)
    assert len(before) == 5 and cur0 == 4

    rep = fold_change_feed(spark, ds, keep_last_unfolded=1)
    assert rep["folded"] == 4 and rep["segment"].startswith("commit_range=0-3-")
    assert rep["files_after"] < rep["files_before"]

    # feed identical through the fold, cursored reads too
    assert _feed_rows(spark, base) == (before, cur0)
    tail, _ = _feed_rows(spark, base, after=2)
    assert [t[0] for t in tail] == [3, 4]  # version 3 from the range, 4 unfolded

    # the streaming source serves folded versions transparently
    q = (
        stream_change_feed(spark, ds)
        .writeStream.format("memory")
        .queryName("cdf_folded_q")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    got = sorted(
        (r["commit_version"], r["ts"], r["_change_type"], r["price"])
        for r in spark.table("cdf_folded_q").collect()
    )
    assert got == before

    # a second fold merges the range with newly-unfolded commits
    w.write_ticks(_mk(spark, [(JAN + 9 * 60000, 9.0)]), KEY)  # v5
    rep2 = fold_change_feed(spark, ds)
    assert rep2["segment"].startswith("commit_range=0-5-")
    after2, cur2 = _feed_rows(spark, base)
    assert after2 == before + [(5, JAN + 9 * 60000, "insert", 9.0)] and cur2 == 5


def test_fold_keeps_loud_gap_contract(spark, tmp_path):
    """Folding must not paper over a non-CDF commit: the gap error
    survives segment compaction."""
    from dl_datalake_spark.lake.maintenance import fold_change_feed

    base = str(tmp_path / "lake")
    w_cdf = LakeWriter(spark, base, emit_cdf=True)
    w_plain = LakeWriter(spark, base)
    w_cdf.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY)            # v0 cdf
    w_plain.write_ticks(_mk(spark, [(JAN + 60000, 2.0)]), KEY)  # v1 GAP
    w_cdf.write_ticks(_mk(spark, [(JAN + 120000, 3.0)]), KEY)   # v2 cdf
    ds = w_cdf.dataset_path(KEY)
    fold_change_feed(spark, ds)
    with pytest.raises(ValueError, match="no row-level change data"):
        LakeReader(spark, base).read_change_feed(KEY, after_version=-1)


def test_folded_segment_planned_once_not_per_version(spark, tmp_path):
    """ADVICE r7: draining a backlog of N folded commits must read each
    segment FILE once (filtering rows to the planned version set on the
    executor), not once per version — the old per-version planning read
    the whole segment N times, O(N^2) amplification."""
    from dl_datalake_spark.lake.maintenance import fold_change_feed
    from dl_datalake_spark.sources.cdf_source import LakeCDFStreamReader

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    for i in range(6):
        w.write_ticks(_mk(spark, [(JAN + i * 60000, float(i))]), KEY)
    ds = w.dataset_path(KEY)
    fold_change_feed(spark, ds)  # all 6 versions into one ranged segment

    reader = LakeCDFStreamReader({"path": ds}, "ts long, price double, _change_type string")
    parts = reader.partitions({"version": -1}, {"version": 5})
    folded = [p for p in parts if p.filter_version]
    assert folded, "expected folded partitions"
    # total planned file reads == distinct segment files (not versions x files)
    planned = [f for p in folded for f in p.files]
    assert len(planned) == len(set(planned)), planned
    # and every folded partition carries the full version set to filter by
    assert all(sorted(p.versions) == [0, 1, 2, 3, 4, 5] for p in folded)
    # executor-side: reading the partitions yields exactly the feed rows
    rows = [r for p in parts for r in reader.read(p)]
    assert sorted(r[-1] for r in rows) == [0, 1, 2, 3, 4, 5]


def test_stream_over_scheme_prefixed_root(spark, tmp_path):
    """VERDICT r7 #4: the source works when the dataset root is
    scheme-prefixed (file:// exercises the same _Paths branch an
    s3://-style deployment takes — pyarrow fs for planning, URI reads
    on executors). Replay equality: streaming drain == batch feed,
    through a fold as well."""
    from dl_datalake_spark.lake.maintenance import fold_change_feed

    base = f"file://{tmp_path}/lake"
    w = LakeWriter(spark, base, emit_cdf=True)
    for i in range(4):
        w.write_ticks(_mk(spark, [(JAN + i * 60000, float(i))]), KEY)
    ds = w.dataset_path(KEY)
    assert ds.startswith("file://")

    q = (
        stream_change_feed(spark, ds)
        .writeStream.format("memory")
        .queryName("cdf_scheme_q")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    got = sorted(
        (r["commit_version"], r["ts"], r["_change_type"], r["price"])
        for r in spark.table("cdf_scheme_q").collect()
    )
    feed, _ = LakeReader(spark, base).read_change_feed(KEY, after_version=-1)
    want = sorted(
        (r["commit_version"], r["ts"], r["_change_type"], r["price"])
        for r in feed.collect()
    )
    assert got == want and len(got) == 4

    # folded segments too (URI-addressed ranged reads)
    fold_change_feed(spark, ds)
    q2 = (
        stream_change_feed(spark, ds)
        .writeStream.format("memory")
        .queryName("cdf_scheme_q2")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300), "stream drain timed out"
    got2 = sorted(
        (r["commit_version"], r["ts"], r["_change_type"], r["price"])
        for r in spark.table("cdf_scheme_q2").collect()
    )
    assert got2 == want


# ---------------------------------------------------------------------------
# CDF -> IVF streaming maintenance (VERDICT r8 #6): the ANN index follows
# the lake exactly-once
# ---------------------------------------------------------------------------
def _emb_rows(ids, scale=1.0):
    return [
        (JAN + i * 60000, [float(i % 4 == d) * scale + 0.1 * d for d in range(4)])
        for i in ids
    ]


def _index_content(spark, idx):
    from dl_datalake_spark.operators.ivf_index import read_ivf_index

    _, v = read_ivf_index(spark, idx)
    return sorted(
        (r["vec_id"], tuple(round(x, 6) for x in r["embedding"]))
        for r in v.collect()
    )


def test_stream_cdf_into_ivf_follows_lake_exactly_once(spark, tmp_path):
    """Insert/update/delete commits stream into a persisted IVF index;
    the index's content equals a from-scratch rebuild of the live lake
    state; a checkpoint-wipe replay (after a full drain) is skipped by
    the index txn tags — same contract as events_stream_append_once."""
    import shutil

    from dl_datalake_spark.operators.ivf_index import (
        read_ivf_index,
        train_ivf,
        write_ivf_index,
    )
    from dl_datalake_spark.streaming.ingest import stream_cdf_into_ivf

    base = str(tmp_path / "lake")
    idx = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    key = DatasetKey("SIM", "SPOT", "EMB", "ticks", "1m")
    w = LakeWriter(spark, base, emit_cdf=True)
    schema = "ts long, embedding array<double>"
    w.write_ticks(spark.createDataFrame(_emb_rows(range(12)), schema), key)  # v0
    ds = w.dataset_path(key)

    # bootstrap: index trained+built from the v0 snapshot
    reader = LakeReader(spark, base)
    v0 = reader.read_dataset_at(key, 0).select(
        F.col("ts").alias("vec_id"), "embedding"
    )
    cents = train_ivf(v0, num_cells=3, iters=2)
    write_ivf_index(v0, cents, idx)

    # lake evolves: update 3 vectors, insert 2, delete 2
    w.write_ticks(
        spark.createDataFrame(_emb_rows(range(3), scale=5.0), schema), key
    )                                                                       # v1
    w.write_ticks(
        spark.createDataFrame(_emb_rows([20, 21]), schema), key, mode="append"
    )                                                                       # v2
    w.delete_range(key, JAN + 10 * 60000, JAN + 11 * 60000)                 # v3

    q = stream_cdf_into_ivf(
        spark, ds, idx, checkpoint_dir=ckpt, app_id="ivfA",
        id_col="ts", vec_col="embedding", after_version=0,
    )
    assert q.awaitTermination(300), "stream drain timed out"

    # streamed index == from-scratch rebuild of the live state
    live = reader.read_dataset(key).select(F.col("ts").alias("vec_id"), "embedding")
    expected = sorted(
        (r["vec_id"], tuple(round(float(x), 6) for x in r["embedding"]))
        for r in live.collect()
    )
    got = _index_content(spark, idx)
    assert got == expected and len(got) == 12 + 2 - 2

    # checkpoint WIPED after a full drain: replay is skipped by txn tags
    shutil.rmtree(ckpt)
    q2 = stream_cdf_into_ivf(
        spark, ds, idx, checkpoint_dir=ckpt, app_id="ivfA",
        id_col="ts", vec_col="embedding", after_version=0,
    )
    assert q2.awaitTermination(300), "stream drain timed out"
    assert _index_content(spark, idx) == expected
    # the skip is visible in the index log: no new cdf_apply commit
    from dl_datalake_spark.operators.ivf_index import _index_log

    ops = [h.get("op") for h in _index_log(idx, spark).history()]
    assert ops.count("cdf_apply") == 1

    # a FRESH commit after the wipe still flows (new batch id > last txn)
    w.write_ticks(
        spark.createDataFrame(_emb_rows([30]), schema), key, mode="append"
    )                                                                       # v4
    q3 = stream_cdf_into_ivf(
        spark, ds, idx, checkpoint_dir=ckpt, app_id="ivfA",
        id_col="ts", vec_col="embedding", after_version=0,
    )
    assert q3.awaitTermination(300), "stream drain timed out"
    assert len(_index_content(spark, idx)) == 13

    # a cell-CHANGING update must not leave a stale copy: flip one
    # vector to the opposite direction (re-assigns), stream, and the
    # index holds exactly one copy per id (fsck empty)
    from dl_datalake_spark.operators.ivf_index import fsck_ivf_index

    flipped = [(JAN, [-5.0, -0.1, -0.2, -0.3])]
    w.write_ticks(spark.createDataFrame(flipped, schema), key)              # v5
    q4 = stream_cdf_into_ivf(
        spark, ds, idx, checkpoint_dir=ckpt, app_id="ivfA",
        id_col="ts", vec_col="embedding", after_version=0,
    )
    assert q4.awaitTermination(300), "stream drain timed out"
    content = _index_content(spark, idx)
    assert len(content) == 13  # still one copy per id
    assert dict(content)[JAN] == (-5.0, -0.1, -0.2, -0.3)
    assert fsck_ivf_index(spark, idx).count() == 0


def test_apply_cdf_to_ivf_same_commit_update_beats_delete(spark, tmp_path):
    """Same tie as the LSH test: a ts-moving update emits delete +
    update_postimage at ONE commit_version for one vec_id — the live
    image must win deterministically or a live vector silently leaves
    the index."""
    from dl_datalake_spark.operators.ivf_index import (
        apply_cdf_to_ivf,
        train_ivf,
        write_ivf_index,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 3 == d) + 0.1 * d for d in range(3)]) for i in range(9)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    write_ivf_index(vecs, train_ivf(vecs, num_cells=2, iters=2), idx)

    new_emb = [9.0, 9.0, 9.0]
    old = vecs.where(F.col("vec_id") == 4).select(
        "vec_id", "embedding",
        F.lit("delete").alias("_change_type"),
        F.lit(7).cast("long").alias("commit_version"),
    )
    new = spark.createDataFrame([(4, new_emb)], "vec_id long, embedding array<double>").select(
        "vec_id", "embedding",
        F.lit("update_postimage").alias("_change_type"),
        F.lit(7).cast("long").alias("commit_version"),
    )
    apply_cdf_to_ivf(spark, old.unionByName(new), idx)
    got = dict(_index_content(spark, idx))
    assert 4 in got and got[4] == (9.0, 9.0, 9.0)
    assert len(got) == 9


def test_cdf_admission_control_bounds_catchup(spark, tmp_path):
    """max_commits_per_batch on the CDF source: a 6-commit catch-up
    drains in 3 bounded micro-batches under a continuous trigger,
    every row exactly once."""
    import time

    from dl_datalake_spark.sources.cdf_source import stream_change_feed

    base = str(tmp_path / "lake")
    key = DatasetKey("SIM", "SPOT", "ADM", "ticks", "1m")
    w = LakeWriter(spark, base, emit_cdf=True)
    for i in range(6):
        w.write_ticks(
            spark.createDataFrame(
                [(JAN + i * 60000, float(i))], "ts long, price double"
            ),
            key, mode="append",
        )
    ds = w.dataset_path(key)
    rows, batches = [], []

    def _collect(batch_df, bid):
        got = batch_df.collect()
        rows.extend(got)
        vs = sorted({r["commit_version"] for r in got})
        if vs:
            batches.append(vs)

    q = (
        stream_change_feed(spark, ds, max_commits_per_batch=2)
        .writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 300
        while len(rows) < 6 and time.time() < deadline:
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert sorted(r["commit_version"] for r in rows) == list(range(6))
    assert batches == [[0, 1], [2, 3], [4, 5]]
