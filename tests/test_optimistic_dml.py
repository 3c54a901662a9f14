"""Partition-disjoint optimistic DML (VERDICT r11 #1): delete_where /
update_where / merge_into / compact_partitions run their Spark jobs
OUTSIDE the commit claim and validate under a milliseconds window —
Delta's ConcurrentDeleteRead/ConcurrentAppend model extended from blind
appends (round 11) to copy-on-write DML, so a long GDPR purge or
compaction never re-serializes concurrent appenders.

Reference contrast: the reference has no row-level DML at all (its only
delete is whole-dataset manifest removal, dl-datalake manifest.py); all
concurrency there is a single SQLite file lock."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.commitlog import CommitLog, ConcurrentWriteConflict
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.snapshot import (
    list_data_files,
    partition_of,
    resolve_live_files,
)
from dl_datalake_spark.lake.writer import LakeWriter

JAN = 1672574400000
FEB = 1675252800000
MAR = 1677672000000
KEY = DatasetKey("SIM", "SPOT", "ODML", "ticks", "1m")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ts long, price double")


def _seed(spark, base, **writer_kw):
    w = LakeWriter(spark, base, **writer_kw)
    w.write_ticks(
        _mk(spark, [(JAN + i * 60000, float(i)) for i in range(10)]),
        KEY, mode="append",
    )
    w.write_ticks(
        _mk(spark, [(FEB + i * 60000, 100.0 + i) for i in range(10)]),
        KEY, mode="append",
    )
    return w


def _rows(spark, base):
    return sorted(
        (r["ts"], r["price"])
        for r in LakeReader(spark, base).read_dataset(KEY)
        .select("ts", "price").collect()
    )


def _race_once(w, action):
    """Patch CommitLog.latest_version so the FIRST head read on this
    dataset (the optimistic snapshot capture) triggers `action` — a
    commit that lands between the snapshot and the claim."""
    orig = CommitLog.latest_version
    raced = {"done": False}

    def hook(self_):
        v = orig(self_)
        if not raced["done"] and self_.dataset_path == w.dataset_path(KEY):
            raced["done"] = True
            action()
        return v

    CommitLog.latest_version = hook
    return lambda: setattr(CommitLog, "latest_version", orig)


# -- equivalence with the claimed paths ----------------------------------


def test_optimistic_delete_matches_claimed(spark, tmp_path):
    a = _seed(spark, str(tmp_path / "claimed"))
    b = _seed(spark, str(tmp_path / "optimistic"))
    ra = a.delete_where(KEY, "price < 3 OR price > 107")
    rb = b.delete_where(KEY, "price < 3 OR price > 107", optimistic=True)
    assert (ra.rows, ra.partitions) == (rb.rows, rb.partitions) == (5, [[2023, 1], [2023, 2]])
    assert _rows(spark, str(tmp_path / "claimed")) == _rows(
        spark, str(tmp_path / "optimistic")
    )
    # the optimistic commit is a rebasable DELTA, not a full listing
    e = b.commit_log(KEY).committed_entry(b.commit_log(KEY).latest_version())
    assert e["mode"] == "delete" and e.get("optimistic") is True
    assert "files_add" in e and "files_remove" in e and "files" not in e
    # no-match delete commits nothing on either path
    v = b.commit_log(KEY).latest_version()
    assert b.delete_where(KEY, "price > 1e9", optimistic=True).rows == 0
    assert b.commit_log(KEY).latest_version() == v


def test_optimistic_update_matches_claimed_including_ts_move(spark, tmp_path):
    a = _seed(spark, str(tmp_path / "claimed"))
    b = _seed(spark, str(tmp_path / "optimistic"))
    sets = {"price": "price * 2", "ts": "ts + 2678400000"}  # moves Jan->Feb
    ra = a.update_where(KEY, sets, "price = 5")
    rb = b.update_where(KEY, sets, "price = 5", optimistic=True)
    assert ra.rows == rb.rows == 1
    assert _rows(spark, str(tmp_path / "claimed")) == _rows(
        spark, str(tmp_path / "optimistic")
    )
    # destination month shows up in the commit's partitions either way
    for w in (a, b):
        e = w.commit_log(KEY).committed_entry(w.commit_log(KEY).latest_version())
        assert e["partitions"] == [[2023, 1], [2023, 2]]


def test_optimistic_merge_matches_claimed(spark, tmp_path):
    a = _seed(spark, str(tmp_path / "claimed"))
    b = _seed(spark, str(tmp_path / "optimistic"))
    for w, opt in ((a, False), (b, True)):
        src = _mk(
            w.spark,
            [(JAN + 2 * 60000, 222.0), (JAN + 3 * 60000, -1.0),
             (JAN + 99 * 60000, 9.0)],
        )
        res = w.merge_into(
            KEY, src, on="ts",
            when_matched_update="*",
            when_matched_delete="s.price < 0",
            when_not_matched_insert=True,
            optimistic=opt,
        )
        assert res.rows == 3  # 1 updated + 1 deleted + 1 inserted
    assert _rows(spark, str(tmp_path / "claimed")) == _rows(
        spark, str(tmp_path / "optimistic")
    )
    e = b.commit_log(KEY).committed_entry(b.commit_log(KEY).latest_version())
    assert (e["merge_inserted"], e["merge_updated"], e["merge_deleted"]) == (1, 1, 1)


def test_optimistic_dml_cdf_matches_claimed(spark, tmp_path):
    a = _seed(spark, str(tmp_path / "claimed"), emit_cdf=True)
    b = _seed(spark, str(tmp_path / "optimistic"), emit_cdf=True)
    for w, opt in ((a, False), (b, True)):
        w.delete_where(KEY, "price = 1", optimistic=opt)
        w.update_where(
            KEY, {"ts": "ts + 2678400000"}, "price = 7", optimistic=opt
        )

    def feed(base):
        df, _v = LakeReader(spark, base).read_change_feed(KEY, after_version=1)
        return sorted(
            (r["ts"], r["price"], r["_change_type"])
            for r in df.select("ts", "price", "_change_type").collect()
        )

    got = feed(str(tmp_path / "optimistic"))
    assert got == feed(str(tmp_path / "claimed"))
    kinds = {c for _, _, c in got}
    assert kinds == {"delete", "update_postimage"}


# -- conflict semantics (read_set="rows") ---------------------------------


def test_optimistic_delete_conflicts_with_append_into_read_month(spark, tmp_path):
    """An append INTO a read month lands mid-job: rows the predicate
    never saw — conflict (Delta's serializable ConcurrentAppend), tree
    untouched, staging cleaned."""
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    restore = _race_once(
        w,
        lambda: LakeWriter(spark, base).write_ticks(
            _mk(spark, [(JAN + 50 * 60000, 1.5)]), KEY, mode="append"
        ),
    )
    try:
        with pytest.raises(ConcurrentWriteConflict, match="overlaps|stale"):
            w.delete_where(KEY, "price < 3", optimistic=True)
    finally:
        restore()
    got = _rows(spark, base)
    assert len(got) == 21  # nothing deleted; racer's row landed
    ds = w.dataset_path(KEY)
    assert not [f for f in list_data_files(w.fs, ds) if re.search(r"/[0-9a-f]{12}-part-", f)]
    assert not [d for d in w.fs.listdir(ds) if d.startswith("_staging")]


def test_optimistic_delete_commutes_with_disjoint_append(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    restore = _race_once(
        w,
        lambda: LakeWriter(spark, base).write_ticks(
            _mk(spark, [(MAR + i * 60000, 300.0 + i) for i in range(4)]),
            KEY, mode="append",
        ),
    )
    try:
        res = w.delete_where(KEY, "price < 3", optimistic=True)
    finally:
        restore()
    assert res.rows == 3
    assert len(_rows(spark, base)) == 20 - 3 + 4  # both writers landed


def test_optimistic_update_conflicts_with_overlapping_rewrite(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    restore = _race_once(
        w, lambda: LakeWriter(spark, base).delete_where(KEY, "price = 9")
    )
    try:
        with pytest.raises(ConcurrentWriteConflict, match="overlaps|stale"):
            w.update_where(KEY, {"price": "price + 1"}, "price < 3", optimistic=True)
    finally:
        restore()
    got = _rows(spark, base)
    assert len(got) == 19 and (JAN + 9 * 60000, 9.0) not in got


# -- compact_partitions (read_set="files") --------------------------------


def test_compact_partitions_commutes_with_append_same_month(spark, tmp_path):
    """The crucial asymmetry vs predicate DML: compaction reads FILES,
    not rows, so an append into the same month mid-job commutes — both
    commits land, zero lost rows (Delta: OPTIMIZE never blocks
    ingestion)."""
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    # fragment January: three more small appends
    for i in range(3):
        w.write_ticks(
            _mk(spark, [(JAN + (20 + i) * 60000, 20.0 + i)]), KEY, mode="append"
        )
    ds = w.dataset_path(KEY)
    jan_before = [
        f for f in resolve_live_files(w.fs, ds) if partition_of(f) == (2023, 1)
    ]
    assert len(jan_before) >= 4
    restore = _race_once(
        w,
        lambda: LakeWriter(spark, base).write_ticks(
            _mk(spark, [(JAN + 40 * 60000, 40.0)]), KEY, mode="append"
        ),
    )
    try:
        res = w.compact_partitions(KEY, target_files_per_partition=1)
    finally:
        restore()
    assert [2023, 1] in res.partitions
    live = resolve_live_files(w.fs, ds)
    jan_after = [f for f in live if partition_of(f) == (2023, 1)]
    # 1 compacted file + the racer's appended file
    assert len(jan_after) == 2
    got = _rows(spark, base)
    assert len(got) == 20 + 3 + 1 and (JAN + 40 * 60000, 40.0) in got
    # CDC-invisible but validator-visible commit shape
    e = w.commit_log(KEY).committed_entry(w.commit_log(KEY).latest_version())
    assert e["mode"] == "compact" and e["partitions"] == []
    assert [2023, 1] in e["rewrite_partitions"]


def test_compact_partitions_conflicts_with_rewrite_same_month(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    for i in range(3):
        w.write_ticks(
            _mk(spark, [(JAN + (20 + i) * 60000, 20.0 + i)]), KEY, mode="append"
        )
    restore = _race_once(
        w, lambda: LakeWriter(spark, base).delete_where(KEY, "price = 0")
    )
    try:
        with pytest.raises(ConcurrentWriteConflict, match="overlaps|stale"):
            w.compact_partitions(KEY, target_files_per_partition=1)
    finally:
        restore()
    assert len(_rows(spark, base)) == 22  # racer's delete landed, compact aborted


def test_compact_partitions_materializes_deletion_vectors(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    for i in range(3):
        w.write_ticks(
            _mk(spark, [(JAN + (20 + i) * 60000, 20.0 + i)]), KEY, mode="append"
        )
    assert w.delete_where(KEY, "price < 2", strategy="dv").rows == 2
    log = w.commit_log(KEY)
    assert log.dv_at(None)  # merge-on-read debt exists
    res = w.compact_partitions(KEY, target_files_per_partition=1)
    assert res.partitions  # something compacted
    # compaction materialized the deletes: no DV refs survive on the
    # rewritten months' live files (carry filters them to the live set)
    live = set(resolve_live_files(w.fs, w.dataset_path(KEY)))
    assert not (set(log.dv_at(None)) & live)
    got = _rows(spark, base)
    assert len(got) == 21 and all(p >= 2 for _, p in got if p < 100)


def test_compact_partitions_nothing_to_do_commits_nothing(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    w.compact_partitions(KEY, target_files_per_partition=1)
    v = w.commit_log(KEY).latest_version()
    res = w.compact_partitions(KEY, target_files_per_partition=1)
    assert res.rows == 0 and res.partitions == []
    assert w.commit_log(KEY).latest_version() == v


# -- guardrails ------------------------------------------------------------


def test_optimistic_dv_strategy_refused(spark, tmp_path):
    w = _seed(spark, str(tmp_path / "lake"))
    with pytest.raises(ValueError, match="rewrite"):
        w.delete_where(KEY, "price < 3", strategy="dv", optimistic=True)
    with pytest.raises(ValueError, match="rewrite"):
        w.update_where(KEY, {"price": "0"}, "price < 3", strategy="dv", optimistic=True)


def test_optimistic_dml_falls_back_on_legacy_dataset(spark, tmp_path):
    """A dataset with no pinned listing (external writer) takes the
    claimed path under optimistic=True — correctness first."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    ds = w.dataset_path(KEY)
    _mk(spark, [(JAN + i * 60000, float(i)) for i in range(6)]).withColumn(
        "year", F.lit(2023)
    ).withColumn("month", F.lit(1)).write.partitionBy("year", "month").parquet(ds)
    assert resolve_live_files(w.fs, ds) is None
    res = w.delete_where(KEY, "price < 2", optimistic=True)
    assert res.rows == 2
    assert len(_rows(spark, base)) == 4


def test_optimistic_dml_contract_gate_still_applies(spark, tmp_path):
    from dl_datalake_spark.lake.schema import SchemaContractError

    base = str(tmp_path / "lake")
    w = _seed(spark, base)
    v = w.commit_log(KEY).latest_version()
    with pytest.raises(SchemaContractError):
        w.update_where(
            KEY, {"price": "CAST(price AS string)"}, "price < 3", optimistic=True
        )
    assert w.commit_log(KEY).latest_version() == v
    ds = w.dataset_path(KEY)
    assert not [d for d in w.fs.listdir(ds) if d.startswith("_staging")]
