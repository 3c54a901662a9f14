"""Round-11 contract-read hardening: every writer-internal and
maintenance scan resolves through the commit-logged schema contract
(lake/schema.py) instead of mergeSchema footer inference — compaction,
restore diffs, multi-dataset upsert read-backs, and the GDPR purge's
eligibility probe all work on exactly the datasets the contract
features produce (merge_schema-widened mixed-type files, renamed
columns), and partition-column types are RECORDED FACTS in the commit
payload instead of a year/month heuristic.

Reference contrast: the reference has no schema contract at all
(dl-datalake/src/dl_datalake/storage/writer.py:162-164 checks only ts
presence), so none of these read paths exist there."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.client import DataLakeClient
from dl_datalake_spark.lake.commitlog import CommitLog
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.schema import contract_read
from dl_datalake_spark.lake.writer import LakeWriter

T0 = 1672574400000  # 2023-01-01
FEB = 1675252800000  # 2023-02-01


def _rows(spark, n=5, start=T0, schema="ts long, price double", mk=None):
    mk = mk or (lambda i: (start + i * 60000, float(i)))
    return spark.createDataFrame([mk(i) for i in range(n)], schema)


# -- partition types: recorded facts, not heuristics -------------------------


def test_partition_types_recorded_on_write(tmp_path, spark):
    w = LakeWriter(spark, str(tmp_path / "lake"))
    key = DatasetKey("SIM", "SPOT", "PT", "ticks", "1m")
    w.write_ticks(_rows(spark), key, mode="append")
    pt = w.commit_log(key).partition_types_at(None)
    assert pt["year"] == "int" and pt["month"] == "int"
    assert pt["exchange"] == "string" and pt["symbol"] == "string"
    # carried forward by finalize through a commit that doesn't set it
    w.delete_range(key, T0, T0 + 60000)
    assert w.commit_log(key).partition_types_at(None) == pt


def test_contract_read_serves_recorded_partition_type(tmp_path, spark):
    """A non-year/month numeric partition key is served with its TRUE
    recorded type; without the recorded fact the layout fallback would
    call it string."""
    ds = str(tmp_path / "ext")
    logdir = f"{ds}/_commits"
    os.makedirs(logdir)
    entry = {
        "status": "committed",
        "committed_at": 1.0,
        "schema": {"ts": "bigint", "price": "double"},
        "files": ["bucket=3/part-0.parquet"],
    }
    with open(f"{logdir}/{0:020d}.json", "w") as fh:
        json.dump({**entry, "partition_types": {"bucket": "int"}}, fh)
    log = CommitLog(ds)
    ddl, _ = contract_read(log, ds, ds, "bucket=3/part-0.parquet")
    assert "`bucket` int" in ddl
    # same entry WITHOUT the recorded fact: layout fallback -> string
    with open(f"{logdir}/{0:020d}.json", "w") as fh:
        json.dump(entry, fh)
    ddl2, _ = contract_read(CommitLog(ds), ds, ds, "bucket=3/part-0.parquet")
    assert "`bucket` string" in ddl2


# -- compaction through the contract ------------------------------------------


def test_compact_widened_mixed_type_dataset(tmp_path, spark):
    """A merge_schema-widened dataset holds mixed INT32/INT64 files;
    mergeSchema footer inference cannot merge them (CANNOT_MERGE_
    SCHEMAS) — compact must scan through the recorded contract."""
    from dl_datalake_spark.lake.maintenance import compact

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, merge_schema=True)
    key = DatasetKey("SIM", "SPOT", "WID", "ticks", "1m")
    w.write_ticks(
        _rows(spark, schema="ts long, price double, qty int",
              mk=lambda i: (T0 + i * 60000, float(i), i)),
        key, mode="append",
    )
    w.write_ticks(
        _rows(spark, schema="ts long, price double, qty bigint",
              mk=lambda i: (FEB + i * 60000, float(i), 2**40 + i)),
        key, mode="append",
    )
    assert w.commit_log(key).schema_at(None)["qty"] == "bigint"
    compact(spark, base, in_place=True)
    got = LakeReader(spark, base).read_dataset(key)
    assert got.count() == 10
    assert dict(got.dtypes)["qty"] == "bigint"
    assert got.agg(F.max("qty")).first()[0] == 2**40 + 4


def test_compact_never_copies_dropped_columns_forward(tmp_path, spark):
    """Dropped/retired physical columns must not be copied into the
    fresh compacted files — the contract read excludes them."""
    import pyarrow.parquet as pq

    from dl_datalake_spark.lake.maintenance import compact

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    key = DatasetKey("SIM", "SPOT", "DRP", "ticks", "1m")
    w.write_ticks(
        _rows(spark, schema="ts long, price double, note string",
              mk=lambda i: (T0 + i * 60000, float(i), f"n{i}")),
        key, mode="append",
    )
    w.drop_column(key, "note")
    compact(spark, base, in_place=True)
    ds = w.dataset_path(key)
    files = [
        os.path.join(root, f)
        for root, _dirs, fs_ in os.walk(ds)
        for f in fs_
        if f.endswith(".parquet") and "_cdf" not in root and "_commits" not in root
    ]
    assert files
    for f in files:
        assert "note" not in pq.read_schema(f).names
    assert LakeReader(spark, base).read_dataset(key).count() == 5


# -- restore / CDF diff through the contract -----------------------------------


def test_restore_widened_dataset_with_cdf_diff(tmp_path, spark):
    """Restore across a type widening: head holds mixed INT32/INT64
    files — the snapshot scans and the synthetic-CDF row diff must go
    through each epoch's contract, not mergeSchema."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, merge_schema=True, emit_cdf=True)
    key = DatasetKey("SIM", "SPOT", "RST", "ticks", "1m")
    w.write_ticks(
        _rows(spark, schema="ts long, price double, qty int",
              mk=lambda i: (T0 + i * 60000, float(i), i)),
        key, mode="append",
    )
    log = w.commit_log(key)
    v0 = log.latest_version()
    w.write_ticks(
        _rows(spark, schema="ts long, price double, qty bigint",
              mk=lambda i: (T0 + (100 + i) * 60000, float(i), 2**40 + i)),
        key, mode="append",
    )
    res = w.restore_dataset(key, v0)
    assert res.rows == 5
    got = LakeReader(spark, base).read_dataset(key)
    assert got.count() == 5
    # the restored head serves v0's rows; contract stays at the widened
    # type (restore re-records the TARGET schema)
    assert log.schema_at(None)["qty"] == "int"


# -- multi-dataset upsert read-back through the contract -----------------------


def test_multi_upsert_readback_on_widened_dataset(tmp_path, spark):
    """write_ohlc_multi(mode='upsert') read-back previously opened every
    touched dataset with ONE mergeSchema scan — a widened dataset's
    mixed-type files crashed it.  Per-dataset contract groups fix it."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, merge_schema=True)

    def multi_batch(start, qty_type, qty0):
        return spark.createDataFrame(
            [
                (sym, start + i * 60000, float(i), qty0 + i)
                for sym in ("AAA", "BBB")
                for i in range(3)
            ],
            f"symbol string, ts long, price double, qty {qty_type}",
        )

    w.write_ohlc_multi(multi_batch(T0, "int", 0), "SIM", "SPOT", "ticks")
    # widen ONE of the two datasets via a single-dataset append
    ka = DatasetKey("SIM", "SPOT", "AAA", "ticks", "1m")
    w.write_ticks(
        _rows(spark, schema="ts long, price double, qty bigint",
              mk=lambda i: (FEB + i * 60000, float(i), 2**40 + i)),
        ka, mode="append",
    )
    # upsert overlapping ts rows -> read-back over mixed-type AAA files
    out = w.write_ohlc_multi(
        multi_batch(T0, "int", 100), "SIM", "SPOT", "ticks", mode="upsert"
    )
    assert set(out) == {"AAA", "BBB"}
    r = LakeReader(spark, base)
    a = r.read_dataset(ka)
    assert a.where(F.col("ts") == T0).first()["qty"] == 100  # replaced
    assert a.count() == 8  # 3 upserted + 5 Feb
    kb = DatasetKey("SIM", "SPOT", "BBB", "ticks", "1m")
    assert r.read_dataset(kb).count() == 3


# -- purge eligibility probe through the contract ------------------------------


def test_purge_rows_covers_renamed_dataset(tmp_path, spark):
    """The GDPR purge's eligibility probe resolves against the
    contract's LOGICAL names: a dataset whose column was renamed is
    purgeable under the new name (the raw first-file probe saw only
    the stale physical name and silently skipped it)."""
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    key = DatasetKey("binance", "spot", "RNM", "ticks", "1m")
    client.writer.write_ticks(_rows(spark, n=10), key, mode="append")
    client.writer.rename_column(key, "price", "px")
    out = client.purge_rows("px >= 5.0")
    from dl_datalake_spark.lake.paths import dataset_rel_path

    rel = dataset_rel_path(key.normalized())
    assert out["skipped"] == {}
    assert out["deleted"].get(rel) == 5
    got = client.reader.read_dataset(key)
    assert got.count() == 5 and got.agg(F.max("px")).first()[0] == 4.0


# -- DML gate ordering vs the change feed --------------------------------------


def test_merge_into_gate_rejects_before_cdf_write(tmp_path, spark):
    """A merge whose post-image violates a CHECK expectation aborts
    BEFORE the change feed is written — no orphan _cdf dir for the
    aborted version."""
    from dl_datalake_spark.lake.expectations import ExpectationError, accepted_range

    base = str(tmp_path / "lake")
    w = LakeWriter(
        spark, base, emit_cdf=True,
        expectations=[accepted_range("price", 0.0, 1e9)],
    )
    key = DatasetKey("SIM", "SPOT", "GTE", "ticks", "1m")
    w.write_ticks(_rows(spark), key, mode="append")
    cdf_dir = f"{w.dataset_path(key)}/_cdf"
    before = set(os.listdir(cdf_dir)) if os.path.isdir(cdf_dir) else set()
    src = _rows(spark, n=2, mk=lambda i: (T0 + i * 60000, -1.0))
    with pytest.raises(ExpectationError):
        w.merge_into(key, src, on="ts", when_matched_update="*")
    after = set(os.listdir(cdf_dir)) if os.path.isdir(cdf_dir) else set()
    assert after == before  # no orphan feed dir from the aborted claim


def test_merge_into_cdf_carries_gate_upcasts(tmp_path, spark):
    """The gate's lossless upcasts reach the feed: merging an int
    assignment into a double column serves double-typed CDF rows."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    key = DatasetKey("SIM", "SPOT", "UPC", "ticks", "1m")
    w.write_ticks(_rows(spark), key, mode="append")
    src = spark.createDataFrame(
        [(T0, 7), (T0 + 60000, 8)], "ts long, price int"
    )
    w.merge_into(
        key, src, on="ts",
        when_matched_update={"price": F.col("s.price")},
        when_not_matched_insert=False,
    )
    feed, _cursor = LakeReader(spark, base).read_change_feed(key, after_version=0)
    assert dict(feed.dtypes)["price"] == "double"
    post = {r["ts"]: r["price"] for r in feed.where(
        F.col("_change_type") == "update_postimage").collect()}
    assert post == {T0: 7.0, T0 + 60000: 8.0}


# -- rewrite-backed type change (round-11 stretch) ------------------------------


def test_alter_column_type_roundtrip_and_time_travel(tmp_path, spark):
    """int -> string full rewrite: head serves strings, VERSION AS OF
    serves the old epoch's ints over the old files, contract history
    keeps both types."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    key = DatasetKey("SIM", "SPOT", "ALT", "ticks", "1m")
    w.write_ticks(
        _rows(spark, schema="ts long, price double, qty int",
              mk=lambda i: (T0 + i * 60000, float(i), 10 + i)),
        key, mode="append",
    )
    log = w.commit_log(key)
    v0 = log.latest_version()
    res = w.alter_column_type(key, "qty", "string")
    assert res.rows == 5
    r = LakeReader(spark, base)
    head = r.read_dataset(key)
    assert dict(head.dtypes)["qty"] == "string"
    assert {x["qty"] for x in head.collect()} == {str(10 + i) for i in range(5)}
    old = r.read_dataset_at(key, v0)
    assert dict(old.dtypes)["qty"] == "int"
    assert old.agg(F.sum("qty")).first()[0] == sum(10 + i for i in range(5))
    assert log.schema_at(v0)["qty"] == "int"
    assert log.schema_at(None)["qty"] == "string"


def test_alter_column_type_refuses_lossy(tmp_path, spark):
    """A cast that does not round-trip (1.5 as int, 'abc' as int)
    aborts the whole commit — never silently nulls or truncates."""
    from dl_datalake_spark.lake.schema import SchemaContractError

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    key = DatasetKey("SIM", "SPOT", "ALX", "ticks", "1m")
    w.write_ticks(_rows(spark, mk=lambda i: (T0 + i * 60000, i + 0.5)), key,
                  mode="append")
    log = w.commit_log(key)
    v = log.latest_version()
    with pytest.raises(SchemaContractError, match="round-trip"):
        w.alter_column_type(key, "price", "int")
    assert log.latest_version() == v  # aborted: no commit landed
    assert log.schema_at(None)["price"] == "double"
    # a lossless narrowing passes: whole-valued doubles -> bigint... but
    # 0.5 offsets make them fractional; string always round-trips
    w.alter_column_type(key, "price", "string")
    got = LakeReader(spark, base).read_dataset(key)
    assert dict(got.dtypes)["price"] == "string"
    assert got.count() == 5


def test_alter_column_type_keeps_change_feed_alive(tmp_path, spark):
    """alter_column_type on an emit_cdf dataset emits update_postimage
    rows under the new type — the feed survives instead of hitting the
    loud-gap error forever (review finding, round 11)."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    key = DatasetKey("SIM", "SPOT", "ACF", "ticks", "1m")
    w.write_ticks(
        _rows(spark, n=3, schema="ts long, price double, qty int",
              mk=lambda i: (T0 + i * 60000, float(i), 10 + i)),
        key,
    )
    w.alter_column_type(key, "qty", "string")
    feed, cursor = LakeReader(spark, base).read_change_feed(key, after_version=0)
    assert cursor == 1
    rows = {(r["ts"], r["qty"], r["_change_type"]) for r in feed.collect()}
    assert rows == {
        (T0 + i * 60000, str(10 + i), "update_postimage") for i in range(3)
    }
