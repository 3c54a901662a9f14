"""Write-time schema contract (lake/schema.py + CommitLog.schema_at):
incompatible appends rejected with the dataset untouched, opt-in
evolution (new columns, type widening), lossless up-casts, historical
schemas through time travel, DML post-image exactness.

Reference contrast: the reference enforces only ts presence
(dl-datalake/src/dl_datalake/storage/writer.py:162-164); a silent type
flip there corrupts the dataset for every reader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.commitlog import CommitLog
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.schema import SchemaContractError, resolve_append
from dl_datalake_spark.lake.writer import LakeWriter

KEY = DatasetKey("SIM", "SPOT", "SCH", "ticks", "1m")
T0 = 1672574400000


def _rows(spark, n=5, start=T0, schema="ts long, price double", mk=None):
    mk = mk or (lambda i: (start + i * 60000, float(i)))
    return spark.createDataFrame([mk(i) for i in range(n)], schema)


@pytest.fixture()
def lake(tmp_path, spark):
    base = str(tmp_path / "lake")
    return LakeWriter(spark, base), base


# -- pure resolution rules ---------------------------------------------------

def test_resolve_append_rules():
    prev = {"ts": "bigint", "price": "double", "qty": "int"}
    # identical passes
    r, u = resolve_append(prev, dict(prev), merge_schema=False)
    assert r == prev and u == {}
    # narrower batch: lossless up-cast, no opt-in needed
    r, u = resolve_append(prev, {"ts": "int", "price": "float"}, False)
    assert u == {"ts": "bigint", "price": "double"} and r == prev
    # missing columns always fine
    r, u = resolve_append(prev, {"ts": "bigint"}, False)
    assert r == prev and u == {}
    # new column: opt-in
    with pytest.raises(SchemaContractError, match="new column"):
        resolve_append(prev, {"ts": "bigint", "note": "string"}, False)
    r, _ = resolve_append(prev, {"ts": "bigint", "note": "string"}, True)
    assert r["note"] == "string"
    # widening: opt-in
    with pytest.raises(SchemaContractError, match="widening"):
        resolve_append(prev, {"ts": "bigint", "qty": "bigint"}, False)
    r, _ = resolve_append(prev, {"ts": "bigint", "qty": "bigint"}, True)
    assert r["qty"] == "bigint"
    # incompatible: never
    with pytest.raises(SchemaContractError, match="not a supported change"):
        resolve_append(prev, {"ts": "string"}, True)


# -- write-path enforcement --------------------------------------------------

def test_incompatible_append_rejected_dataset_untouched(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")
    ds = w.dataset_path(KEY)
    log = CommitLog(ds, fs=w.fs)
    v0 = log.latest_version()
    assert log.schema_at(None) == {"ts": "bigint", "price": "double"}
    bad = _rows(
        spark, schema="ts long, price string",
        mk=lambda i: (T0 + 600000 + i * 60000, f"p{i}"),
    )
    with pytest.raises(SchemaContractError, match="not a supported change"):
        w.write_ticks(bad, KEY, mode="append")
    # commit log untouched, data untouched
    assert log.latest_version() == v0
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 5 and dict(got.dtypes)["price"] == "double"


def test_new_column_requires_opt_in_then_evolves(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")
    b2 = _rows(
        spark, schema="ts long, price double, venue string",
        mk=lambda i: (T0 + 600000 + i * 60000, float(i), "X"),
    )
    with pytest.raises(SchemaContractError, match="new column"):
        w.write_ticks(b2, KEY, mode="append")
    w.merge_schema = True
    w.write_ticks(b2, KEY, mode="append")
    log = CommitLog(w.dataset_path(KEY), fs=w.fs)
    assert log.schema_at(None) == {
        "ts": "bigint", "price": "double", "venue": "string"
    }
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 10
    assert got.where(F.col("venue").isNull()).count() == 5


def test_narrower_batch_upcast_silently(lake, spark):
    """int price into a double table: upcast at write, files uniform,
    no opt-in needed (lossless)."""
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")  # price double
    narrow = _rows(
        spark, schema="ts long, price int",
        mk=lambda i: (T0 + 600000 + i * 60000, i),
    )
    w.write_ticks(narrow, KEY, mode="append")  # no error, no opt-in
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 10 and dict(got.dtypes)["price"] == "double"
    # and NOT recorded as an evolution
    assert CommitLog(w.dataset_path(KEY), fs=w.fs).schema_at(None) == {
        "ts": "bigint", "price": "double"
    }


def test_widening_evolution_and_historical_schema(lake, spark):
    """Widen price int -> bigint under merge_schema=True; the head read
    serves bigint ACROSS old int32 files (explicit contract schema —
    mergeSchema inference cannot merge int/long), and time travel
    presents each epoch's own schema."""
    w, base = lake
    w.write_ticks(
        _rows(spark, schema="ts long, price int", mk=lambda i: (T0 + i * 60000, i)),
        KEY, mode="append",
    )                                                                    # v0
    wide = _rows(
        spark, schema="ts long, price long",
        mk=lambda i: (T0 + 600000 + i * 60000, 10_000_000_000 + i),
    )
    with pytest.raises(SchemaContractError, match="widening"):
        w.write_ticks(wide, KEY, mode="append")
    w.merge_schema = True
    w.write_ticks(wide, KEY, mode="append")                              # v1
    log = CommitLog(w.dataset_path(KEY), fs=w.fs)
    assert log.schema_at(0) == {"ts": "bigint", "price": "int"}
    assert log.schema_at(None) == {"ts": "bigint", "price": "bigint"}
    r = LakeReader(spark, base)
    head = r.read_dataset(KEY)
    assert dict(head.dtypes)["price"] == "bigint"
    assert head.count() == 10
    assert head.agg(F.max("price")).first()[0] == 10_000_000_004
    # time travel: v0 under its own (int) schema
    v0 = r.read_dataset_at(KEY, 0)
    assert dict(v0.dtypes)["price"] == "int" and v0.count() == 5


def test_schema_carries_through_delete_and_prune(lake, spark):
    """Schema-less commits (deletes) carry the contract forward at
    finalize, and prune can never orphan it (the _carry_dv mechanic)."""
    w, base = lake
    w.write_ticks(_rows(spark, n=20), KEY, mode="append")
    w.delete_where(KEY, F.col("price") >= 15, strategy="dv")
    log = CommitLog(w.dataset_path(KEY), fs=w.fs)
    assert log.schema_at(None) == {"ts": "bigint", "price": "double"}
    for i in range(12):
        w.write_ticks(
            _rows(spark, n=1, start=T0 + (30 + i) * 60000), KEY, mode="append"
        )
    log.prune(keep_last=2)
    assert log.schema_at(None) == {"ts": "bigint", "price": "double"}


def test_restore_pins_pre_evolution_schema(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")                      # v0
    w.merge_schema = True
    w.write_ticks(
        _rows(
            spark, schema="ts long, price double, venue string",
            mk=lambda i: (T0 + 600000 + i * 60000, float(i), "X"),
        ),
        KEY, mode="append",
    )                                                                    # v1
    w.restore_dataset(KEY, 0)                                            # v2
    log = CommitLog(w.dataset_path(KEY), fs=w.fs)
    assert log.schema_at(None) == {"ts": "bigint", "price": "double"}
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 5 and "venue" not in got.columns


def test_bootstrap_covers_pre_contract_columns(lake, spark):
    """First contract-aware write on a dataset with pre-existing
    columns the batch lacks: the recorded contract is the UNION, so the
    explicit-schema read never drops them."""
    import json

    w, base = lake
    w.write_ticks(
        _rows(
            spark, schema="ts long, price double, qty double",
            mk=lambda i: (T0 + i * 60000, float(i), 2.0 * i),
        ),
        KEY, mode="append",
    )
    ds = w.dataset_path(KEY)
    # simulate pre-contract history: strip the schema key from every
    # committed entry (as if written by an older engine build)
    log = CommitLog(ds, fs=w.fs)
    for v in log._entries():
        p = f"{log.log_dir}/{v:020d}.json"
        e = json.loads(w.fs.read_bytes(p))
        e.pop("schema", None)
        w.fs.write_bytes_atomic(p, json.dumps(e).encode())
    assert log.schema_at(None) is None
    # batch missing `qty`: bootstrap must fold it in from the live files
    w.write_ticks(
        _rows(spark, start=T0 + 600000), KEY, mode="append"
    )
    assert log.schema_at(None) == {
        "ts": "bigint", "price": "double", "qty": "double"
    }
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 10 and "qty" in got.columns


# -- DML contract ------------------------------------------------------------

def test_update_where_enforces_expectations(lake, spark):
    """CHECK constraints gate UPDATE post-images (Delta parity): an
    update may not produce a row the same write path would refuse."""
    from dl_datalake_spark.lake.expectations import Expectation, ExpectationError

    w, base = lake
    w2 = LakeWriter(
        spark, base, expectations=[Expectation("price_pos", F.col("price") > 0)]
    )
    w2.write_ticks(_rows(spark, mk=lambda i: (T0 + i * 60000, float(i + 1))), KEY)
    for strategy in ("rewrite", "dv"):
        with pytest.raises(ExpectationError, match="price_pos"):
            w2.update_where(
                KEY, {"price": "-1.0"}, "price >= 3", strategy=strategy
            )
    # commit log untouched by both failures, data intact
    log = CommitLog(w2.dataset_path(KEY), fs=w2.fs)
    assert log.latest_version() == 0
    assert (
        LakeReader(spark, base).read_dataset(KEY)
        .where(F.col("price") <= 0).count() == 0
    )
    # a compliant update still lands
    res = w2.update_where(KEY, {"price": "price + 100"}, "price >= 3")
    assert res.rows == 3


def test_merge_into_enforces_expectations(lake, spark):
    from dl_datalake_spark.lake.expectations import Expectation, ExpectationError

    w, base = lake
    w2 = LakeWriter(
        spark, base, expectations=[Expectation("price_pos", F.col("price") > 0)]
    )
    w2.write_ticks(_rows(spark, mk=lambda i: (T0 + i * 60000, float(i + 1))), KEY)
    src = _rows(spark, n=2, mk=lambda i: (T0 + i * 60000, float(i + 1)))
    with pytest.raises(ExpectationError, match="price_pos"):
        w2.merge_into(KEY, src, on="ts", when_matched_update={"price": "-5.0"})
    assert CommitLog(w2.dataset_path(KEY), fs=w2.fs).latest_version() == 0
    # violating INSERT leg refused too
    bad_ins = _rows(spark, n=1, mk=lambda i: (T0 + 99 * 60000, -3.0))
    with pytest.raises(ExpectationError, match="price_pos"):
        w2.merge_into(KEY, bad_ins, on="ts")


def test_update_where_schema_exactness(lake, spark):
    """An assignment producing an incompatible type raises before any
    write (DML never evolves the schema)."""
    w, base = lake
    w.write_ticks(_rows(spark), KEY)
    with pytest.raises(SchemaContractError, match="price"):
        w.update_where(KEY, {"price": "'oops'"}, "price >= 3")
    assert CommitLog(w.dataset_path(KEY), fs=w.fs).latest_version() == 0


# -- non-ts MERGE fallback ---------------------------------------------------

def test_merge_nonts_requires_full_scan_opt_in(lake, spark):
    w, base = lake
    rows = spark.createDataFrame(
        [(T0 + i * 60000, float(i), 100 + i) for i in range(6)],
        "ts long, price double, order_id long",
    )
    w.write_ticks(rows, KEY)
    src = spark.createDataFrame(
        [(T0 + 99 * 60000, 55.0, 103), (T0 + 98 * 60000, 66.0, 999)],
        "ts long, price double, order_id long",
    )
    with pytest.raises(ValueError, match="full_scan=True"):
        w.merge_into(KEY, src, on=["order_id"], when_matched_update={"price": "s.price"})
    res = w.merge_into(
        KEY, src, on=["order_id"],
        when_matched_update={"price": "s.price"},
        full_scan=True,
    )
    assert res.rows == 2  # 1 updated + 1 inserted
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 7
    assert got.where(F.col("order_id") == 103).first()["price"] == 55.0
    assert got.where(F.col("order_id") == 999).count() == 1
