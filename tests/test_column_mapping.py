"""Column rename/drop via column mapping (lake/schema.py + commit-log
`column_map`): metadata-only renames, fresh physical names on re-add
(no resurrection), logical names across every read/write/DML surface,
historical names through time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.commitlog import CommitLog
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.schema import SchemaContractError
from dl_datalake_spark.lake.snapshot import list_data_files
from dl_datalake_spark.lake.writer import LakeWriter

KEY = DatasetKey("SIM", "SPOT", "MAP", "ticks", "1m")
T0 = 1672574400000


def _rows(spark, n=5, start=T0, price0=0.0):
    return spark.createDataFrame(
        [(start + i * 60000, price0 + i) for i in range(n)],
        "ts long, price double",
    )


@pytest.fixture()
def lake(tmp_path, spark):
    base = str(tmp_path / "lake")
    return LakeWriter(spark, base), base


def test_rename_is_metadata_only_and_time_travel_keeps_old_name(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")                     # v0
    ds = w.dataset_path(KEY)
    files_before = list_data_files(w.fs, ds)
    w.rename_column(KEY, "price", "px")                                 # v1
    assert list_data_files(w.fs, ds) == files_before  # zero files touched
    log = CommitLog(ds, fs=w.fs)
    assert log.schema_at(None) == {"ts": "bigint", "px": "double"}
    assert log.column_map_at(None) == {"px": "price"}
    r = LakeReader(spark, base)
    head = r.read_dataset(KEY)
    assert "px" in head.columns and "price" not in head.columns
    assert head.agg(F.sum("px")).first()[0] == 10.0
    # time travel presents the epoch's own names
    old = r.read_dataset_at(KEY, 0)
    assert "price" in old.columns and "px" not in old.columns
    assert old.agg(F.sum("price")).first()[0] == 10.0


def test_writes_and_upsert_after_rename_use_logical_name(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")                     # v0
    w.rename_column(KEY, "price", "px")                                 # v1
    b2 = spark.createDataFrame(
        [(T0 + (10 + i) * 60000, 100.0 + i) for i in range(3)],
        "ts long, px double",
    )
    w.write_ticks(b2, KEY, mode="append")                               # v2
    # old logical name is now a contract violation
    with pytest.raises(SchemaContractError):
        w.write_ticks(_rows(spark, start=T0 + 99 * 60000), KEY, mode="append")
    # upsert merges old (physical price) and new files under ONE name
    up = spark.createDataFrame([(T0, 555.0)], "ts long, px double")
    w.write_ticks(up, KEY, mode="upsert")                               # v3
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 8
    assert got.where(F.col("ts") == T0).first()["px"] == 555.0
    assert got.where(F.col("px") >= 100).count() == 3 + 1


def test_dml_after_rename_speaks_logical(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark, n=8), KEY)                               # v0
    w.rename_column(KEY, "price", "px")                                 # v1
    res = w.update_where(KEY, {"px": "px + 1000"}, "px >= 6")
    assert res.rows == 2
    res = w.delete_where(KEY, F.col("px") == 0.0, strategy="dv")
    assert res.rows == 1
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 7
    assert got.agg(F.max("px")).first()[0] == 1007.0
    # merge on ts with assignments over the logical name
    src = spark.createDataFrame([(T0 + 60000, 42.0)], "ts long, px double")
    w.merge_into(KEY, src, when_matched_update={"px": "s.px"})
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.where(F.col("ts") == T0 + 60000).first()["px"] == 42.0


def test_drop_then_readd_gets_fresh_physical_no_resurrection(lake, spark):
    w, base = lake
    rows = spark.createDataFrame(
        [(T0 + i * 60000, float(i), 7.0 * i) for i in range(4)],
        "ts long, price double, qty double",
    )
    w.write_ticks(rows, KEY)                                            # v0
    w.drop_column(KEY, "qty")                                           # v1
    r = LakeReader(spark, base)
    assert "qty" not in r.read_dataset(KEY).columns
    ds = w.dataset_path(KEY)
    log = CommitLog(ds, fs=w.fs)
    assert "qty" in log.retired_physical_at(None)
    # re-add qty: fresh physical name, the OLD bytes stay invisible
    w.merge_schema = True
    b2 = spark.createDataFrame(
        [(T0 + (10 + i) * 60000, 50.0 + i, 1.0) for i in range(2)],
        "ts long, price double, qty double",
    )
    w.write_ticks(b2, KEY, mode="append")                               # v2
    assert log.column_map_at(None).get("qty", "qty") != "qty"
    got = r.read_dataset(KEY)
    assert got.count() == 6
    # old rows must serve NULL (never the retired 7*i values)
    assert got.where(F.col("qty").isNotNull()).count() == 2
    assert got.agg(F.sum("qty")).first()[0] == 2.0
    # time travel to v0 still shows the original values
    assert r.read_dataset_at(KEY, 0).agg(F.sum("qty")).first()[0] == 42.0


def test_rename_refusals_and_multi_write_guard(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY)
    with pytest.raises(ValueError, match="identity"):
        w.rename_column(KEY, "ts", "time")
    with pytest.raises(SchemaContractError, match="already exists"):
        w.rename_column(KEY, "price", "price")
    with pytest.raises(SchemaContractError, match="no column"):
        w.rename_column(KEY, "nope", "x")
    # chained rename keeps resolving to the ORIGINAL physical
    w.rename_column(KEY, "price", "px")
    w.rename_column(KEY, "px", "p2")
    log = CommitLog(w.dataset_path(KEY), fs=w.fs)
    assert log.column_map_at(None) == {"p2": "price"}
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.agg(F.sum("p2")).first()[0] == 10.0
    # multi-write refuses mapped datasets loudly
    multi = spark.createDataFrame(
        [(T0, 1.0, 2.0, 0.5, 1.5, 10.0, "MAP")],
        "ts long, open double, high double, low double, close double, "
        "volume double, symbol string",
    )
    with pytest.raises(ValueError, match="column mapping"):
        w.write_ohlc_multi(multi, "SIM", "SPOT", data_type="ticks", period="1m")


def test_restore_rolls_back_names(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark), KEY, mode="append")                     # v0
    w.rename_column(KEY, "price", "px")                                 # v1
    w.restore_dataset(KEY, 0)                                           # v2
    log = CommitLog(w.dataset_path(KEY), fs=w.fs)
    assert log.schema_at(None) == {"ts": "bigint", "price": "double"}
    assert log.column_map_at(None) == {}
    got = LakeReader(spark, base).read_dataset(KEY)
    assert "price" in got.columns and got.count() == 5


def test_dml_after_drop_and_readd_no_crash_no_leak(lake, spark):
    """Review finding: internal mergeSchema reads used to surface the
    RETIRED physical column next to the fresh one after drop-then-re-add,
    crashing every row-rewriting DML with a duplicate-column error and
    leaking dropped values into CDF pre-images.  Internal scans now use
    the contract read (retired columns excluded)."""
    base_key = DatasetKey("SIM", "SPOT", "RDD", "ticks", "1m")
    w, base = lake
    w = LakeWriter(spark, base, emit_cdf=True)
    rows = spark.createDataFrame(
        [(T0 + i * 60000, float(i), 7.0 * i) for i in range(4)],
        "ts long, price double, qty double",
    )
    w.write_ticks(rows, base_key)                                       # v0
    w.drop_column(base_key, "qty")                                      # v1
    # CDF pre-images after the drop must NOT carry the dropped column
    res = w.delete_where(base_key, F.col("price") == 0.0, strategy="dv")  # v2
    assert res.rows == 1
    r = LakeReader(spark, base)
    feed, _ = r.read_change_feed(base_key, 1)  # just the delete commit
    assert feed is not None and "qty" not in feed.columns
    # re-add qty (fresh physical), then every DML still works
    w.merge_schema = True
    w.write_ticks(
        spark.createDataFrame(
            [(T0 + 10 * 60000, 50.0, 1.0)], "ts long, price double, qty double"
        ),
        base_key, mode="append",
    )                                                                   # v3
    # upsert (merge with existing), update, dv-update, merge_into
    w.write_ticks(
        spark.createDataFrame([(T0 + 60000, 99.0, 2.0)],
                              "ts long, price double, qty double"),
        base_key, mode="upsert",
    )
    assert w.update_where(base_key, {"price": "price + 1"}, "qty = 2.0").rows == 1
    assert w.update_where(
        base_key, {"price": "price + 1"}, "qty = 1.0", strategy="dv"
    ).rows == 1
    src = spark.createDataFrame(
        [(T0 + 2 * 60000, 7.0, 7.0)], "ts long, price double, qty double"
    )
    w.merge_into(base_key, src, when_matched_update="*")
    got = r.read_dataset(base_key)
    assert got.count() == 4  # 4 written - 1 deleted + 1 appended; upsert/updates replace
    # old rows' dropped values never resurrect through any rewrite
    assert got.where(F.col("ts") == T0 + 3 * 60000).first()["qty"] is None
    assert got.where(F.col("ts") == T0 + 60000).first()["price"] == 100.0


def test_multi_write_refuses_readding_retired_column(lake, spark):
    w, base = lake
    key = DatasetKey("SIM", "SPOT", "MUL", "raw", "1m")
    ohlc = spark.createDataFrame(
        [(T0, 1.0, 2.0, 0.5, 1.5, 10.0)],
        "ts long, open double, high double, low double, close double, volume double",
    )
    w.write_ohlc(ohlc, key)
    w.drop_column(key, "volume")
    w.merge_schema = True
    multi = ohlc.withColumn("symbol", F.lit("MUL"))
    with pytest.raises(ValueError, match="previously dropped"):
        w.write_ohlc_multi(multi, "SIM", "SPOT", data_type="raw", period="1m")


def test_multipath_read_serves_logical_names(lake, spark):
    """Review finding: multi-path reads (market/period unspecified)
    used to skip the contract and serve stale PHYSICAL names."""
    w, base = lake
    k1 = DatasetKey("SIM", "SPOT", "MPR", "ticks", "1m")
    k2 = DatasetKey("SIM", "FUTURES", "MPR", "ticks", "1m")
    w.write_ticks(_rows(spark), k1)
    w.write_ticks(_rows(spark, price0=100.0), k2)
    w.rename_column(k1, "price", "px")
    r = LakeReader(spark, base)
    got = r.read_range("SIM", "MPR", data_type="ticks")  # market unspecified
    # both logical names present, each dataset under its own contract
    assert {"px", "price"} <= set(got.columns)
    assert got.where(F.col("px").isNotNull()).count() == 5
    assert got.where(F.col("price").isNotNull()).count() == 5


def test_bucket_index_survives_rename(lake, spark):
    """Review finding: the point-lookup bucket index silently stopped
    recording after a rename (files carry physical names)."""
    w, base = lake
    key = DatasetKey("SIM", "SPOT", "BKR", "ticks", "1m")
    wb = LakeWriter(spark, base, bucket_by={"px": 8})
    first = spark.createDataFrame(
        [(T0 + i * 60000, float(i)) for i in range(8)], "ts long, price double"
    )
    LakeWriter(spark, base).write_ticks(first, key)                     # v0
    LakeWriter(spark, base).rename_column(key, "price", "px")           # v1
    more = spark.createDataFrame(
        [(T0 + (100 + i) * 60000, 50.0 + i) for i in range(8)],
        "ts long, px double",
    )
    wb.write_ticks(more, key, mode="append")                            # v2
    log = CommitLog(wb.dataset_path(key), fs=wb.fs)
    bi = log.bucket_index()
    assert "px" in bi and bi["px"]["files"], "bucket index must key the LOGICAL name"
    # and the point lookup itself serves exact results
    got = LakeReader(spark, base).read_dataset(key, point={"px": 53.0})
    assert got.count() == 1 and got.first()["ts"] == T0 + 103 * 60000
