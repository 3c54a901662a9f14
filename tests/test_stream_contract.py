"""Round-11: the `lake_appends`/`lake_cdf` streaming sources are
SCHEMA-CONTRACT-AWARE (VERDICT r10 'what's wrong' #2) — they serve the
dataset's LOGICAL column names and contract types, exactly like every
batch scan that goes through schema.contract_read:

- after `rename_column(price -> px)` a stream serves `px` (the batch
  reader and the stream previously disagreed about the same dataset);
- a merge_schema-widened column streams at its WIDENED type, with old
  narrow files upcast in flight;
- a dropped column's retired bytes never enter the stream;
- a rename/evolution commit landing AFTER the stream pinned its schema
  fails the stream loudly (Delta semantics: restart to pick up the new
  contract — a restart re-resolves and serves it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.writer import LakeWriter
from dl_datalake_spark.sources.append_source import (
    LakeAppendsStreamReader,
    stream_appends,
)
from dl_datalake_spark.sources.cdf_source import stream_change_feed

JAN = 1672574400000
KEY = DatasetKey("SIM", "SPOT", "SCA", "ticks", "1m")


def _mk(spark, rows, schema="ts long, price double"):
    return spark.createDataFrame(rows, schema)


def _drain(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_append_stream_serves_logical_names_after_rename(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_mk(spark, [(JAN, 1.0), (JAN + 60000, 2.0)]), KEY, mode="append")
    w.rename_column(KEY, "price", "px")
    w.write_ticks(
        _mk(spark, [(JAN + 120000, 3.0)], "ts long, px double"), KEY, mode="append"
    )
    out, ckpt = str(tmp_path / "o1"), str(tmp_path / "c1")
    _drain(stream_appends(spark, w.dataset_path(KEY)), out, ckpt)
    got = spark.read.parquet(out)
    assert "px" in got.columns and "price" not in got.columns
    rows = {(r["ts"], r["px"]) for r in got.collect()}
    assert rows == {(JAN, 1.0), (JAN + 60000, 2.0), (JAN + 120000, 3.0)}


def test_append_stream_serves_widened_type(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, merge_schema=True)
    w.write_ticks(
        _mk(spark, [(JAN, 1.0, 7)], "ts long, price double, qty int"),
        KEY, mode="append",
    )
    w.write_ticks(
        _mk(spark, [(JAN + 60000, 2.0, 2**40)], "ts long, price double, qty bigint"),
        KEY, mode="append",
    )
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(stream_appends(spark, w.dataset_path(KEY)), out, ckpt)
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["qty"] == "bigint"
    assert {r["qty"] for r in got.collect()} == {7, 2**40}


def test_append_stream_excludes_dropped_column(spark, tmp_path):
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(
        _mk(spark, [(JAN, 1.0, "secret")], "ts long, price double, note string"),
        KEY, mode="append",
    )
    w.drop_column(KEY, "note")
    w.write_ticks(_mk(spark, [(JAN + 60000, 2.0)]), KEY, mode="append")
    out, ckpt = str(tmp_path / "o3"), str(tmp_path / "c3")
    _drain(stream_appends(spark, w.dataset_path(KEY)), out, ckpt)
    got = spark.read.parquet(out)
    assert "note" not in got.columns
    assert got.count() == 2


def test_append_stream_null_fills_readded_column(spark, tmp_path):
    """Drop then re-add: the re-added logical column has a FRESH
    physical name, so pre-drop files' bytes must stream as NULL, never
    resurrect."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, merge_schema=True)
    w.write_ticks(
        _mk(spark, [(JAN, 1.0, "old")], "ts long, price double, note string"),
        KEY, mode="append",
    )
    w.drop_column(KEY, "note")
    w.write_ticks(
        _mk(spark, [(JAN + 60000, 2.0, "new")], "ts long, price double, note string"),
        KEY, mode="append",
    )
    out, ckpt = str(tmp_path / "o4"), str(tmp_path / "c4")
    _drain(stream_appends(spark, w.dataset_path(KEY)), out, ckpt)
    got = {r["ts"]: r["note"] for r in spark.read.parquet(out).collect()}
    assert got == {JAN: None, JAN + 60000: "new"}


def test_cdf_stream_serves_logical_names_after_rename(spark, tmp_path):
    """CDF deltas carry the logical names OF THEIR OWN EPOCH; the
    stream maps them to the head contract by physical identity."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    w.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY)            # v0: delta says price
    w.rename_column(KEY, "price", "px")                      # v1: metadata-only
    w.write_ticks(_mk(spark, [(JAN, 1.5)], "ts long, px double"), KEY)  # v2: px
    out, ckpt = str(tmp_path / "o5"), str(tmp_path / "c5")
    _drain(stream_change_feed(spark, w.dataset_path(KEY)), out, ckpt)
    got = spark.read.parquet(out)
    assert "px" in got.columns and "price" not in got.columns
    rows = {(r["commit_version"], r["px"], r["_change_type"]) for r in got.collect()}
    assert rows == {(0, 1.0, "insert"), (2, 1.5, "update_postimage")}


def test_mid_stream_evolution_fails_loudly(spark, tmp_path):
    """A rename committed AFTER the reader pinned its contract fails
    planning with a restart instruction — never stale names silently."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY, mode="append")       # v0
    ds = w.dataset_path(KEY)
    from dl_datalake_spark.sources.append_source import _resolve_append_schema

    ddl, _src, _pin = _resolve_append_schema(ds, None)
    reader = LakeAppendsStreamReader({"path": ds, "after_version": "-1"}, ddl)
    # evolution lands after the pin
    w.rename_column(KEY, "price", "px")                                # v1
    w.write_ticks(_mk(spark, [(JAN + 60000, 2.0)], "ts long, px double"),
                  KEY, mode="append")                                  # v2
    with pytest.raises(ValueError, match="restart"):
        reader.partitions({"version": -1}, {"version": 2})


def test_explicit_schema_option_is_raw_mode(spark, tmp_path):
    """Passing .option('schema', ...) bypasses the contract: physical
    names served verbatim (documented escape hatch)."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY, mode="append")
    w.rename_column(KEY, "price", "px")
    out, ckpt = str(tmp_path / "o6"), str(tmp_path / "c6")
    _drain(
        stream_appends(spark, w.dataset_path(KEY), schema="ts long, price double"),
        out, ckpt,
    )
    got = spark.read.parquet(out)
    assert "price" in got.columns
    assert got.first()["price"] == 1.0


def test_ddl_names_nested_types():
    from dl_datalake_spark.sources.cdf_source import _ddl_names

    assert _ddl_names(
        "a decimal(38,9), b array<struct<x:int,y:int>>, `c d` string"
    ) == ["a", "b", "c d"]


def test_append_stream_decimal_contract(spark, tmp_path):
    """A decimal-contracted dataset (reachable via alter_column_type)
    streams correctly — naive comma-split DDL parsing would shear
    decimal(38,9) into a phantom column (review finding, round 11)."""
    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    w.write_ticks(
        spark.createDataFrame(
            [(JAN + i * 60000, 1.0, 10 + i) for i in range(3)],
            "ts long, price double, qty bigint",
        ),
        KEY, mode="append",
    )
    w.alter_column_type(KEY, "qty", "decimal(38,9)")
    out, ckpt = str(tmp_path / "od"), str(tmp_path / "cd")
    _drain(
        stream_appends(spark, w.dataset_path(KEY), ignore_changes=True),
        out, ckpt,
    )
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["qty"] == "decimal(38,9)"
    assert {int(r["qty"]) for r in got.collect()} == {10, 11, 12}


def test_recluster_widened_dataset(spark, tmp_path):
    """recluster scans through the contract: a merge_schema-widened
    dataset (mixed INT32/INT64 files) reclusters instead of dying on
    CANNOT_MERGE_SCHEMAS (round-11 review follow-up)."""
    from dl_datalake_spark.lake.maintenance import recluster
    from dl_datalake_spark.lake.reader import LakeReader

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, merge_schema=True)
    w.write_ticks(
        _mk(spark, [(JAN + i * 60000, 1.0, i) for i in range(4)],
            "ts long, price double, qty int"),
        KEY, mode="append",
    )
    w.write_ticks(
        _mk(spark, [(JAN + (10 + i) * 60000, 2.0, 2**40 + i) for i in range(4)],
            "ts long, price double, qty bigint"),
        KEY, mode="append",
    )
    out = recluster(spark, w.dataset_path(KEY), ["qty"], base_path=base)
    assert out["files_after"] >= 1
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 8 and dict(got.dtypes)["qty"] == "bigint"


def test_fold_change_feed_normalizes_rename_and_widening(spark, tmp_path):
    """fold_change_feed rewrites deltas to HEAD logical names and
    contract types — the folded segment then passes the lake_cdf
    stream's pre-rename guard (the 're-fold the feed' loop closes)."""
    from dl_datalake_spark.lake.maintenance import fold_change_feed

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True, merge_schema=True)
    w.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY)                       # v0: price
    w.rename_column(KEY, "price", "px")                                 # v1
    w.write_ticks(_mk(spark, [(JAN + 60000, 2.0)], "ts long, px double"), KEY)  # v2
    ds = w.dataset_path(KEY)
    out = fold_change_feed(spark, ds)
    assert out["folded"] >= 2
    # the folded segment carries head names only
    import pyarrow.parquet as pq

    seg = [n for n in w.fs.listdir(f"{ds}/_cdf") if n.startswith("commit_range=")]
    assert seg
    f = [n for n in w.fs.listdir(f"{ds}/_cdf/{seg[0]}") if n.endswith(".parquet")]
    names = set(pq.read_schema(f"{ds}/_cdf/{seg[0]}/{f[0]}").names)
    assert "px" in names and "price" not in names
    # and the stream serves it under the head contract
    o, c = str(tmp_path / "of"), str(tmp_path / "cf")
    _drain(stream_change_feed(spark, ds), o, c)
    rows = {(r["commit_version"], r["px"]) for r in spark.read.parquet(o).collect()}
    assert rows == {(0, 1.0), (2, 2.0)}


def test_fold_drops_dead_columns_never_merges_readds(spark, tmp_path):
    """Drop qty then re-add it (fresh physical): folding old deltas
    must DROP the dead column, not merge its retired bytes into the
    re-added one (review finding, round 11)."""
    from dl_datalake_spark.lake.maintenance import fold_change_feed

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True, merge_schema=True)
    w.write_ticks(
        _mk(spark, [(JAN, 1.0, "old")], "ts long, price double, qty string"), KEY
    )                                                   # v0: qty (old epoch)
    w.drop_column(KEY, "qty")                           # v1
    w.write_ticks(
        _mk(spark, [(JAN + 60000, 2.0, "new")],
            "ts long, price double, qty string"),
        KEY,
    )                                                   # v2: fresh physical
    ds = w.dataset_path(KEY)
    out = fold_change_feed(spark, ds)
    assert out["folded"] >= 2
    o, c = str(tmp_path / "og"), str(tmp_path / "cg")
    _drain(stream_change_feed(spark, ds), o, c)
    got = {r["commit_version"]: r["qty"] for r in spark.read.parquet(o).collect()}
    # v0's retired 'old' value must NOT appear under the re-added column
    assert got == {0: None, 2: "new"}


def test_fold_resolves_rename_after_previous_fold(spark, tmp_path):
    """rename -> fold -> rename again -> fold: the second fold resolves
    the first segment's (then-head, now stale) names through the
    retained logical->physical history — no half-null columns, no
    wedged stream (review finding, round 11)."""
    from dl_datalake_spark.lake.maintenance import fold_change_feed

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base, emit_cdf=True)
    w.write_ticks(_mk(spark, [(JAN, 1.0)]), KEY)                      # v0: price
    w.rename_column(KEY, "price", "px")                                # v1
    w.write_ticks(_mk(spark, [(JAN + 60000, 2.0)], "ts long, px double"), KEY)  # v2
    ds = w.dataset_path(KEY)
    fold_change_feed(spark, ds)                                        # segment: px
    w.rename_column(KEY, "px", "p2")                                   # v3
    w.write_ticks(_mk(spark, [(JAN + 120000, 3.0)], "ts long, p2 double"), KEY)  # v4
    out = fold_change_feed(spark, ds)                                  # re-fold
    assert out["segment"] is not None
    o, c = str(tmp_path / "or2"), str(tmp_path / "cr2")
    _drain(stream_change_feed(spark, ds), o, c)
    got = spark.read.parquet(o)
    assert "p2" in got.columns
    assert "px" not in got.columns and "price" not in got.columns
    rows = {(r["commit_version"], r["p2"]) for r in got.collect()}
    assert rows == {(0, 1.0), (2, 2.0), (4, 3.0)}
