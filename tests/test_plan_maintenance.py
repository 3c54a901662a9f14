"""Maintenance planner (maintenance.plan_maintenance): metadata-only
signals -> recommended actions, the OPTIMIZE-scheduling advisor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.maintenance import plan_maintenance
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.writer import LakeWriter

KEY = DatasetKey("SIM", "SPOT", "PLN", "ticks", "1m")
T0 = 1672574400000


def _rows(spark, n=50, start=T0):
    return spark.createDataFrame(
        [(start + i * 60000, float(i)) for i in range(n)], "ts long, price double"
    )


@pytest.fixture()
def lake(tmp_path, spark):
    base = str(tmp_path / "base")
    return LakeWriter(spark, base), base


def test_small_files_recommend_compact(lake, spark):
    w, base = lake
    # five appends into ONE month -> >4 files in that partition
    for i in range(5):
        w.write_ticks(_rows(spark, n=10, start=T0 + i * 600000), KEY, mode="append")
    rep = plan_maintenance(spark, base, fs=w.fs)
    ds = next(iter(rep["datasets"].values()))
    assert ds["worst_partition_files"] >= 5
    assert "compact" in ds["actions"]


def test_tombstones_recommend_vacuum(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark, n=200), KEY)
    # rewrite the month twice: the superseded files stay as tombstones
    w.write_ticks(_rows(spark, n=200), KEY, mode="overwrite")
    w.write_ticks(_rows(spark, n=200), KEY, mode="overwrite")
    rep = plan_maintenance(spark, base, fs=w.fs)
    ds = next(iter(rep["datasets"].values()))
    assert ds["tombstone_bytes"] > 0
    assert "vacuum-tombstones" in ds["actions"]


def test_dv_load_recommends_materialize(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark, n=100), KEY)
    w.delete_where(KEY, F.col("price") >= 90, strategy="dv")
    rep = plan_maintenance(spark, base, fs=w.fs)
    ds = next(iter(rep["datasets"].values()))
    assert ds["dv_files"] >= 1
    assert "materialize-dv" in ds["actions"]


def test_healthy_dataset_recommends_nothing(lake, spark):
    w, base = lake
    w.write_ticks(_rows(spark, n=100), KEY)
    rep = plan_maintenance(
        spark, base, fs=w.fs, min_file_bytes=1  # tiny test files are "big"
    )
    ds = next(iter(rep["datasets"].values()))
    assert ds["actions"] == []
    assert rep["lake"]["actions"] == []


def test_long_log_recommends_prune(lake, spark):
    w, base = lake
    for i in range(6):
        w.write_ticks(_rows(spark, n=5, start=T0 + i * 60000), KEY)
    rep = plan_maintenance(spark, base, fs=w.fs, keep_last=3, min_file_bytes=1)
    ds = next(iter(rep["datasets"].values()))
    assert "prune-commits" in ds["actions"]


def test_run_maintenance_dry_run_then_apply(lake, spark):
    """The plan->act loop (maintenance.run_maintenance): dry run lists
    the justified actions without touching anything; apply executes
    them and the follow-up plan is clean."""
    from dl_datalake_spark.lake.maintenance import run_maintenance
    from dl_datalake_spark.lake.snapshot import list_data_files

    w, base = lake
    for i in range(6):
        w.write_ticks(_rows(spark, n=20, start=T0 + i * 600000), KEY, mode="append")
    w.delete_where(KEY, F.col("price") >= 18, strategy="dv")
    ds = w.dataset_path(KEY)
    files_before = list_data_files(w.fs, ds)

    dry = run_maintenance(spark, base, fs=w.fs, keep_last=3)
    assert "compact" in dry["would_execute"]
    assert "prune-commits" in dry["would_execute"]
    assert dry["executed"] == []
    assert list_data_files(w.fs, ds) == files_before  # nothing touched

    done = run_maintenance(
        spark, base, fs=w.fs, apply=True, retention_s=0.0, keep_last=3
    )
    assert "compact" in done["executed"]
    # compaction collapsed the small files and materialized the DV
    assert done["results"]["compact"]["datasets"] == [ds[len(base.rstrip('/')) + 1:]]
    after = list_data_files(w.fs, done["results"]["compact"]["path"] + "/" + ds[len(base.rstrip('/')) + 1:])
    assert len(after) < len(files_before)
    from dl_datalake_spark.lake.commitlog import CommitLog
    from dl_datalake_spark.lake.reader import LakeReader

    assert CommitLog(ds, fs=w.fs).dv_at(None) == {}
    got = LakeReader(spark, base).read_dataset(KEY)
    assert got.count() == 6 * 20 - 6 * 2  # prices 18,19 deleted per append
    # the follow-up plan recommends nothing structural
    again = run_maintenance(spark, base, fs=w.fs, keep_last=3, min_file_bytes=1)
    acts = [a for d in again["plan"]["datasets"].values() for a in d["actions"]]
    assert "compact" not in acts and "materialize-dv" not in acts


def test_scoped_compact_touches_only_flagged_dataset(lake, spark):
    """compact(datasets=[...]) swaps the selected dataset DIRECTORY
    only: the other dataset's files, log, and claim history never
    move, and the compacted dataset keeps its version lineage."""
    from dl_datalake_spark.lake.commitlog import CommitLog
    from dl_datalake_spark.lake.maintenance import compact
    from dl_datalake_spark.lake.snapshot import list_data_files

    w, base = lake
    other = DatasetKey("SIM", "SPOT", "OTH", "ticks", "1m")
    for i in range(5):
        w.write_ticks(_rows(spark, n=10, start=T0 + i * 600000), KEY, mode="append")
    w.write_ticks(_rows(spark, n=10), other, mode="append")
    ds, ds_other = w.dataset_path(KEY), w.dataset_path(other)
    frag_before = list_data_files(w.fs, ds)
    other_before = list_data_files(w.fs, ds_other)
    v_before = CommitLog(ds, fs=w.fs).latest_version()

    rel = ds[len(base.rstrip("/")) + 1 :]
    out = compact(spark, base, in_place=True, fs=w.fs, datasets=[rel])
    assert out == base.rstrip("/")
    assert list_data_files(w.fs, ds_other) == other_before  # untouched
    after = list_data_files(w.fs, ds)
    assert len(after) < len(frag_before)
    # version lineage continues (+1 compact commit), data identical
    assert CommitLog(ds, fs=w.fs).latest_version() == v_before + 1
    from dl_datalake_spark.lake.reader import LakeReader

    assert LakeReader(spark, base).read_dataset(KEY).count() == 50

    # unknown dataset name: loud
    with pytest.raises(ValueError, match="unknown dataset"):
        compact(spark, base, fs=w.fs, datasets=["no/such/dataset"])


def test_compact_in_place_refused_on_non_atomic_rename(lake, spark, tmp_path):
    """in_place=True must refuse a store whose rename is copy+delete (a
    mid-swap failure strands the tree); run_maintenance downgrades the
    same situation to a reported skip instead of risking it."""
    from dl_datalake_spark.lake.maintenance import compact, run_maintenance
    from tests.test_fs_matrix import S3LikeFS

    w, base = lake
    for i in range(5):
        w.write_ticks(_rows(spark, n=10, start=T0 + i * 600000), KEY, mode="append")
    s3 = S3LikeFS()
    with pytest.raises(ValueError, match="atomic directory rename"):
        compact(spark, base, in_place=True, fs=s3)
    rep = run_maintenance(spark, base, fs=s3, apply=True, keep_last=1000)
    assert "compact" not in rep["executed"]
    assert "compact" in rep["skipped"]


def test_planner_index_health_recommends_retrain(lake, spark, tmp_path):
    """plan_maintenance(index_paths=[...]) folds ANN/LSH index health in
    (VERDICT r9 #5): a drifted IVF index (every upsert crammed into one
    frozen cell) and a hot-bucket LSH index (duplicate-heavy corpus)
    both surface recommend-only actions with reasons; run_maintenance
    reports them under recommend_only and never executes them."""
    from dl_datalake_spark.lake.maintenance import (
        plan_index_maintenance,
        run_maintenance,
    )
    from dl_datalake_spark.operators.ivf_index import (
        train_ivf,
        upsert_ivf_index,
        write_ivf_index,
    )
    from dl_datalake_spark.operators.lsh_index import write_lsh_index

    w, base = lake
    w.write_ticks(_rows(spark, n=10), KEY)

    # IVF: train on a spread, then upsert 60 near-identical vectors ->
    # one hot cell (max_over_mean blows past 3x)
    vecs = spark.createDataFrame(
        [(i, [float(i % 8 == d) + 0.01 * i for d in range(8)]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    ivf = str(tmp_path / "ivf")
    write_ivf_index(vecs, train_ivf(vecs, num_cells=8, iters=3), ivf)
    hot = spark.createDataFrame(
        [(100 + i, [1.0] + [0.01 * d for d in range(7)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    upsert_ivf_index(spark, hot, ivf)

    # LSH: a corpus where most docs share one text -> one hot bucket
    docs = spark.createDataFrame(
        [(i, "the same duplicated text body repeated across docs") for i in range(40)]
        + [(100 + i, f"unique document number {i} with its own words") for i in range(5)],
        "doc_id long, text string",
    )
    lsh = str(tmp_path / "lsh")
    write_lsh_index(spark, docs, lsh, n_buckets=16)

    rep = plan_index_maintenance(spark, [ivf, lsh])
    assert rep[ivf]["kind"] == "ivf" and "retrain-ivf" in rep[ivf]["actions"]
    assert rep[ivf]["max_over_mean"] > 3.0 and rep[ivf]["reasons"]
    assert rep[lsh]["kind"] == "lsh" and "rebuild-lsh" in rep[lsh]["actions"]
    assert rep[lsh]["hot_group_share"] > 0.5  # 40 of 45 docs share one sig

    out = run_maintenance(
        spark, base, fs=w.fs, apply=True, keep_last=1000,
        min_file_bytes=1, index_paths=[ivf, lsh],
    )
    assert set(out["recommend_only"]) == {ivf, lsh}
    assert "retrain-ivf" not in out["executed"]
    assert "rebuild-lsh" not in out["executed"]
    # nothing executed touched the indexes
    assert rep[ivf]["vectors"] == 84
