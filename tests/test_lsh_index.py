"""Persisted MinHash-LSH band index (operators/lsh_index.py): batch
build, incremental CDF application, candidate pairs from persisted
state, exactly-once replay skip, streamed == rebuilt equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.operators.dedup import minhash_lsh_pairs
from dl_datalake_spark.operators.lsh_index import (
    apply_cdf_to_lsh,
    lsh_index_pairs,
    read_lsh_index,
    write_lsh_index,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 0
    (2, "completely different text about distributed query engines"),
    (3, "completely different text about distributed query engines ok"),
    (4, "yet another unrelated document mentioning apache spark sql"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def _changes(spark, rows, ct, cv=1):
    return _docs(spark, rows).select(
        "doc_id", "text", F.lit(ct).alias("_change_type"),
        F.lit(cv).cast("long").alias("commit_version"),
    )


def test_build_matches_batch_operator(tmp_path, spark):
    docs = _docs(spark)
    idx = str(tmp_path / "lsh")
    rep = write_lsh_index(spark, docs, idx, n_buckets=8)
    assert rep["rows"] == 5 * 8  # 8 bands per doc
    got = {
        (r["id_a"], r["id_b"]) for r in lsh_index_pairs(spark, idx).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, max_df_frac=None).collect()
    }
    assert got == want and (0, 1) in got


def test_apply_insert_update_delete(tmp_path, spark):
    idx = str(tmp_path / "lsh")
    write_lsh_index(spark, _docs(spark), idx, n_buckets=8)
    # insert a new dup of doc 4, update doc 2 to duplicate doc 3's
    # text, delete doc 0
    changes = (
        _changes(spark, [(5, DOCS[4][1])], "insert", cv=1)
        .unionByName(_changes(spark, [(2, DOCS[3][1])], "update_postimage", cv=2))
        .unionByName(_changes(spark, [(0, DOCS[0][1])], "delete", cv=3))
    )
    rep = apply_cdf_to_lsh(spark, changes, idx)
    assert not rep["skipped"] and rep["removed"] == 2  # docs 0 and 2 had rows
    bands = read_lsh_index(spark, idx)
    assert bands.where(F.col("doc_id") == 0).count() == 0
    got = {(r["id_a"], r["id_b"]) for r in lsh_index_pairs(spark, idx).collect()}
    # the streamed state equals a from-scratch rebuild of the final corpus
    final_rows = [(1, DOCS[0][1]), (2, DOCS[3][1]), (3, DOCS[3][1]),
                  (4, DOCS[4][1]), (5, DOCS[4][1])]
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(_docs(spark, final_rows), max_df_frac=None).collect()
    }
    assert got == want and (2, 3) in got and (4, 5) in got and (0, 1) not in got


def test_apply_newest_commit_wins_within_batch(tmp_path, spark):
    idx = str(tmp_path / "lsh")
    write_lsh_index(spark, _docs(spark), idx, n_buckets=8)
    # one drained batch: doc 9 inserted (cv=1) then deleted (cv=2)
    changes = _changes(spark, [(9, "short lived doc")], "insert", cv=1).unionByName(
        _changes(spark, [(9, "short lived doc")], "delete", cv=2)
    )
    apply_cdf_to_lsh(spark, changes, idx)
    assert read_lsh_index(spark, idx).where(F.col("doc_id") == 9).count() == 0


def test_apply_same_commit_update_beats_delete(tmp_path, spark):
    """ts-moving update_where emits a delete pre-image AND an
    update_postimage for the SAME doc at the SAME commit_version; the
    live image must win DETERMINISTICALLY (ordering on commit_version
    alone ties, and an arbitrary winner can silently drop a live doc
    from the index)."""
    idx = str(tmp_path / "lsh")
    write_lsh_index(spark, _docs(spark), idx, n_buckets=8)
    changes = _changes(spark, [(2, DOCS[2][1])], "delete", cv=5).unionByName(
        _changes(spark, [(2, DOCS[3][1])], "update_postimage", cv=5)
    )
    apply_cdf_to_lsh(spark, changes, idx)
    bands = read_lsh_index(spark, idx)
    assert bands.where(F.col("doc_id") == 2).count() == 8  # still indexed
    # and the indexed content is the POST-image (duplicates doc 3 now)
    got = {(r["id_a"], r["id_b"]) for r in lsh_index_pairs(spark, idx).collect()}
    assert (2, 3) in got


def test_apply_txn_replay_skipped(tmp_path, spark):
    idx = str(tmp_path / "lsh")
    write_lsh_index(spark, _docs(spark), idx, n_buckets=8)
    ch = _changes(spark, [(7, "new doc about lakehouse formats")], "insert")
    r1 = apply_cdf_to_lsh(spark, ch, idx, txn=("app", 0))
    r2 = apply_cdf_to_lsh(spark, ch, idx, txn=("app", 0))
    assert not r1["skipped"] and r2["skipped"]
    assert read_lsh_index(spark, idx).where(F.col("doc_id") == 7).count() == 8


def test_apply_requires_build(tmp_path, spark):
    with pytest.raises(ValueError, match="no committed LSH build"):
        apply_cdf_to_lsh(
            spark, _changes(spark, [(1, "x")], "insert"), str(tmp_path / "none")
        )


def test_stream_cdf_into_lsh_end_to_end(tmp_path, spark):
    import shutil

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.streaming.ingest import stream_cdf_into_lsh

    base = str(tmp_path / "lake")
    idx = str(tmp_path / "lsh")
    ckpt = str(tmp_path / "ckpt")
    key = DatasetKey("SIM", "SPOT", "DOCS", "ticks", "1m")
    T0 = 1672574400000
    w = LakeWriter(spark, base, emit_cdf=True)
    df = spark.createDataFrame(
        [(T0 + i * 60000, i, t) for i, (_, t) in enumerate(DOCS)],
        "ts long, doc_id long, text string",
    )
    w.write_ticks(df, key)                                             # v0
    w.delete_where(key, F.col("doc_id") == 0, strategy="dv")           # v1
    write_lsh_index(
        spark, spark.createDataFrame([], "doc_id long, text string"), idx, n_buckets=8
    )
    ds = w.dataset_path(key)
    q = stream_cdf_into_lsh(spark, ds, idx, ckpt, app_id="t1")
    q.awaitTermination(120)
    got = {(r["id_a"], r["id_b"]) for r in lsh_index_pairs(spark, idx).collect()}
    final_rows = [(i, t) for i, (_, t) in enumerate(DOCS) if i != 0]
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(_docs(spark, final_rows), max_df_frac=None).collect()
    }
    assert got == want
    # replay under the same lineage after more commits: only the delta applies
    w.write_ticks(
        spark.createDataFrame([(T0 + 9 * 60000, 9, DOCS[2][1])],
                              "ts long, doc_id long, text string"),
        key, mode="append",
    )                                                                  # v2
    q2 = stream_cdf_into_lsh(spark, ds, idx, ckpt, app_id="t1")
    q2.awaitTermination(120)
    got2 = {(r["id_a"], r["id_b"]) for r in lsh_index_pairs(spark, idx).collect()}
    assert (2, 9) in got2 and got2 >= got
