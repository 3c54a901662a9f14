"""Measured scaling evidence for the IVF index lifecycle (VERDICT r6 #6).

The O(touched cells) claims for `upsert_ivf_index` / `delete_from_ivf_index`
(operators/ivf_index.py) rest on plan arguments: assignment against
broadcast centroids, read-back restricted to the touched cell partitions,
dynamic overwrite of only those cells. This script turns them into a
measured table across 1x -> 10x -> 100x vector counts (sf0.001/0.01/0.1),
with `num_cells` scaled alongside the corpus the way a real deployment
sizes cells (more data -> more cells, cell size roughly constant per
decade here):

- rebuild: full train+write — the O(index) baseline each maintenance op
  must beat;
- upsert of a FIXED 16-vector batch: shuffle bytes should track the
  rows in the touched cells (batch_cells x corpus/num_cells), NOT the
  index — the op/rebuild byte ratio must FALL as the corpus grows;
- delete of 8 ids: same bound, key-only probe + anti-join rewrite;
- search (16 queries): broadcast centroids + cell-pruned candidate scan.

Usage: python scripts/ivf_scaling.py
Prints one JSON line plus a markdown table (PLANS.md carries the
committed copy under §Round-7).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = "/root/testdata"
# the sf embeddings tables are small (500/500/2000 rows), so the corpus
# axis is built by replicating sf0.1's vectors with disjoint id ranges:
# (label, replication factor, num_cells) -> 2k / 16k / 128k vectors
POINTS = [("1x", 1, 16), ("8x", 8, 64), ("64x", 64, 256)]
BATCH = 16
DELETE_N = 8
QUERIES_N = 16


def _shuffle_totals(spark) -> tuple[int, int]:
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *args)
    w = r = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def _measured(spark, fn):
    w0, r0 = _shuffle_totals(spark)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    w1, r1 = _shuffle_totals(spark)
    return out, round(dt, 3), round((w1 - w0 + r1 - r0) / 1e6, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import (
        delete_from_ivf_index,
        search_ivf_index,
        train_ivf,
        upsert_ivf_index,
        write_ivf_index,
    )
    from dl_datalake_spark.session import get_spark

    spark = get_spark("ivf-scaling")
    spark.range(0, 64).mapInPandas(lambda it: it, schema="id long").count()

    base_emb = spark.read.parquet(
        os.path.join(TESTDATA, "sf0.1", "embeddings.parquet")
    ).select("vec_id", "embedding")
    rows = []
    for sf, factor, num_cells in POINTS:
        emb = base_emb
        for i in range(1, factor):
            emb = emb.unionByName(
                base_emb.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"), "embedding"
                )
            )
        emb = emb.localCheckpoint(eager=True)  # pin: no 64x re-union per op
        n = emb.count()
        work = tempfile.mkdtemp(prefix=f"ivf_scale_{sf}_")
        idx = os.path.join(work, "index")
        try:
            def rebuild():
                cents = train_ivf(emb, num_cells=num_cells)
                write_ivf_index(emb, cents, idx)

            _, t_rebuild, mb_rebuild = _measured(spark, rebuild)

            batch = (
                emb.orderBy("vec_id").limit(BATCH)
                .withColumn("vec_id", F.col("vec_id") + 1_000_000)
            )
            (n_touch, cells_touch), t_up, mb_up = _measured(
                spark,
                lambda: _upsert_with_cells(spark, batch, idx, upsert_ivf_index),
            )

            ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(DELETE_N).collect()]
            n_del, t_del, mb_del = _measured(
                spark, lambda: delete_from_ivf_index(spark, ids, idx)
            )

            q = emb.orderBy(F.desc("vec_id")).limit(QUERIES_N).select(
                "vec_id", "embedding"
            )
            _, t_search, mb_search = _measured(
                spark,
                lambda: search_ivf_index(spark, q, idx, k=10)
                .write.format("noop").mode("overwrite").save(),
            )

            rows.append(
                {
                    "sf": sf, "vectors": n, "num_cells": num_cells,
                    "rebuild_s": t_rebuild, "rebuild_mb": mb_rebuild,
                    "upsert_s": t_up, "upsert_mb": mb_up,
                    "upsert_touched_cells": cells_touch,
                    "upsert_rows_in_cells": n_touch,
                    "upsert_vs_rebuild_mb": round(mb_up / max(mb_rebuild, 1e-9), 4),
                    "delete_s": t_del, "delete_mb": mb_del,
                    "search_s": t_search, "search_mb": mb_search,
                }
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"points": rows}))
    lines = [
        "| sf | vectors | cells | rebuild s / MB | upsert s / MB (cells touched) | upsert÷rebuild MB | delete s / MB | search s / MB |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['sf']} | {r['vectors']} | {r['num_cells']} "
            f"| {r['rebuild_s']} / {r['rebuild_mb']} "
            f"| {r['upsert_s']} / {r['upsert_mb']} ({r['upsert_touched_cells']}) "
            f"| {r['upsert_vs_rebuild_mb']} "
            f"| {r['delete_s']} / {r['delete_mb']} "
            f"| {r['search_s']} / {r['search_mb']} |"
        )
    print("\n".join(lines))


def _upsert_with_cells(spark, batch, idx, upsert):
    n = upsert(spark, batch, idx)
    hist = _latest_upsert_meta(spark, idx)
    return n, hist.get("cells", -1)


def _latest_upsert_meta(spark, idx) -> dict:
    from dl_datalake_spark.lake.commitlog import CommitLog

    log = CommitLog(idx, log_dir=idx.rstrip("/") + "_commits")
    for c in reversed(log.history()):
        if c.get("op") == "upsert":
            return c
    return {}


if __name__ == "__main__":
    main()
