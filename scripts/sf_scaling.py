"""Cross-SF scaling evidence for the heavy dedup/curation pipelines.

The 100 TB claims elsewhere rest on plan-shape arguments (bucketed
equi-joins, no cartesian pair generation).  This script turns one of
them into a measured curve: it times the three heaviest corpus
pipelines at sf0.001 -> sf0.01 -> sf0.1 (10x data per step) and records
the total shuffle WRITE/READ bytes each run moved (from the Spark
status store, summed across the run's stages).  Near-linear growth in
both time and shuffle bytes per decade is what the LSH/bucket-join
design promises; a quadratic candidate explosion would show up as a
slope near 2.

Usage: python scripts/sf_scaling.py [runs_per_point]
Prints one JSON line and a ready-to-paste markdown table (PLANS.md
carries the committed copy).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["dedup_minhash_lsh", "dedup_ngram_jaccard", "docs_curation_pipeline"]
# small-aggregate output must be collect()ed, not count()ed — see
# scripts/scale_experiment.py for the Catalyst-pruning rationale
COLLECT_QUERIES = {"docs_curation_pipeline"}
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TESTDATA = "/root/testdata"


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


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from dl_datalake_spark.queries import QUERIES as REGISTRY
    from dl_datalake_spark.session import get_spark

    spark = get_spark("sf-scaling")
    spark.range(0, 64).mapInPandas(lambda it: it, schema="id long").count()

    results: dict[str, dict[str, dict[str, float]]] = {q: {} for q in QUERIES}
    for sf in SFS:
        sf_dir = os.path.join(TESTDATA, sf)
        n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        for q in QUERIES:
            best_t = None
            bytes_w = bytes_r = 0
            for _ in range(runs):
                spark.catalog.clearCache()
                w0, r0 = _shuffle_totals(spark)
                t0 = time.time()
                df = REGISTRY[q](spark, sf_dir)
                if q in COLLECT_QUERIES:
                    df.collect()
                else:
                    df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                w1, r1 = _shuffle_totals(spark)
                if best_t is None or dt < best_t:
                    best_t = dt
                    bytes_w, bytes_r = w1 - w0, r1 - r0
            results[q][sf] = {
                "sec": round(best_t, 3),
                "shuffle_write_mb": round(bytes_w / 1e6, 2),
                "shuffle_read_mb": round(bytes_r / 1e6, 2),
                "docs": n_docs,
            }

    # per-decade slopes: log10(t_next/t_prev) over one 10x data step;
    # 1.0 = linear, 2.0 = quadratic
    slopes = {}
    for q in QUERIES:
        ts = [max(results[q][sf]["sec"], 1e-3) for sf in SFS]
        bs = [max(results[q][sf]["shuffle_write_mb"], 1e-3) for sf in SFS]
        slopes[q] = {
            "time_slope_001_01": round(math.log10(ts[1] / ts[0]), 3),
            "time_slope_01_1": round(math.log10(ts[2] / ts[1]), 3),
            "shuffle_slope_01_1": round(math.log10(bs[2] / bs[1]), 3),
        }
    print(json.dumps({"results": results, "slopes": slopes}))

    lines = [
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | shuffle-write MB (0.001/0.01/0.1) | time slope 0.01→0.1 |",
        "|---|---|---|---|---|---|",
    ]
    for q in QUERIES:
        r = results[q]
        lines.append(
            f"| `{q}` | {r['sf0.001']['sec']} | {r['sf0.01']['sec']} | {r['sf0.1']['sec']} "
            f"| {r['sf0.001']['shuffle_write_mb']} / {r['sf0.01']['shuffle_write_mb']} / {r['sf0.1']['shuffle_write_mb']} "
            f"| {slopes[q]['time_slope_01_1']} |"
        )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
