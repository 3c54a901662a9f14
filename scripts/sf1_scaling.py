"""One-decade-up scale evidence: sf0.1 -> sf1 (VERDICT r9 #6).

The repo's scaling claims were measured up to sf0.1 plus synthetic 64x
sweeps; this script pushes the headline relational queries and the
heavy lifecycle pipelines ONE MORE DECADE to catch driver-side
constants (multilog closure, listing walks, union-find caps) before
they matter.

No sf1 testdata ships, so the script AMPLIFIES sf0.1 tenfold into a
temp dir with structure-preserving shifts:

- `lineitem`/`orders`: order keys shifted per copy (joins to the
  unamplified customer/supplier/part dimensions keep working; fact
  rows scale 10x — the TPC-H shape of a bigger SF);
- `events`: user_id shifted per copy (group cardinality scales like a
  real SF; per-bucket arithmetic stays integer-exact);
- `documents`: doc_id shifted AND every word suffixed with the copy
  index — copies are NOT near-duplicates of each other, so the
  near-dup PAIR DENSITY stays that of the organic corpus and pair
  counts scale linearly (plain 10x duplication would inflate pairs
  quadratically and measure the wrong thing);
- `embeddings`: vec_id shifted, one coordinate perturbed per copy.

For each query it records wall time and the run's shuffle-write bytes
(Spark status store) at both scales and prints the per-decade
exponents (log10 of the ratio): ~1 = linear, ~2 = quadratic blowup.

Usage: python scripts/sf1_scaling.py [out_dir]
Prints one JSON line + a ready-to-paste markdown table (PLANS.md
carries the committed copy).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10
QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "q21_sole_late_supplier",
    "dedup_minhash_lsh",
    "dedup_survivors",
    "docs_stream_cdf_lsh",
    "events_delete_dv",
]
# small-aggregate outputs must be collect()ed (Catalyst prunes skeleton
# plans under count() — scripts/scale_experiment.py)
COLLECT = set(QUERIES)


def _amplify(spark, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    small = [
        "region", "nation", "customer", "supplier", "part", "partsupp",
    ]
    for t in small:
        src = f"{SRC}/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")

    def _write(df, name):
        df.coalesce(8).write.mode("overwrite").parquet(f"{out}/_tmp_{name}")
        # driver contract reads <table>.parquet as a path; a directory
        # works for spark AND duckdb-glob, but keep the layout identical
        # to testdata: single dir named <table>.parquet
        shutil.move(f"{out}/_tmp_{name}", f"{out}/{name}.parquet")

    ords = spark.read.parquet(f"{SRC}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    max_ok = ords.agg(F.max("o_orderkey")).first()[0] + 1
    _write(
        spark.range(COPIES).crossJoin(ords).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("id") * max_ok
        ).drop("id"),
        "orders",
    )
    _write(
        spark.range(COPIES).crossJoin(li).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("id") * max_ok
        ).drop("id"),
        "lineitem",
    )
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_uid = ev.agg(F.max("user_id")).first()[0] + 1
    _write(
        spark.range(COPIES).crossJoin(ev).withColumn(
            "user_id", F.col("user_id") + F.col("id") * max_uid
        ).drop("id"),
        "events",
    )
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_did = docs.agg(F.max("doc_id")).first()[0] + 1
    _write(
        spark.range(COPIES).crossJoin(docs)
        .withColumn("doc_id", F.col("doc_id") + F.col("id") * max_did)
        .withColumn(
            "text",
            F.when(F.col("id") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit("_"), F.col("id").cast("string")),
                    ),
                )
            ),
        )
        .drop("id"),
        "documents",
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_vid = emb.agg(F.max("vec_id")).first()[0] + 1
    _write(
        spark.range(COPIES).crossJoin(emb)
        .withColumn("vec_id", F.col("vec_id") + F.col("id") * max_vid)
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: x + F.when(i == 0, F.col("id") * 0.001).otherwise(0.0),
            ),
        )
        .drop("id"),
        "embeddings",
    )


def _shuffle_write(spark) -> int:
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *args)
    return sum(stages.apply(i).shuffleWriteBytes() for i in range(stages.size()))


def main() -> None:
    from dl_datalake_spark.queries.registry import QUERIES as REG
    from dl_datalake_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sf1_")
    spark = get_spark("sf1-scaling")
    sf1 = os.path.join(out_dir, "sf1")
    if not os.path.exists(f"{sf1}/lineitem.parquet"):
        t0 = time.time()
        _amplify(spark, sf1)
        print(f"# amplified sf0.1 x{COPIES} -> {sf1} in {time.time() - t0:.1f}s")

    results: dict = {}
    for name in QUERIES:
        fn = REG[name]
        row = {}
        for label, d in (("sf0.1", SRC), ("sf1", sf1)):
            fn(spark, d).count()  # warm (plan + IO caches), untimed
            w0 = _shuffle_write(spark)
            t0 = time.time()
            res = fn(spark, d)
            if name in COLLECT:
                res.collect()
            else:
                res.write.format("noop").mode("overwrite").save()
            row[label] = round(time.time() - t0, 2)
            row[f"{label}_shuffle_mb"] = round((_shuffle_write(spark) - w0) / 1e6, 1)
        tr = row["sf1"] / row["sf0.1"] if row["sf0.1"] else float("nan")
        sr = (
            row["sf1_shuffle_mb"] / row["sf0.1_shuffle_mb"]
            if row["sf0.1_shuffle_mb"]
            else float("nan")
        )
        row["time_exp"] = round(math.log10(tr), 2) if tr == tr and tr > 0 else None
        row["shuffle_exp"] = round(math.log10(sr), 2) if sr == sr and sr > 0 else None
        results[name] = row
        print(f"# {name}: {row}")

    print(json.dumps({"sf1_dir": sf1, "copies": COPIES, "results": results}))
    print("\n| query | t sf0.1 (s) | t sf1 (s) | time exp/decade | shuffle sf0.1 (MB) | shuffle sf1 (MB) | shuffle exp/decade |")
    print("|---|---|---|---|---|---|---|")
    for n, r in results.items():
        print(
            f"| {n} | {r['sf0.1']} | {r['sf1']} | {r['time_exp']} "
            f"| {r['sf0.1_shuffle_mb']} | {r['sf1_shuffle_mb']} | {r['shuffle_exp']} |"
        )


if __name__ == "__main__":
    main()
