"""Two-decade scale evidence for the dedup/text pipeline (VERDICT r11
#4): the 100 TB claims lean hardest on minhash/ngram/simhash/
components, whose guards (stop-shingle corpus FRACTION, max_bucket_docs
hot-bucket cap) are exactly the things that only bite at larger scale —
one decade (scripts/bench_sf1.py) isn't enough to see a quadratic term.

This script amplifies the sf0.1 documents corpus 10x AND 100x with the
structure-preserving transform from scripts/sf1_scaling (doc_id
shifted, every word suffixed per copy — copies are NOT near-duplicates
of each other, so near-dup PAIR DENSITY stays organic and pair counts
scale linearly; plain duplication would inflate pairs quadratically
and measure the wrong thing), then times the five heavy pipeline
queries at all three scales and prints per-decade exponents for BOTH
decades.  ~1.0/decade = linear; a second-decade exponent well above
the first is the guard-interplay signal the VERDICT asks to watch.

Usage: python scripts/dedup_sf10.py [out_json]
Writes artifacts/DEDUP_sf10_round12.json and prints the markdown table
(PLANS.md carries the committed copy).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_groups",
    "docs_decontaminate",
]


def _simhash_adaptive(spark, d):
    """The operator's SCALE path: bits=None lets simhash_pairs pick the
    band width from the corpus count (fixed-width buckets are the
    measured quadratic term; see the round-12 note in
    operators/dedup.py).  The registered dedup_simhash query pins
    bits=32 for oracle reproducibility — this measures the default a
    100 TB run would use."""
    from dl_datalake_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return simhash_pairs(docs, bits=None, bands=4, max_hamming=2)


EXTRA = {"dedup_simhash_adaptive": _simhash_adaptive}


def _amplify_docs(spark, out: str, copies: int) -> None:
    """documents x`copies` with the pair-density-preserving transform;
    every other table is copied verbatim (the dedup queries only read
    documents, but load_table must resolve whatever they touch)."""
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name != "documents.parquet":
            dst = f"{out}/{name}"
            if not os.path.exists(dst):
                shutil.copy(f"{SRC}/{name}", dst)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_did = docs.agg(F.max("doc_id")).first()[0] + 1
    big = (
        spark.range(copies)
        .crossJoin(docs)
        .withColumn("doc_id", F.col("doc_id") + F.col("id") * max_did)
        .withColumn(
            "text",
            F.when(F.col("id") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(
                            w, F.lit("_"), F.col("id").cast("string")
                        ),
                    ),
                )
            ),
        )
        .drop("id")
    )
    big.coalesce(max(8, copies // 4)).write.mode("overwrite").parquet(
        f"{out}/_tmp_documents"
    )
    shutil.move(f"{out}/_tmp_documents", f"{out}/documents.parquet")


def main() -> None:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "DEDUP_sf10_round12.json",
        )
    )
    import tempfile

    from dl_datalake_spark.queries.registry import QUERIES as REG
    from dl_datalake_spark.session import get_spark

    spark = get_spark("dedup-sf10")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_dedup_sf10")
    dirs = {"sf0.1": SRC}
    for label, copies in (("sf1", 10), ("sf10", 100)):
        d = f"{root}/{label}"
        if not os.path.exists(f"{d}/documents.parquet"):
            t0 = time.time()
            _amplify_docs(spark, d, copies)
            print(f"# amplified documents x{copies} -> {d} "
                  f"in {time.time() - t0:.1f}s")
        dirs[label] = d

    all_q = list(QUERIES) + list(EXTRA)
    results: dict[str, dict] = {q: {} for q in all_q}
    for label, d in dirs.items():
        for q in all_q:
            fn = REG.get(q) or EXTRA[q]
            walls = []
            for _ in range(2):  # min of 2: first run pays planning/JIT
                t0 = time.time()
                fn(spark, d).collect()  # small aggregate outputs: collect
                walls.append(time.time() - t0)
            results[q][label] = round(min(walls), 2)
            print(f"# {label} {q}: {results[q][label]}s")

    rows = {}
    for q in all_q:
        t01, t1, t10 = (results[q][k] for k in ("sf0.1", "sf1", "sf10"))
        rows[q] = {
            "sf0.1_s": t01, "sf1_s": t1, "sf10_s": t10,
            "exp_decade1": round(math.log10(t1 / t01), 2),
            "exp_decade2": round(math.log10(t10 / t1), 2),
        }
    artifact = {"queries": rows, "copies": {"sf1": 10, "sf10": 100}}
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))
    print("| query | sf0.1 s | sf1 s | sf10 s | exp decade 1 | exp decade 2 |")
    print("|---|---|---|---|---|---|")
    for q, r in rows.items():
        print(
            f"| {q} | {r['sf0.1_s']} | {r['sf1_s']} | {r['sf10_s']} | "
            f"{r['exp_decade1']} | {r['exp_decade2']} |"
        )


if __name__ == "__main__":
    main()
