"""Two-decade scale evidence for the similarity/embedding pipeline —
the companion of scripts/dedup_sf10.py for the OTHER pillar of the
100 TB claims (ANN search, knn join, semantic dedup).

Amplification is a per-copy SIGN-FLIP mask: copy c of vector v is
v ⊙ s_c with s_c[i] = ±1 from xxhash64(c, i).  This preserves every
norm and every WITHIN-copy cosine exactly (s_i² = 1), while cross-copy
cosines become pseudo-random around 0 — so neighbor structure and
near-dup pair density stay organic and pair counts scale linearly,
where naive duplication would make every copy a perfect neighbor and
measure the wrong (quadratic) thing.

Expected shapes, from the operators' own designs:
- emb_cosine_topk / emb_knn_join: FIXED query sets (1 / 20 vectors)
  against a growing corpus -> linear per decade.
- emb_ann_lsh: hyperplane-bucketed candidates -> sub-linear.
- emb_ivf_topk: index build (linear) + probed search -> ~linear.
- emb_semantic_dedup_drops: the exact all-pairs BLAS baseline is
  O(n²/block) BY DESIGN (operators/similarity.py:273 documents the
  shuffle shape) — it is the accuracy baseline, not the scale path;
  its exponent is expected ~2.0/decade and the harness records it so
  the number is measured, not assumed.  The scale path for semantic
  dedup at 100 TB is the LSH/IVF candidate generation.

Usage: python scripts/emb_sf10.py [out_json]
Writes artifacts/EMB_sf10_round12.json and prints the markdown table
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
    "emb_cosine_topk",
    "emb_knn_join",
    "emb_ann_lsh",
    "emb_ivf_topk",
    "emb_semantic_dedup_drops",
]


def _amplify_embeddings(spark, out: str, copies: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name != "embeddings.parquet":
            dst = f"{out}/{name}"
            if not os.path.exists(dst):
                shutil.copy(f"{SRC}/{name}", dst)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_id = emb.agg(F.max("vec_id")).first()[0] + 1
    big = (
        spark.range(copies)
        .crossJoin(emb)
        .withColumn("vec_id", F.col("vec_id") + F.col("id") * max_id)
        .withColumn(
            "embedding",
            F.when(F.col("id") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        * F.when(
                            F.pmod(F.xxhash64(F.col("id"), i), F.lit(2)) == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                    ).cast("float"),
                )
            ),
        )
        .drop("id")
    )
    big.coalesce(max(4, copies // 8)).write.mode("overwrite").parquet(
        f"{out}/_tmp_embeddings"
    )
    shutil.move(f"{out}/_tmp_embeddings", f"{out}/embeddings.parquet")


def main() -> None:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "EMB_sf10_round12.json",
        )
    )
    import tempfile

    from dl_datalake_spark.queries.registry import QUERIES as REG
    from dl_datalake_spark.session import get_spark

    spark = get_spark("emb-sf10")
    root = os.path.join(tempfile.gettempdir(), "spark_graft_emb_sf10")
    dirs = {"sf0.1": SRC}
    for label, copies in (("sf1", 10), ("sf10", 100)):
        d = f"{root}/{label}"
        if not os.path.exists(f"{d}/embeddings.parquet"):
            t0 = time.time()
            _amplify_embeddings(spark, d, copies)
            print(f"# amplified embeddings x{copies} -> {d} "
                  f"in {time.time() - t0:.1f}s")
        dirs[label] = d

    results: dict[str, dict] = {q: {} for q in QUERIES}
    for label, d in dirs.items():
        for q in QUERIES:
            fn = REG[q]
            walls = []
            for _ in range(2):  # min of 2: first run pays planning/JIT
                t0 = time.time()
                fn(spark, d).collect()
                walls.append(time.time() - t0)
            results[q][label] = round(min(walls), 2)
            print(f"# {label} {q}: {results[q][label]}s", flush=True)

    rows = {}
    for q in QUERIES:
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
