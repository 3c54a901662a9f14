"""Measured evidence for incremental LSH index maintenance (round 9).

The cost model behind `apply_cdf_to_lsh`: one CDF batch costs
O(batch signatures) + O(touched-bucket share of the table) — the
touched share is min(|batch|, n_buckets)/n_buckets, so `n_buckets`
is the rewrite-granularity lever exactly like IVF's cell count.
This script builds corpora of growing size and applies two batch
shapes (a 16-doc surgical fix, a 200-doc bulk drain) to each,
reporting apply wall time and the GROSS bytes of the rewritten
buckets next to a from-scratch rebuild.  If the incremental path
were secretly rescanning the corpus, apply time and rewritten share
would track the corpus curve instead of staying flat.

Usage: python scripts/lsh_scaling.py [base_docs ...]
Prints one JSON line + a markdown table (PLANS.md carries the copy).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000, 8_000, 32_000]
    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.lsh_index import (
        apply_cdf_to_lsh,
        write_lsh_index,
    )
    from dl_datalake_spark.session import get_spark

    spark = get_spark("lsh-scaling")

    def _docs(n, start=0):
        # deterministic ~40-word documents with overlapping vocabulary
        return spark.range(start, start + n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}_"), ((F.col("id") * (j + 7)) % 997).cast("string"))
                    for j in range(40)
                ],
            ).alias("text"),
        )

    NB = 512  # bucket count is the rewrite-granularity lever (like IVF cells)

    def _bucket_bytes(idx, buckets):
        total = 0
        for b in buckets:
            total += _tree_bytes(os.path.join(idx, "bands", f"bucket={b}"))
        return total

    rows = []
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"lsh_scale_{n}_")
        try:
            idx = os.path.join(base, "idx")
            t0 = time.time()
            write_lsh_index(spark, _docs(n), idx, n_buckets=NB)
            t_build = time.time() - t0
            b_index = _tree_bytes(idx)

            for label, bn in (("surgical-16", 16), ("bulk-200", 200)):
                changes = _docs(bn).withColumn(
                    "text", F.concat(F.col("text"), F.lit(" changed"))
                ).select(
                    "doc_id", "text",
                    F.lit("update_postimage").alias("_change_type"),
                    F.lit(1).cast("long").alias("commit_version"),
                )
                touched = [
                    int(r["b"])
                    for r in changes.select(
                        F.pmod(F.xxhash64("doc_id"), F.lit(NB)).alias("b")
                    ).distinct().collect()
                ]
                touched_bytes = _bucket_bytes(idx, touched)
                t0 = time.time()
                apply_cdf_to_lsh(spark, changes, idx)
                t_apply = time.time() - t0
                rows.append(
                    {
                        "corpus": n,
                        "batch": label,
                        "build_s": round(t_build, 2),
                        "index_bytes": b_index,
                        "apply_s": round(t_apply, 2),
                        "touched_buckets": len(touched),
                        "rewritten_bytes": touched_bytes,
                        "rewritten_share": round(touched_bytes / max(1, b_index), 4),
                    }
                )
        finally:
            shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({"metric": "lsh_incremental_scaling", "n_buckets": NB, "rows": rows}))
    print()
    print("| corpus docs | batch | rebuild s | index bytes | apply s | buckets rewritten | rewritten bytes | share |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['corpus']:,} | {r['batch']} | {r['build_s']} | {r['index_bytes']:,} | "
            f"{r['apply_s']} | {r['touched_buckets']}/{NB} | {r['rewritten_bytes']:,} | "
            f"{r['rewritten_share']} |"
        )


if __name__ == "__main__":
    main()
