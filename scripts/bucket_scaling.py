"""Measured evidence for the point-lookup bucket index (round 9).

Builds the SAME 12-month dataset twice — once through a plain writer,
once with `bucket_by={"user_id": 16}` — then times an equality lookup
(`point={"user_id": v}`) on each and counts the files entering the
plan.  min/max stats can't prune this shape (user_id is uniform inside
every file), so the plain dataset plans everything; the bucketed one
plans ~1/16 of the files before any footer RPC.

Usage: python scripts/bucket_scaling.py [rows_per_month]
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


def main() -> None:
    rows_per_month = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.session import get_spark

    spark = get_spark("bucket-scaling")
    months = 12
    month_ms = 30 * 86400_000
    t0 = 1672531200000
    key = DatasetKey("SIM", "SPOT", "BKT", "ticks", "1m")
    target = 7 * 17_636  # = 123452: id 17636's user id, present in every month

    results = {}
    for variant, bucket_by in (("plain", None), ("bucketed", {"user_id": 16})):
        base = tempfile.mkdtemp(prefix=f"bucket_scale_{variant}_")
        try:
            w = LakeWriter(spark, base, bucket_by=bucket_by)
            for m in range(months):
                start = t0 + m * month_ms
                df = spark.range(rows_per_month).select(
                    (F.lit(start) + F.col("id") * (month_ms // rows_per_month))
                    .cast("long")
                    .alias("ts"),
                    (F.col("id") * 7 % 1_000_003).cast("long").alias("user_id"),
                    (F.col("id").cast("double") / 3).alias("value"),
                )
                w.write_ticks(df, key, mode="append")
            r = LakeReader(spark, base)
            n_total = len(r.read_dataset(key).inputFiles())
            t_q0 = time.time()
            pt = r.read_dataset(key, point={"user_id": target})
            n_planned = len(pt.inputFiles())
            n_rows = pt.count()
            t_q = time.time() - t_q0
            results[variant] = {
                "files_total": n_total,
                "files_planned": n_planned,
                "rows": n_rows,
                "lookup_s": round(t_q, 2),
            }
        finally:
            shutil.rmtree(base, ignore_errors=True)

    assert results["plain"]["rows"] == results["bucketed"]["rows"], results
    out = {
        "metric": "bucket_point_lookup",
        "rows_per_month": rows_per_month,
        "months": months,
        **{f"{k}_{kk}": vv for k, v in results.items() for kk, vv in v.items()},
    }
    print(json.dumps(out))
    print()
    print("| layout | files total | files planned | lookup s | rows |")
    print("|---|---|---|---|---|")
    for name, r_ in results.items():
        print(
            f"| {name} | {r_['files_total']} | {r_['files_planned']} | "
            f"{r_['lookup_s']} | {r_['rows']} |"
        )


if __name__ == "__main__":
    main()
