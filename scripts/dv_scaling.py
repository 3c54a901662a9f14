"""Measured evidence for merge-on-read deletion vectors (round 9).

Builds a 12-month OHLC dataset, then runs the SAME small surgical
delete (a handful of rows per month, spread across every partition —
the GDPR-purge shape) under both strategies on identical copies:

- strategy="rewrite" (copy-on-write): every touched partition is
  rewritten;
- strategy="dv" (deletion vectors): a position sidecar is written,
  data files untouched.

Reports per strategy: delete wall time, bytes written by the delete
(new data files + sidecars), files added, and the post-delete full-read
wall time (the DV read pays a broadcast anti-join; the CoW read pays
nothing) — the two sides of the merge-on-read trade the 100 TB story
rests on.  The write ratio is the headline: at 0.01 % selectivity CoW
rewrites ~everything, DV writes ~nothing.

Usage: python scripts/dv_scaling.py [rows_per_month]
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


def _tree_bytes(fs, root: str) -> int:
    total = 0
    try:
        for dirpath, fname in fs.walk_files(root):
            try:
                total += fs.getsize(f"{dirpath}/{fname}")
            except OSError:
                pass
    except OSError:
        pass
    return total


def main() -> None:
    rows_per_month = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.session import get_spark

    spark = get_spark("dv-scaling")
    months = 12
    month_ms = 30 * 86400_000
    t0 = 1672531200000  # 2023-01-01
    key = DatasetKey("SIM", "SPOT", "DVS", "raw", "1m")

    def _build(base: str) -> LakeWriter:
        w = LakeWriter(spark, base)
        for m in range(months):
            start = t0 + m * month_ms
            df = spark.range(rows_per_month).select(
                (F.lit(start) + F.col("id") * (month_ms // rows_per_month))
                .cast("long")
                .alias("ts"),
                (F.rand(seed=m) * 100).alias("open"),
                (F.rand(seed=m + 100) * 100).alias("high"),
                (F.rand(seed=m + 200) * 100).alias("low"),
                (F.rand(seed=m + 300) * 100).alias("close"),
                (F.rand(seed=m + 400) * 10).alias("volume"),
            )
            w.write_ohlc(df, key, mode="append")
        return w

    # two delete shapes:
    # - spread: ~20 rows per month, EVERY partition touched (the GDPR
    #   purge) — worst case for CoW bytes AND for the DV read (every
    #   file carries a vector, the split scan degenerates);
    # - localized: same selectivity but all inside month 0 — the DV'd
    #   files are a sliver of the dataset, so the split scan leaves 11
    #   of 12 months on the untouched fast path.
    stride = rows_per_month // 20
    row_ms = month_ms // rows_per_month
    preds = {
        "spread": F.expr(f"(ts - {t0}) % {month_ms} % {row_ms * stride} = 0"),
        "localized": F.expr(
            f"ts < {t0 + month_ms} AND (ts - {t0}) % {row_ms * (stride // 12)} = 0"
        ),
    }

    results = {}
    for scenario, strategy in [
        (sc, st) for sc in preds for st in ("rewrite", "dv")
    ]:
        pred = preds[scenario]
        base = tempfile.mkdtemp(prefix=f"dv_scale_{strategy}_")
        try:
            w = _build(base)
            ds = w.dataset_path(key)
            before_bytes = _tree_bytes(w.fs, ds)
            from dl_datalake_spark.lake.snapshot import list_data_files

            files_before = set(list_data_files(w.fs, ds))

            t_del0 = time.time()
            res = w.delete_where(key, pred, strategy=strategy)
            t_del = time.time() - t_del0

            files_after = set(list_data_files(w.fs, ds))
            written = _tree_bytes(w.fs, ds) - before_bytes

            # a real aggregate, not count(): count-star on plain parquet
            # is metadata-only, which would flatter CoW — both sides must
            # actually scan for the comparison to mean anything
            r = LakeReader(spark, base)
            t_rd0 = time.time()
            agg = r.read_dataset(key).agg(
                F.count(F.lit(1)).alias("n"), F.sum("close").alias("s")
            ).collect()[0]
            n_after = int(agg["n"])
            t_rd = time.time() - t_rd0

            results[(scenario, strategy)] = {
                "rows_deleted": res.rows,
                "delete_s": round(t_del, 2),
                "bytes_written": written,
                "files_added": len(files_after - files_before),
                "post_read_s": round(t_rd, 2),
                "rows_after": n_after,
                "dataset_bytes": before_bytes,
            }
        finally:
            shutil.rmtree(base, ignore_errors=True)

    print(
        "| shape | strategy | rows deleted | delete s | bytes written "
        "| files added | post-read s |"
    )
    print("|---|---|---|---|---|---|---|")
    summary = {"metric": "dv_vs_cow_delete", "rows_per_month": rows_per_month,
               "months": months}
    for scenario in preds:
        cow = results[(scenario, "rewrite")]
        dv = results[(scenario, "dv")]
        assert cow["rows_after"] == dv["rows_after"], results
        assert cow["rows_deleted"] == dv["rows_deleted"], results
        summary[f"{scenario}_write_bytes_ratio_dv_over_cow"] = round(
            dv["bytes_written"] / max(1, cow["bytes_written"]), 5
        )
        summary[f"{scenario}_cow"] = cow
        summary[f"{scenario}_dv"] = dv
        for name, r_ in (("copy-on-write", cow), ("deletion vectors", dv)):
            print(
                f"| {scenario} | {name} | {r_['rows_deleted']} | {r_['delete_s']} | "
                f"{r_['bytes_written']:,} | {r_['files_added']} | {r_['post_read_s']} |"
            )
    print()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
