"""Measured evidence for per-file ts-stat skipping (round 7).

Builds a 24-month OHLC dataset via 24 monthly commits (the natural
ingest cadence — each commit's files carry their [min_ts, max_ts]
stats), then times a one-week bounded `read_range` against the same
read with the skipping index stripped (stats removed from the commit
log, partition layout and files identical).  Reports wall time, files
entering the plan, and bytes scanned per the Spark status store.

Usage: python scripts/skip_scaling.py [rows_per_month]
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


def _input_bytes(spark) -> int:
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *args)
    return sum(stages.apply(i).inputBytes() for i in range(stages.size()))


def main() -> None:
    rows_per_month = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.session import get_spark

    spark = get_spark("skip-scaling")
    key = DatasetKey("SIM", "SPOT", "SKIP", "raw", "1m")
    base = tempfile.mkdtemp(prefix="skip_scale_")
    try:
        w = LakeWriter(spark, base)
        month_ms = 30 * 86400_000
        t0 = 1672531200000  # 2023-01-01
        for m in range(24):
            start = t0 + m * month_ms
            df = spark.range(rows_per_month).select(
                (F.lit(start) + F.col("id") * (month_ms // rows_per_month))
                .cast("long").alias("ts"),
                F.rand(seed=m).alias("open"), F.rand(seed=m + 1).alias("high"),
                F.rand(seed=m + 2).alias("low"), F.rand(seed=m + 3).alias("close"),
                F.rand(seed=m + 4).alias("volume"),
            )
            w.write_ohlc(df, key, mode="append")
        r = LakeReader(spark, base)
        log = w.commit_log(key)
        n_live = len(log.latest_files())

        def timed_read():
            df = r.read_range("SIM", "SKIP", start_date="2023-06-01", end_date="2023-06-08")
            b0 = _input_bytes(spark)
            t = time.time()
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t, _input_bytes(spark) - b0, len(df.inputFiles())

        timed_read()  # warm
        s_skip, b_skip, f_skip = timed_read()

        # strip the skipping index in place: same files, same partitions
        for v in log._entries():
            p = f"{log.log_dir}/{v:020d}.json"
            e = json.loads(open(p).read())
            if e.pop("file_stats", None) is not None:
                open(p, "w").write(json.dumps(e))
        timed_read()  # warm
        s_full, b_full, f_full = timed_read()

        # -- second axis (round 8): COLUMN-bounded skipping on a
        # z-order-reclustered dataset. recluster() records per-file
        # [min, max] of the clustered columns in the commit index, so a
        # close-bounded read prunes files before any footer RPC; the
        # control is the same reclustered layout with col_stats
        # stripped (footer pruning still applies within scanned files —
        # the delta isolates the COMMIT-INDEX skip).
        from dl_datalake_spark.lake.maintenance import recluster

        recluster(spark, w.dataset_path(key), ["ts", "close"], files_per_month=4)
        n_live2 = len(log.latest_files())

        def timed_col_read():
            df = r.read_dataset(key, bounds={"close": (0.0, 0.05)})
            b0 = _input_bytes(spark)
            t = time.time()
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t, _input_bytes(spark) - b0, len(df.inputFiles())

        timed_col_read()  # warm
        s_col, b_col, f_col = timed_col_read()
        for v in log._entries():
            p = f"{log.log_dir}/{v:020d}.json"
            e = json.loads(open(p).read())
            if e.pop("col_stats", None) is not None:
                open(p, "w").write(json.dumps(e))
        timed_col_read()  # warm
        s_col0, b_col0, f_col0 = timed_col_read()

        # -- third axis (round 9): WRITE-TIME clustering. cluster_by
        # range-partitions each ingest batch on the stats columns, so
        # freshly written files are skippable with NO recluster rewrite.
        # Control: the same unsorted monthly ingests with stats_cols
        # only — stats recorded but every file spans the close domain,
        # so the commit-index skip prunes nothing.
        def ingest_months(writer, key_, months=12):
            for m in range(months):
                start = t0 + m * month_ms
                df = spark.range(rows_per_month).select(
                    (F.lit(start) + F.col("id") * (month_ms // rows_per_month))
                    .cast("long").alias("ts"),
                    F.rand(seed=m).alias("open"), F.rand(seed=m + 1).alias("high"),
                    F.rand(seed=m + 2).alias("low"), F.rand(seed=m + 3).alias("close"),
                    F.rand(seed=m + 4).alias("volume"),
                )
                writer.write_ohlc(df, key_, mode="append")

        key_cl = DatasetKey("SIM", "SPOT", "SKIPCL", "raw", "1m")
        key_un = DatasetKey("SIM", "SPOT", "SKIPUN", "raw", "1m")
        w_cl = LakeWriter(spark, base, cluster_by=["close"], cluster_files_per_month=4)
        w_un = LakeWriter(spark, base, stats_cols=["close"])
        ingest_months(w_cl, key_cl)
        ingest_months(w_un, key_un)
        n_cl = len(w_cl.commit_log(key_cl).latest_files())
        n_un = len(w_un.commit_log(key_un).latest_files())

        def timed_col_read_on(key_):
            df = r.read_dataset(key_, bounds={"close": (0.0, 0.05)})
            b0 = _input_bytes(spark)
            t = time.time()
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t, _input_bytes(spark) - b0, len(df.inputFiles())

        timed_col_read_on(key_cl)  # warm
        s_wc, b_wc, f_wc = timed_col_read_on(key_cl)
        timed_col_read_on(key_un)  # warm
        s_wu, b_wu, f_wu = timed_col_read_on(key_un)

        out = {
            "live_files": n_live,
            "skip": {"s": round(s_skip, 3), "mb_in": round(b_skip / 1e6, 1), "files": f_skip},
            "no_skip": {"s": round(s_full, 3), "mb_in": round(b_full / 1e6, 1), "files": f_full},
            "live_files_reclustered": n_live2,
            "col_skip": {"s": round(s_col, 3), "mb_in": round(b_col / 1e6, 1), "files": f_col},
            "col_no_skip": {"s": round(s_col0, 3), "mb_in": round(b_col0 / 1e6, 1), "files": f_col0},
            "live_files_clustered_ingest": n_cl,
            "live_files_unclustered_ingest": n_un,
            "write_clustered": {"s": round(s_wc, 3), "mb_in": round(b_wc / 1e6, 1), "files": f_wc},
            "write_unclustered": {"s": round(s_wu, 3), "mb_in": round(b_wu / 1e6, 1), "files": f_wu},
        }
        print(json.dumps(out))
        print("| variant | files in plan | input MB | wall s |")
        print("|---|---|---|---|")
        print(f"| ts stats skipping | {f_skip} / {n_live} | {out['skip']['mb_in']} | {s_skip:.2f} |")
        print(f"| ts stats stripped | {f_full} / {n_live} | {out['no_skip']['mb_in']} | {s_full:.2f} |")
        print(f"| close col_stats (reclustered) | {f_col} / {n_live2} | {out['col_skip']['mb_in']} | {s_col:.2f} |")
        print(f"| close col_stats stripped | {f_col0} / {n_live2} | {out['col_no_skip']['mb_in']} | {s_col0:.2f} |")
        print(f"| write-time cluster_by ingest (no recluster) | {f_wc} / {n_cl} | {out['write_clustered']['mb_in']} | {s_wc:.2f} |")
        print(f"| unclustered ingest, stats_cols only | {f_wu} / {n_un} | {out['write_unclustered']['mb_in']} | {s_wu:.2f} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
