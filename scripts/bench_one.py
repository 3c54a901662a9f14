"""Isolated per-query bench: same methodology as bench.py (shared
session, cache cleared per rep, min of N cold reps, noop sink for the
row-heavy queries) but for an arbitrary subset of queries, so an
optimization can be A/B-measured without paying for the whole suite.

    python scripts/bench_one.py q21_sole_late_supplier dedup_minhash_lsh
    SPARK_GRAFT_BENCH_REPS=5 python scripts/bench_one.py q1_pricing_summary
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import NOOP_SINK  # noqa: E402
from dl_datalake_spark.queries import QUERIES  # noqa: E402
from dl_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    names = sys.argv[1:]
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        total_bytes = sum(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        parts = max(8, min(cpus, total_bytes // (64 << 20) + 1))
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(parts)
    spark = get_spark("dl-datalake-spark-bench-one")
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    spark.range(0, spark.sparkContext.defaultParallelism * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    times: dict[str, float] = {}
    alltimes: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_one:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if name in NOOP_SINK:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.time() - t0, 3))
        times[name] = min(runs)
        alltimes[name] = runs
    print(json.dumps({"queries": times, "runs": alltimes, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
