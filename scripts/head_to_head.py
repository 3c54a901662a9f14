"""Full-registry head-to-head: Spark vs the DuckDB oracle, same host.

For every registry entry with an oracle, run both engines (min of
`reps`) and write HEADTOHEAD.md — the per-query evidence behind the
aggregate claim in PLANS.md. DuckDB gets all cores (its default);
Spark runs the same session config bench.py uses.

Usage: python scripts/head_to_head.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from dl_datalake_spark.queries.registry import ORACLE_SQL, QUERIES  # noqa: E402
from dl_datalake_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# streaming queries run a full micro-batch pipeline per call — timing
# them against a SQL oracle measures checkpoint setup, not the engine
SKIP = {"events_stream_tumbling", "events_stream_session", "events_stream_interval_join",
        "events_stateful_running_stats",
        # round 8: run checkpointed streams (twice, with a wipe) per call
        "events_stream_append_once",
        # round 9: trains an IVF index then runs TWO checkpointed CDF
        # streams (with a wipe between) per call — times checkpoint
        # setup and index builds, not the engine
        "emb_stream_cdf_ivf",
        # round 9 second wave: same two-checkpointed-streams shape for
        # the LSH dedup index
        "docs_stream_cdf_lsh",
        # lake_appends source: checkpointed stream per call
        "events_stream_appends",
        # round 11: checkpointed lake_appends stream per call
        "events_stream_rename"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    suffix = sys.argv[4] if len(sys.argv) > 4 else ""
    spark = get_spark("head-to-head")
    con = duckdb.connect()
    for t in TABLES:
        f = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(f):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")

    only_excludes = bool(only) and next(iter(only)).startswith("!")
    if only_excludes:
        only = {n.lstrip("!") for n in only}
    rows = []
    for name in sorted(ORACLE_SQL):
        if name in SKIP or name not in QUERIES:
            continue
        if only is not None and ((name in only) == only_excludes):
            continue
        QUERIES[name](spark, sf_dir).collect()  # warm (plan + IO cache)
        s_best = d_best = None
        for rep in range(reps):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            s = time.time() - t0
            s_best = s if s_best is None else min(s_best, s)
            if d_best is None or d_best < 10:  # don't re-run slow oracles
                t0 = time.time()
                con.sql(ORACLE_SQL[name]).fetchall()
                d = time.time() - t0
                d_best = d if d_best is None else min(d_best, d)
        rows.append((name, d_best, s_best))
        print(f"{name}: duckdb={d_best:.2f}s spark={s_best:.2f}s", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"HEADTOHEAD{suffix}.md")
    d_tot = sum(r[1] for r in rows)
    s_tot = sum(r[2] for r in rows)
    with open(out, "w") as f:
        f.write(
            "# HEADTOHEAD — every oracled query, Spark vs DuckDB\n\n"
            f"Same host, same parquet ({sf_dir}), min of {reps} warm runs.\n"
            "DuckDB is the reference's own engine family (in-process\n"
            "vectorized); the `x` column is duckdb/spark (>1 = Spark\n"
            "faster). Streaming entries are skipped (they time checkpoint\n"
            "setup, not query execution). Throwaway-lake LIFECYCLE entries\n"
            "(events_time_travel*, events_restore*, events_lake_history,\n"
            "events_*_read, events_quarantine_requeue, ...) ARE included:\n"
            "their Spark side builds+commits a lake per run while their\n"
            "oracle is a trivial SELECT, so their `x` is a floor on\n"
            "commit-scaffolding cost, not an engine comparison — the bench\n"
            "headline excludes them for the same reason.\n\n"
            f"**Totals: DuckDB {d_tot:.1f} s, Spark {s_tot:.1f} s "
            f"over {len(rows)} queries — ratio {d_tot / s_tot:.2f}×.**\n\n"
            "| query | DuckDB s | Spark s | x |\n|---|---|---|---|\n"
        )
        for name, d, s in sorted(rows, key=lambda r: -(r[1] / r[2])):
            f.write(f"| {name} | {d:.2f} | {s:.2f} | {d / s:.2f} |\n")
    print(f"wrote {out}: duckdb {d_tot:.1f}s spark {s_tot:.1f}s")


if __name__ == "__main__":
    main()
