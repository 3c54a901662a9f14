"""CLI over DataLakeClient — the reference's Typer surface
(`cli.py:13-217`) re-expressed with argparse (stdlib-only).

Commands: init, ingest, ingest-ticks, read, symbols, aggregate,
verify, audit, delete, export.
"""

from __future__ import annotations

import argparse
import json
import sys

from dl_datalake_spark.client import DataLakeClient
from dl_datalake_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dl-datalake-spark")
    p.add_argument("--base", required=True, help="lake base path")
    p.add_argument(
        "--emit-cdf",
        action="store_true",
        help="write a row-level change feed with every commit "
        "(read back via `change-feed`)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("init")

    ing = sub.add_parser("ingest")
    ing.add_argument("source")
    ing.add_argument("--exchange", required=True)
    ing.add_argument("--market", default="SPOT")
    ing.add_argument("--symbol", required=True)
    ing.add_argument("--period", default="1m")

    tick = sub.add_parser("ingest-ticks")
    tick.add_argument("source")
    tick.add_argument("--exchange", required=True)
    tick.add_argument("--market", default="SPOT")
    tick.add_argument("--symbol", required=True)

    rd = sub.add_parser("read")
    rd.add_argument("--exchange", required=True)
    rd.add_argument("--symbol", required=True)
    rd.add_argument("--start")
    rd.add_argument("--end")
    rd.add_argument("--limit", type=int, default=5)

    rda = sub.add_parser(
        "read-at", help="time travel: the dataset exactly as of a commit version"
    )
    rda.add_argument("--exchange", required=True)
    rda.add_argument("--symbol", required=True)
    rda.add_argument("--version", type=int, required=True)
    rda.add_argument("--market", default="SPOT")
    rda.add_argument("--data-type", default="raw")
    rda.add_argument("--period", default="1m")
    rda.add_argument("--limit", type=int, default=5)

    rst = sub.add_parser(
        "restore", help="roll a dataset back to a commit version (Delta RESTORE)"
    )
    rst.add_argument("--exchange", required=True)
    rst.add_argument("--symbol", required=True)
    rst.add_argument("--version", type=int, required=True)
    rst.add_argument("--market", default="SPOT")
    rst.add_argument("--data-type", default="raw")
    rst.add_argument("--period", default="1m")

    rsl = sub.add_parser(
        "restore-lake",
        help="roll EVERY dataset of a multi-commit back atomically "
        "(write-side inverse of the consistent multi-read)",
    )
    rsl.add_argument("--txid", required=True)

    qt = sub.add_parser(
        "quarantine", help="list a dataset's quarantined rows (expectations)"
    )
    qt.add_argument("--exchange", required=True)
    qt.add_argument("--symbol", required=True)
    qt.add_argument("--market", default="SPOT")
    qt.add_argument("--data-type", default="raw")
    qt.add_argument("--period", default="1m")
    qt.add_argument("--limit", type=int, default=20)

    sub.add_parser("symbols")

    agg = sub.add_parser("aggregate")
    agg.add_argument("--exchange", required=True)
    agg.add_argument("--market", default="SPOT")
    agg.add_argument("--symbol", required=True)
    agg.add_argument("--source-period", default="1m")
    agg.add_argument("--target-period", default="15m")

    ver = sub.add_parser("verify")
    ver.add_argument("--exchange", required=True)
    ver.add_argument("--symbol", required=True)

    sub.add_parser("audit")

    dele = sub.add_parser("delete")
    dele.add_argument("--symbol", required=True)

    dr = sub.add_parser(
        "delete-rows", help="row-level delete: rewrite only touched partitions"
    )
    dr.add_argument("--exchange", required=True)
    dr.add_argument("--symbol", required=True)
    dr.add_argument("--data-type", default="raw")
    dr.add_argument("--market", default="SPOT")
    dr.add_argument("--period", default="1m")
    dr.add_argument("--where", default=None, help="SQL predicate over the dataset's rows")
    dr.add_argument("--start-ms", type=int, default=None)
    dr.add_argument("--end-ms", type=int, default=None)
    dr.add_argument(
        "--strategy", default="rewrite", choices=["rewrite", "dv"],
        help="rewrite = copy-on-write touched partitions; dv = merge-on-read "
        "deletion vectors (no data file rewritten)",
    )

    ur = sub.add_parser(
        "update-rows", help="row-level UPDATE ... SET over a dataset"
    )
    ur.add_argument("--exchange", required=True)
    ur.add_argument("--symbol", required=True)
    ur.add_argument("--data-type", default="raw")
    ur.add_argument("--market", default="SPOT")
    ur.add_argument("--period", default="1m")
    ur.add_argument("--where", required=True, help="SQL predicate selecting rows")
    ur.add_argument(
        "--set", required=True, action="append", metavar="COL=EXPR",
        help="assignment (repeatable), e.g. --set 'close=close*1.01'",
    )
    ur.add_argument("--strategy", default="rewrite", choices=["rewrite", "dv"])

    rc = sub.add_parser(
        "rename-column",
        help="metadata-only column rename via column mapping (zero files rewritten)",
    )
    for a in (rc,):
        a.add_argument("--exchange", required=True)
        a.add_argument("--symbol", required=True)
        a.add_argument("--data-type", default="raw")
        a.add_argument("--market", default="SPOT")
        a.add_argument("--period", default="1m")
    rc.add_argument("--from", dest="old", required=True, metavar="OLD")
    rc.add_argument("--to", dest="new", required=True, metavar="NEW")

    dc = sub.add_parser(
        "drop-column",
        help="metadata-only column drop (physical name retired; no resurrection)",
    )
    dc.add_argument("--exchange", required=True)
    dc.add_argument("--symbol", required=True)
    dc.add_argument("--data-type", default="raw")
    dc.add_argument("--market", default="SPOT")
    dc.add_argument("--period", default="1m")
    dc.add_argument("--column", required=True)

    sc = sub.add_parser(
        "schema", help="the dataset's commit-logged schema contract (optionally AS OF a version)"
    )
    sc.add_argument("--exchange", required=True)
    sc.add_argument("--symbol", required=True)
    sc.add_argument("--data-type", default="raw")
    sc.add_argument("--market", default="SPOT")
    sc.add_argument("--period", default="1m")
    sc.add_argument("--version", type=int, default=None)

    pg = sub.add_parser(
        "purge-rows",
        help="ATOMIC cross-dataset delete (deletion vectors, one multilog "
        "epoch) — the GDPR 'remove user X everywhere' shape",
    )
    pg.add_argument("--where", required=True, help="SQL predicate over every dataset's rows")
    pg.add_argument("--exchange", default=None)
    pg.add_argument("--market", default=None)
    pg.add_argument("--data-type", default=None)

    exp = sub.add_parser("export")
    exp.add_argument("--exchange", required=True)
    exp.add_argument("--symbol", required=True)
    exp.add_argument("--out", required=True)
    exp.add_argument("--period", default="1m")
    exp.add_argument("--resample-to", default=None)

    sql = sub.add_parser(
        "sql",
        help="Spark SQL; lake.<exchange>_<symbol>_<data_type>_<period> "
        "names resolve directly (VERSION AS OF n / TIMESTAMP AS OF 'ts' "
        "time travel included)",
    )
    sql.add_argument("--view", action="append", default=[],
                     help="NAME=EXCHANGE/SYMBOL[/DATA_TYPE] dataset view to register")
    sql.add_argument("--tables", action="store_true",
                     help="list addressable lake.<name> tables and exit")
    sql.add_argument("query", nargs="?", default=None)

    flow = sub.add_parser("pipeline")
    flow.add_argument("--source", required=True)
    flow.add_argument("--exchange", required=True)
    flow.add_argument("--market", default="spot")
    flow.add_argument("--symbol", required=True)

    bf = sub.add_parser("backfill", help="parallel history backfill via the exchange data source")
    bf.add_argument("--symbols", required=True, help="comma-separated symbol list")
    bf.add_argument("--exchange", default="SYNTH")
    bf.add_argument("--timeframe-ms", type=int, default=60_000)
    bf.add_argument("--start-ms", type=int, default=None)
    bf.add_argument("--end-ms", type=int, default=None)

    rfr = sub.add_parser("refresh", help="incremental multi-symbol rollup refresh")
    rfr.add_argument("--exchange", required=True)
    rfr.add_argument("--target-period", default="15m")
    rfr.add_argument("--cdc", action="store_true",
                     help="per-symbol commit-log-driven refresh: also rebuilds "
                          "buckets for backfills into OLD months, which the "
                          "watermark path cannot see")
    rfr.add_argument("--market", default="SPOT")
    rfr.add_argument("--source-period", default="1m")

    qr = sub.add_parser(
        "query", help="run a registered analytics query against a table dir"
    )
    qr.add_argument("name", help="query name, or 'list' to enumerate")
    qr.add_argument("--sf-dir", default=None, help="directory with the parquet tables")
    qr.add_argument("--limit", type=int, default=20)
    qr.add_argument(
        "--explain", action="store_true",
        help="print the formatted physical plan instead of rows",
    )

    zo = sub.add_parser(
        "cluster",
        help="Z-order rewrite of a parquet path for multi-column data skipping",
    )
    zo.add_argument("--path", required=True, help="parquet directory to rewrite")
    zo.add_argument("--out", required=True, help="output directory")
    zo.add_argument("--cols", required=True, help="comma-separated numeric columns")
    zo.add_argument("--files", type=int, default=64)

    ix = sub.add_parser(
        "index",
        help="build or search a persistent IVF ANN index over an embedding table",
    )
    ix.add_argument("action", choices=["build", "search", "upsert", "fsck", "repair"])
    ix.add_argument("--vectors", default=None, help="parquet with (vec_id, embedding); required for build/search/upsert")
    ix.add_argument("--index", required=True, help="index directory")
    ix.add_argument("--cells", type=int, default=16)
    ix.add_argument("--iters", type=int, default=3)
    ix.add_argument("--k", type=int, default=5)
    ix.add_argument("--nprobe", type=int, default=2)
    ix.add_argument("--query-ids", default=None, help="comma-separated vec_ids (search)")

    ex = sub.add_parser(
        "expect",
        help="evaluate declarative data-quality expectations against a parquet path",
    )
    ex.add_argument("--path", required=True, help="parquet file/dir to validate")
    ex.add_argument(
        "--rules",
        required=True,
        help=(
            "JSON list of constraints, e.g. "
            '[{"type":"not_null","col":"ts"},'
            '{"type":"range","col":"px","lo":0,"hi":100},'
            '{"type":"values","col":"sym","values":["BTC"]},'
            '{"type":"matches","col":"sym","regex":"^[A-Z]+$"},'
            '{"type":"unique","cols":["ts"]}]'
        ),
    )
    ex.add_argument("--enforce", choices=["report", "fail"], default="report")

    hist = sub.add_parser(
        "history", help="catalog snapshot history / point-in-time read"
    )
    hist.add_argument("--at", type=int, default=None,
                      help="epoch-µs: print the catalog as of this instant")
    hist.add_argument("--limit", type=int, default=20)

    skw = sub.add_parser(
        "skew", help="hot-key report for a parquet path and key columns"
    )
    skw.add_argument("--path", required=True)
    skw.add_argument("--keys", required=True, help="comma-separated key columns")
    skw.add_argument("--top", type=int, default=10)

    mt = sub.add_parser(
        "maintain",
        help="lake maintenance: small-file compaction and/or orphan vacuum",
    )
    mt.add_argument(
        "action",
        choices=[
            "plan", "auto", "compact", "vacuum", "vacuum-tombstones",
            "prune-commits", "fold-multilog", "recluster",
        ],
    )
    mt.add_argument("--path", help="recluster: one dataset directory")
    mt.add_argument("--index", action="append", default=[],
                    help="plan/auto: ANN/LSH index directory to health-check "
                         "(repeatable; recommendations only, never auto-run)")
    mt.add_argument("--cols", help="recluster: comma-separated Z-order columns")
    mt.add_argument("--files-per-partition", type=int, default=1)
    mt.add_argument("--in-place", action="store_true",
                    help="compact into the live tree instead of a staged swap")
    mt.add_argument("--apply", action="store_true",
                    help="vacuum: actually delete (default is dry-run report)")
    mt.add_argument("--keep-last", type=int, default=100,
                    help="prune-commits: finalized commit files to retain per dataset")
    mt.add_argument("--retention-s", type=float, default=7 * 86400.0,
                    help="vacuum-tombstones: min age before a superseded "
                         "data file may be reclaimed (Delta-style horizon)")

    cu = sub.add_parser(
        "curate",
        help="training-data curation: dedup -> quality/repetition filter -> "
        "deterministic sample -> split -> sharded parquet",
    )
    cu.add_argument("--docs", required=True, help="parquet with (doc_id, text, lang, source)")
    cu.add_argument("--out", required=True, help="output dir (split=/shard= parquet)")
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument("--max-rep", type=float, default=0.2, help="max duplicate-3-gram ratio")
    cu.add_argument("--sample-cutoff", default="cc", help="md5-hex keep cutoff (cc = 80%%)")
    cu.add_argument("--shards", type=int, default=8)

    cm = sub.add_parser(
        "commits",
        help="show a dataset's optimistic commit-log history (who wrote what, when)",
    )
    cm.add_argument("--exchange", required=True)
    cm.add_argument("--market", default="SPOT")
    cm.add_argument("--symbol", required=True)
    cm.add_argument("--data-type", default="raw")
    cm.add_argument("--period", default="1m")
    cm.add_argument("--limit", type=int, default=50)

    cf = sub.add_parser(
        "change-feed",
        help="row-level change feed (insert/update_postimage/delete rows per "
        "commit; lake must be written with CDF emission on)",
    )
    cf.add_argument("--exchange", required=True)
    cf.add_argument("--market", default="SPOT")
    cf.add_argument("--symbol", required=True)
    cf.add_argument("--data-type", default="raw")
    cf.add_argument("--period", default="1m")
    cf.add_argument("--after-version", type=int, default=-1)
    cf.add_argument("--limit", type=int, default=1000)

    srv = sub.add_parser("serve", help="run the REST API (Flask) over this lake")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8000)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("dl-datalake-spark-cli")
    client = DataLakeClient(spark, args.base, emit_cdf=getattr(args, "emit_cdf", False))

    if args.cmd == "init":
        client.manifest.load()  # materializes an empty catalog
        print(f"initialized lake at {args.base}")
    elif args.cmd == "ingest":
        res = client.ingest_csv(args.source, args.exchange, args.market, args.symbol, args.period)
        print(json.dumps({"path": res.path, "rows": res.rows, "time_from": res.time_from, "time_to": res.time_to}))
    elif args.cmd == "ingest-ticks":
        res = client.ingest_ticks_csv(args.source, args.exchange, args.market, args.symbol)
        print(json.dumps({"path": res.path, "rows": res.rows}))
    elif args.cmd == "read":
        df = client.read_ohlc(args.exchange, args.symbol, args.start, args.end)
        df.show(args.limit, truncate=False)
    elif args.cmd == "read-at":
        df = client.read_ohlc_at(
            args.exchange, args.symbol, args.version,
            market=args.market, data_type=args.data_type, period=args.period,
        )
        df.show(args.limit, truncate=False)
    elif args.cmd == "restore":
        res = client.restore_ohlc(
            args.exchange, args.symbol, args.version,
            market=args.market, data_type=args.data_type, period=args.period,
        )
        print(json.dumps({"restored_to": args.version, "rows": res.rows,
                          "partitions": res.partitions}))
    elif args.cmd == "restore-lake":
        out = client.restore_lake(args.txid)
        print(json.dumps({
            "restored_to_txid": args.txid,
            "datasets": {s: {"rows": r.rows, "txid": r.txid} for s, r in out.items()},
        }))
    elif args.cmd == "quarantine":
        from dl_datalake_spark.lake.paths import DatasetKey

        df = client.reader.quarantine_table(
            DatasetKey(args.exchange, args.market, args.symbol,
                       args.data_type, args.period)
        )
        df.show(args.limit, truncate=False)
    elif args.cmd == "symbols":
        print(json.dumps(client.list_symbols()))
    elif args.cmd == "aggregate":
        res = client.aggregate_ohlc(
            args.exchange, args.market, args.symbol, args.source_period, args.target_period
        )
        print(json.dumps({"path": res.path, "rows": res.rows}))
    elif args.cmd == "verify":
        rep = client.verify(args.exchange, args.symbol)
        print(json.dumps(rep.__dict__))
    elif args.cmd == "audit":
        print(json.dumps(client.audit()))
    elif args.cmd == "delete":
        print(json.dumps({"deleted": client.delete_dataset(symbol=args.symbol)}))
    elif args.cmd == "delete-rows":
        print(
            json.dumps(
                client.delete_rows(
                    args.exchange,
                    args.symbol,
                    data_type=args.data_type,
                    market=args.market,
                    period=args.period,
                    where=args.where,
                    start_ms=args.start_ms,
                    end_ms=args.end_ms,
                    strategy=args.strategy,
                )
            )
        )
    elif args.cmd == "update-rows":
        sets = {}
        for item in args.set:
            col, eq, expr = item.partition("=")
            if not eq or not col.strip():
                raise SystemExit(f"--set needs COL=EXPR, got {item!r}")
            sets[col.strip()] = expr
        print(
            json.dumps(
                client.update_rows(
                    args.exchange,
                    args.symbol,
                    where=args.where,
                    set=sets,
                    data_type=args.data_type,
                    market=args.market,
                    period=args.period,
                    strategy=args.strategy,
                )
            )
        )
    elif args.cmd == "rename-column":
        print(json.dumps(client.rename_column(
            args.exchange, args.symbol, args.old, args.new,
            data_type=args.data_type, market=args.market, period=args.period,
        )))
    elif args.cmd == "drop-column":
        print(json.dumps(client.drop_column(
            args.exchange, args.symbol, args.column,
            data_type=args.data_type, market=args.market, period=args.period,
        )))
    elif args.cmd == "schema":
        print(json.dumps(client.dataset_schema(
            args.exchange, args.symbol, data_type=args.data_type,
            market=args.market, period=args.period, version=args.version,
        )))
    elif args.cmd == "purge-rows":
        print(
            json.dumps(
                client.purge_rows(
                    args.where,
                    exchange=args.exchange,
                    market=args.market,
                    data_type=args.data_type,
                )
            )
        )
    elif args.cmd == "export":
        client.export_ohlc(
            args.out,
            args.exchange,
            args.symbol,
            period=args.period,
            resample_to=args.resample_to,
        )
        print(json.dumps({"out": args.out}))
    elif args.cmd == "sql":
        if args.tables:
            print(json.dumps(client.sql_tables()))
        else:
            if args.query is None:
                raise SystemExit("sql: a query (or --tables) is required")
            for spec in args.view:
                name, rest = spec.split("=", 1)
                parts = rest.split("/")
                client.register_view(name, parts[0], parts[1], *(parts[2:3] or ["raw"]))
            client.sql(args.query).show(100, truncate=False)
    elif args.cmd == "pipeline":
        from dl_datalake_spark.flows import ingest_pipeline_flow

        out = ingest_pipeline_flow(client, args.source, args.exchange, args.market, args.symbol)
        print(json.dumps({"rows": out["ingest"].rows,
                          "aggregates": {k: v.rows for k, v in out["aggregates"].items()}}))
    elif args.cmd == "backfill":
        from dl_datalake_spark.flows import backfill_flow

        out = backfill_flow(
            client,
            [s.strip() for s in args.symbols.split(",") if s.strip()],
            timeframe_ms=args.timeframe_ms,
            start_ms=args.start_ms,
            end_ms=args.end_ms,
            exchange=args.exchange,
        )
        print(json.dumps({sym: res.rows for sym, res in out.items()}))
    elif args.cmd == "refresh":
        if args.cdc:
            results = {}
            for sym in client.reader.list_symbols(args.exchange):
                res = client.refresh_rollup_cdc(
                    args.exchange, args.market, sym,
                    args.source_period, args.target_period,
                )
                results[sym] = 0 if res is None else res.rows
            print(json.dumps(results))
        else:
            out = client.refresh_rollup_all(args.exchange, target_period=args.target_period)
            print(json.dumps({sym: res.rows for sym, res in out.items()}))
    elif args.cmd == "query":
        from dl_datalake_spark.queries import QUERIES

        if args.name == "list":
            print(json.dumps(sorted(QUERIES)))
        else:
            if args.sf_dir is None:
                raise SystemExit("--sf-dir is required to run a query")
            df = QUERIES[args.name](spark, args.sf_dir)
            if args.explain:
                df.explain("formatted")
            else:
                df.show(args.limit, truncate=False)
    elif args.cmd == "cluster":
        from dl_datalake_spark.lake.clustering import zorder_rewrite

        cols = [c.strip() for c in args.cols.split(",") if c.strip()]
        zorder_rewrite(spark.read.parquet(args.path), cols, args.out, num_files=args.files)
        print(json.dumps({"out": args.out, "cols": cols, "files": args.files}))
    elif args.cmd == "index":
        from pyspark.sql import functions as F

        from dl_datalake_spark.operators.ivf_index import (
            fsck_ivf_index,
            repair_ivf_index,
            search_ivf_index,
            train_ivf,
            upsert_ivf_index,
            write_ivf_index,
        )

        if args.action == "fsck":
            bad = fsck_ivf_index(spark, args.index)
            rows = bad.orderBy("vec_id").limit(1000).collect()
            print(json.dumps({
                "index": args.index,
                "stale_vec_ids": len(rows),
                "violations": [
                    {"vec_id": r["vec_id"], "n_copies": r["n_copies"],
                     "cells": list(r["cells"]), "live_cell": r["live_cell"]}
                    for r in rows
                ],
            }))
            return 0
        if args.action == "repair":
            removed = repair_ivf_index(spark, args.index)
            print(json.dumps({"index": args.index, "stale_removed": removed}))
            return 0
        if not args.vectors:
            raise SystemExit("--vectors is required for build/search/upsert")
        vecs = spark.read.parquet(args.vectors)
        if args.action == "build":
            cents = train_ivf(vecs, num_cells=args.cells, iters=args.iters)
            write_ivf_index(vecs, cents, args.index)
            print(json.dumps({"index": args.index, "cells": args.cells,
                              "vectors": vecs.count()}))
        elif args.action == "upsert":
            n = upsert_ivf_index(spark, vecs, args.index)
            print(json.dumps({"index": args.index, "upserted_batch": vecs.count(),
                              "rows_in_touched_cells": n}))
        else:
            q = vecs
            if args.query_ids:
                ids = [int(x) for x in args.query_ids.split(",") if x.strip()]
                q = vecs.where(F.col("vec_id").isin(ids))
            res = search_ivf_index(
                spark, q, args.index, k=args.k, nprobe=args.nprobe
            )
            res.show(100, truncate=False)
    elif args.cmd == "commits":
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(args.exchange, args.market, args.symbol, args.data_type, args.period)
        hist = client.writer.commit_log(key).history()
        print(json.dumps({"dataset": client.writer.dataset_path(key),
                          "commits": hist[-args.limit:]}))
    elif args.cmd == "change-feed":
        feed, cursor = client.read_change_feed(
            args.exchange,
            args.symbol,
            after_version=args.after_version,
            market=args.market,
            data_type=args.data_type,
            period=args.period,
        )
        page, cursor, truncated = client.paginate_change_feed(feed, cursor, args.limit)
        rows = (
            []
            if page is None
            else [r.asDict() for r in page.orderBy("commit_version", "ts").collect()]
        )
        print(json.dumps(
            {"cursor": cursor, "n": len(rows), "truncated": truncated, "changes": rows}
        ))
    elif args.cmd == "maintain":
        if args.action == "plan":
            from dl_datalake_spark.lake.maintenance import plan_maintenance

            print(json.dumps(plan_maintenance(
                spark, args.base, index_paths=args.index or None
            )))
        elif args.action == "auto":
            from dl_datalake_spark.lake.maintenance import run_maintenance

            print(
                json.dumps(
                    run_maintenance(
                        spark, args.base, apply=args.apply,
                        retention_s=args.retention_s,
                        keep_last=args.keep_last,
                        index_paths=args.index or None,
                    )
                )
            )
        elif args.action == "compact":
            from dl_datalake_spark.lake.maintenance import compact

            out = compact(
                spark, args.base,
                target_files_per_partition=args.files_per_partition,
                in_place=args.in_place,
            )
            print(json.dumps({"compacted": out}))
        elif args.action == "vacuum-tombstones":
            from dl_datalake_spark.lake.maintenance import vacuum_tombstones

            rep = vacuum_tombstones(
                spark, args.base, retention_s=args.retention_s,
                dry_run=not args.apply,
            )
            print(json.dumps({
                "dry_run": not args.apply,
                "removed": len(rep["removed"]),
                "retained": len(rep["retained"]),
                **rep,
            }))
        elif args.action == "prune-commits":
            from dl_datalake_spark.lake.maintenance import prune_commit_logs

            rep = prune_commit_logs(spark, args.base, keep_last=args.keep_last)
            print(json.dumps({"keep_last": args.keep_last,
                              "files_removed": sum(rep.values()), "datasets": rep}))
        elif args.action == "fold-multilog":
            from dl_datalake_spark.lake.fs import get_fs
            from dl_datalake_spark.lake.multilog import MultiCommitLog

            # resolve the filesystem from the base's scheme like every
            # sibling action — the LocalFS default would silently fold
            # nothing on s3a://gs:// bases (listdir OSError swallowed)
            rep = MultiCommitLog(args.base, fs=get_fs(args.base, spark)).fold(
                keep_last=args.keep_last
            )
            print(json.dumps(rep))
        elif args.action == "recluster":
            from dl_datalake_spark.lake.maintenance import recluster

            if not args.path or not args.cols:
                raise SystemExit("recluster needs --path and --cols")
            rep = recluster(
                spark,
                args.path,
                [c.strip() for c in args.cols.split(",")],
                files_per_month=args.files_per_partition,
                base_path=args.base,
            )
            print(json.dumps(rep))
        else:
            from dl_datalake_spark.lake.maintenance import vacuum

            rep = vacuum(spark, args.base, client.manifest, dry_run=not args.apply)
            print(json.dumps({"dry_run": not args.apply, **rep}))
    elif args.cmd == "curate":
        from dl_datalake_spark.operators.curation import (
            curate_corpus,
            shard_for_training,
        )

        docs = spark.read.parquet(args.docs)
        kept = curate_corpus(
            docs,
            min_quality=args.min_quality,
            max_rep_micros=int(args.max_rep * 1_000_000),
            sample_cutoff=args.sample_cutoff,
        )
        sharded = shard_for_training(kept, args.shards)
        # one job: splits and shards fan out as partition directories
        sharded.write.partitionBy("split", "shard").mode("overwrite").parquet(args.out)
        from pyspark.sql import functions as F

        summary = {
            f"{r['split']}/{r['lang']}": {"n_docs": r["n"], "tokens": r["toks"]}
            for r in spark.read.parquet(args.out)
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
            .collect()
        }
        print(json.dumps({"out": args.out, "n_in": docs.count(),
                          "n_kept": kept.count(), "splits": summary}, sort_keys=True))
    elif args.cmd == "expect":
        from dl_datalake_spark.lake.expectations import (
            accepted_range,
            accepted_values,
            check,
            matches,
            not_null,
            unique,
        )

        builders = {
            "not_null": lambda r: not_null(r["col"]),
            "range": lambda r: accepted_range(r["col"], r["lo"], r["hi"]),
            "values": lambda r: accepted_values(r["col"], r["values"]),
            "matches": lambda r: matches(r["col"], r["regex"]),
            "unique": lambda r: unique(*r["cols"]),
        }
        exps = [builders[r["type"]](r) for r in json.loads(args.rules)]
        rep = check(spark.read.parquet(args.path), exps, enforce=args.enforce)
        print(json.dumps([row.asDict() for row in rep.collect()]))
    elif args.cmd == "history":
        if args.at is not None:
            client.manifest.load_at(args.at).orderBy("id").show(
                args.limit, truncate=False
            )
        else:
            print(json.dumps(client.manifest.snapshots()))
    elif args.cmd == "skew":
        from dl_datalake_spark.operators.skew import skew_report

        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
        skew_report(spark.read.parquet(args.path), keys, top_n=args.top).show(
            args.top, truncate=False
        )
    elif args.cmd == "serve":
        from dl_datalake_spark.api import create_app

        create_app(client).run(host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
