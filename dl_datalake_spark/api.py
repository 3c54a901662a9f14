"""REST serving surface — the engine analogue of the reference's
FastAPI server (`client/api_server.py`) and UI backend routers
(`dl-datalake-ui/backend/routers/{data,features,ingest}.py`), on Flask
(the HTTP framework available here; the app is framework-thin either
way — every route is a few lines over DataLakeClient).

Route parity map (reference → here):
- GET  /read          api_server.py:58-82       time-range OHLC rows
- GET  /symbols       api_server.py (list)      distinct symbols
- GET  /datasets      UI data.py:20-88          manifest list + pagination
- GET  /preview       UI data.py:90-151         paged rows from one dataset
- GET  /features      api_server.py:174-208     feature-set → versions
- GET  /features/<id> UI features.py:256+       feature metadata by id
- GET  /features/<id>/download  UI features.py:225-250  feature bytes
- POST /ingest/file   UI ingest.py:58-120       CSV → lake
- POST /ingest/download        UI ingest.py:208-216  queue one symbol download
- POST /ingest/bulk-download   UI ingest.py:218-236  queue many symbols
- GET  /ingest/status          UI ingest.py:204-206  task registry snapshot
- GET  /exchanges              UI ingest.py:238-243  supported exchanges
- GET  /exchanges/<id>/markets UI ingest.py:245-268  market types of one exchange
- GET  /exchanges/<id>/symbols UI ingest.py:270-289  active symbols of one market
- POST /export        UI data.py:154-239        terminal CSV export
- POST /export/batch  UI data.py:378-442        all symbols of an exchange
- DELETE /datasets    UI ingest.py:324-363      manifest+files delete
- GET  /health        api_server.py             liveness

JSON discipline: DataFrames are serialized row-wise via collect() on
ALREADY-paginated/limited results only — no route ever collects an
unbounded dataset (the reference's /read returns the full range;
here `limit` defaults to 10,000 and is capped, because a lake at
100 TB will happily return a billion rows to a typo'd date range).
"""

from __future__ import annotations

from typing import Any

from dl_datalake_spark.client import DataLakeClient

MAX_LIMIT = 100_000
DEFAULT_LIMIT = 10_000


def _rows(df) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.collect()]


def _task_dict(task) -> dict[str, Any]:
    return {
        "task_id": task.task_id,
        "exchange": task.exchange,
        "symbol": task.symbol,
        "status": task.status,
        "rows": task.rows,
        "error": task.error,
    }


def create_app(client: DataLakeClient, download_manager=None, catalog=None):
    """`download_manager` (sources/download_manager.py) powers the
    async download routes; `catalog` (sources/catalog.py) powers
    exchange/market/symbol discovery. Both optional — routes return
    503 when the corresponding backend wasn't wired, so a read-only
    deployment doesn't need connector credentials."""
    from flask import Flask, jsonify, request

    app = Flask("dl_datalake_spark")

    def bounded_limit() -> int:
        return min(int(request.args.get("limit", DEFAULT_LIMIT)), MAX_LIMIT)

    @app.get("/health")
    def health():
        return jsonify({"status": "ok", "spark": client.spark.version})

    @app.get("/read")
    def read():
        args = request.args
        try:
            df = client.read_ohlc(
                exchange=args["exchange"],
                symbol=args["symbol"],
                start=args.get("start"),
                end=args.get("end"),
                data_type=args.get("data_type", "raw"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        limit = bounded_limit()
        data = _rows(df.limit(limit))
        return jsonify({"rows": data, "count": len(data), "limit": limit})

    @app.get("/symbols")
    def symbols():
        return jsonify({"symbols": client.list_symbols(request.args.get("exchange"))})

    @app.get("/datasets")
    def datasets():
        args = request.args
        entries = client.manifest.list_entries(
            symbol=args.get("symbol"),
            data_type=args.get("data_type"),
            exchange=args.get("exchange"),
            market=args.get("market"),
            timeframe=args.get("timeframe"),
        )
        offset = int(args.get("offset", 0))
        limit = bounded_limit()
        total = entries.count()
        page = _rows(entries.offset(offset).limit(limit))
        return jsonify({"total": total, "offset": offset, "entries": page})

    @app.get("/datasets/commits")
    def dataset_commits():
        """A dataset's optimistic commit-log history (version, mode,
        rows, time range, committed_at) — the write-audit surface the
        commit log gives for free."""
        args = request.args
        try:
            from dl_datalake_spark.lake.paths import DatasetKey

            key = DatasetKey(
                args["exchange"],
                args.get("market", "SPOT"),
                args["symbol"],
                args.get("data_type", "raw"),
                args.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        hist = client.writer.commit_log(key).history()
        limit = bounded_limit()
        return jsonify(
            {
                "dataset": client.writer.dataset_path(key),
                "total": len(hist),
                "commits": hist[-limit:],
            }
        )

    @app.get("/read-at")
    def read_at():
        """Time travel (Delta ``VERSION AS OF``): the dataset exactly as
        of a commit version — `/datasets/commits` lists the versions."""
        args = request.args
        try:
            df = client.read_ohlc_at(
                exchange=args["exchange"],
                symbol=args["symbol"],
                version=int(args["version"]),
                market=args.get("market", "SPOT"),
                data_type=args.get("data_type", "raw"),
                period=args.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        except ValueError as exc:
            # nonexistent version / pruned history: client error, loud
            return jsonify({"error": str(exc)}), 422
        limit = bounded_limit()
        data = _rows(df.limit(limit))
        return jsonify({"rows": data, "count": len(data), "limit": limit})

    @app.get("/read-multi")
    def read_multi():
        """Several symbols at ONE consistent cut (lake/multilog.py): a
        multi-dataset commit is visible in every returned symbol or in
        none — cross-symbol analytics never mix epochs mid-ingest."""
        args = request.args
        try:
            symbols_arg = [s for s in args["symbols"].split(",") if s]
            dfs = client.read_ohlc_multi(
                exchange=args["exchange"],
                symbols=symbols_arg,
                market=args.get("market", "SPOT"),
                data_type=args.get("data_type", "raw"),
                period=args.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        limit = bounded_limit()
        out = {
            sym: _rows(df.limit(limit)) for sym, df in sorted(dfs.items())
        }
        return jsonify({"symbols": out, "limit": limit})

    @app.get("/datasets/change-feed")
    def dataset_change_feed():
        """Row-level change feed (CDF): the exact rows commits after
        `after_version` inserted / replaced / deleted, with their
        commit_version.  409 when the range has a commit without CDF
        data (the reader's loud-gap contract) — the consumer should
        fall back to the partition-granularity /refresh CDC path."""
        args = request.args
        try:
            feed, cursor = client.read_change_feed(
                args["exchange"],
                args["symbol"],
                after_version=int(args.get("after_version", -1)),
                market=args.get("market", "SPOT"),
                data_type=args.get("data_type", "raw"),
                period=args.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        except ValueError as exc:  # feed gap: never serve a silent hole
            return jsonify({"error": str(exc)}), 409
        # whole-commit pagination: cursor only ever advances past commits
        # whose rows are ALL in this response (loud-gap contract); when
        # truncated, the consumer re-requests with after_version=cursor
        page, cursor, truncated = client.paginate_change_feed(
            feed, cursor, bounded_limit()
        )
        rows = [] if page is None else _rows(page.orderBy("commit_version", "ts"))
        return jsonify(
            {"cursor": cursor, "n": len(rows), "truncated": truncated, "changes": rows}
        )

    @app.get("/preview")
    def preview():
        args = request.args
        try:
            df = client.read_ohlc(
                exchange=args["exchange"],
                symbol=args["symbol"],
                data_type=args.get("data_type", "raw"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        total, page = client.reader.preview(
            df, int(args.get("offset", 0)), min(int(args.get("limit", 100)), MAX_LIMIT)
        )
        return jsonify({"total": total, "rows": _rows(page)})

    @app.get("/features")
    def features():
        return jsonify({"feature_sets": client.features.list_feature_sets()})

    @app.get("/features/<int:feature_id>")
    def get_feature(feature_id: int):
        entry = client.features.get_feature_entry(feature_id)
        if entry is None:
            return jsonify({"error": "feature not found"}), 404
        entry["created_at"] = str(entry.get("created_at"))
        return jsonify(entry)

    @app.get("/features/<int:feature_id>/download")
    def download_feature(feature_id: int):
        from flask import send_file

        path = client.features.feature_file_path(feature_id)
        if path is None:
            return jsonify({"error": "feature file not found"}), 404
        import os as _os

        return send_file(path, as_attachment=True, download_name=_os.path.basename(path),
                         mimetype="application/octet-stream")

    @app.post("/ingest/file")
    def ingest_file():
        body = request.get_json(force=True)
        try:
            result = client.ingest_csv(
                body["path"], body["exchange"], body["market"], body["symbol"],
                period=body.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except Exception as exc:  # bad file / schema: loud, typed failure
            return jsonify({"error": str(exc)}), 400
        return jsonify(
            {
                "rows": result.rows,
                "path": result.path,
                "time_from": result.time_from,
                "time_to": result.time_to,
            }
        )

    # -- async download orchestration (reference UI ingest.py:204-236) ------
    def _submit_download(body: dict):
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(
            body["exchange"],
            body.get("market", "SPOT"),
            body["symbol"],
            body.get("data_type", "raw"),
            body.get("period", "1m"),
        )
        timeframe_ms = int(body.get("timeframe_ms", 60_000))
        since = body.get("start_ms")
        until = body.get("end_ms")
        return download_manager.submit(
            key.exchange,
            key.symbol,
            lambda conn: conn.download_ohlcv(
                key,
                timeframe_ms,
                since=int(since) if since is not None else None,
                until=int(until) if until is not None else None,
            ),
        )

    @app.post("/ingest/download")
    def ingest_download():
        if download_manager is None:
            return jsonify({"error": "download manager not configured"}), 503
        body = request.get_json(force=True)
        try:
            task = _submit_download(body)
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        return jsonify(
            {
                **_task_dict(task),
                "message": f"Queued download for {task.symbol} from {task.exchange}",
            }
        )

    @app.post("/ingest/bulk-download")
    def ingest_bulk_download():
        if download_manager is None:
            return jsonify({"error": "download manager not configured"}), 503
        body = request.get_json(force=True)
        # Validate the WHOLE request before queueing anything: submitting
        # inside the loop would let a mid-list validation error return
        # 422 while the already-submitted downloads keep running — the
        # error response would hide that work was queued.
        try:
            symbols = body["symbols"]
            _ = body["exchange"]
            if not isinstance(symbols, list) or not symbols:
                return jsonify({"error": "symbols must be a non-empty list"}), 422
            int(body.get("timeframe_ms", 60_000))
            for f in ("start_ms", "end_ms"):
                if body.get(f) is not None:
                    int(body[f])
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except (TypeError, ValueError) as exc:
            return jsonify({"error": f"invalid field: {exc}"}), 422
        tasks = [_submit_download({**body, "symbol": s}) for s in symbols]
        return jsonify(
            {
                "tasks": [_task_dict(t) for t in tasks],
                "message": f"Queued {len(tasks)} downloads from {body['exchange']}",
            }
        )

    @app.get("/ingest/status")
    def ingest_status():
        if download_manager is None:
            return jsonify({"error": "download manager not configured"}), 503
        task_id = request.args.get("task_id")
        if task_id is not None:
            task = download_manager.get_task(task_id)
            if task is None:
                return jsonify({"error": "task not found"}), 404
            return jsonify(_task_dict(task))
        return jsonify({t.task_id: _task_dict(t) for t in download_manager.list_tasks()})

    # -- exchange discovery (reference UI ingest.py:238-289) ----------------
    @app.get("/exchanges")
    def exchanges():
        if catalog is None:
            return jsonify({"error": "exchange catalog not configured"}), 503
        return jsonify({"exchanges": catalog.exchanges()})

    @app.get("/exchanges/<exchange_id>/markets")
    def exchange_markets(exchange_id: str):
        if catalog is None:
            return jsonify({"error": "exchange catalog not configured"}), 503
        return jsonify({"markets": catalog.markets(exchange_id)})

    @app.get("/exchanges/<exchange_id>/symbols")
    def exchange_symbols(exchange_id: str):
        if catalog is None:
            return jsonify({"error": "exchange catalog not configured"}), 503
        try:
            syms = catalog.symbols(exchange_id, request.args.get("market", "spot"))
        except Exception as exc:  # reference 500s on probe failure
            return jsonify({"error": f"failed to fetch symbols: {exc}"}), 500
        return jsonify({"symbols": syms})

    @app.post("/export")
    def export():
        body = request.get_json(force=True)
        try:
            client.export_ohlc(
                body["path"], body["exchange"], body["symbol"],
                start=body.get("start"), end=body.get("end"),
                period=body.get("period", "1m"),
                resample_to=body.get("resample_to"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        return jsonify({"exported": body["path"]})

    @app.post("/export/batch")
    def export_batch():
        """Export every raw-data symbol of an exchange in one call
        (reference UI `routers/data.py:378-442`). One subdirectory of
        terminal CSV per symbol under body["dir"]."""
        import os as _os

        body = request.get_json(force=True)
        try:
            exchange, out_dir = body["exchange"], body["dir"]
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        entries = client.manifest.list_entries(
            exchange=exchange, market=body.get("market"), data_type="raw"
        )
        symbols = sorted(r["symbol"] for r in entries.select("symbol").distinct().collect())
        exported, failed = [], []
        for sym in symbols:
            try:
                client.export_ohlc(
                    _os.path.join(out_dir, sym), exchange, sym,
                    period=body.get("period", "1m"),
                    resample_to=body.get("resample_to"),
                )
                exported.append(sym)
            except Exception as exc:
                failed.append({"symbol": sym, "error": str(exc)})
        return jsonify(
            {
                "total_symbols": len(symbols),
                "exported": exported,
                "failed": failed,
                "export_dir": out_dir,
            }
        )

    @app.get("/verify")
    def verify():
        args = request.args
        try:
            rep = client.verify(args["exchange"], args["symbol"])
        except KeyError as exc:
            return jsonify({"error": f"missing parameter {exc}"}), 422
        return jsonify(rep.__dict__)

    @app.post("/refresh")
    def refresh():
        body = request.get_json(force=True)
        try:
            if body.get("cdc"):
                # commit-log-driven per symbol: also rebuilds buckets for
                # backfills into old months (see client.refresh_rollup_cdc)
                results = {}
                for sym in client.reader.list_symbols(body["exchange"]):
                    res = client.refresh_rollup_cdc(
                        body["exchange"],
                        body.get("market", "SPOT"),
                        sym,
                        body.get("source_period", "1m"),
                        body.get("target_period", "15m"),
                    )
                    results[sym] = 0 if res is None else res.rows
                return jsonify(results)
            out = client.refresh_rollup_all(
                body["exchange"], target_period=body.get("target_period", "15m")
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        return jsonify({sym: res.rows for sym, res in out.items()})

    @app.delete("/datasets")
    def delete_datasets():
        filters = {
            k: v
            for k, v in request.get_json(force=True).items()
            if k in ("symbol", "data_type", "exchange", "market")
        }
        if not filters:
            return jsonify({"error": "refusing unfiltered delete"}), 422
        return jsonify({"deleted": client.delete_dataset(**filters)})

    @app.delete("/datasets/rows")
    def delete_rows():
        """Row-level delete (LakeWriter.delete_where): body names the
        dataset plus exactly one of `where` (SQL predicate) or an
        inclusive [start_ms, end_ms] ts range."""
        body = request.get_json(force=True)
        try:
            out = client.delete_rows(
                body["exchange"],
                body["symbol"],
                data_type=body.get("data_type", "raw"),
                market=body.get("market", "SPOT"),
                period=body.get("period", "1m"),
                where=body.get("where"),
                start_ms=body.get("start_ms"),
                end_ms=body.get("end_ms"),
                strategy=body.get("strategy", "rewrite"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 422
        return jsonify(out)

    @app.post("/datasets/rows/update")
    def update_rows():
        """Row-level UPDATE ... SET (LakeWriter.update_where): body
        names the dataset, a `where` SQL predicate, a `set` object of
        column -> SQL expression (evaluated against the pre-update
        row), and optionally strategy="dv" for the merge-on-read
        shape."""
        body = request.get_json(force=True)
        try:
            out = client.update_rows(
                body["exchange"],
                body["symbol"],
                where=body["where"],
                set=body["set"],
                data_type=body.get("data_type", "raw"),
                market=body.get("market", "SPOT"),
                period=body.get("period", "1m"),
                strategy=body.get("strategy", "rewrite"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 422
        return jsonify(out)

    @app.post("/datasets/columns/rename")
    def rename_column():
        """Metadata-only column rename via column mapping
        (LakeWriter.rename_column): body names the dataset plus
        `from`/`to`; zero files rewritten."""
        body = request.get_json(force=True)
        try:
            out = client.rename_column(
                body["exchange"], body["symbol"], body["from"], body["to"],
                data_type=body.get("data_type", "raw"),
                market=body.get("market", "SPOT"),
                period=body.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 422
        return jsonify(out)

    @app.delete("/datasets/columns")
    def drop_column():
        """Metadata-only column drop (LakeWriter.drop_column): the
        physical name is retired so a re-add can never resurrect the
        dropped values."""
        body = request.get_json(force=True)
        try:
            out = client.drop_column(
                body["exchange"], body["symbol"], body["column"],
                data_type=body.get("data_type", "raw"),
                market=body.get("market", "SPOT"),
                period=body.get("period", "1m"),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 422
        return jsonify(out)

    @app.get("/datasets/schema")
    def dataset_schema():
        """The commit-logged schema contract, optionally AS OF a
        version (historical schemas through time travel)."""
        try:
            out = client.dataset_schema(
                request.args["exchange"], request.args["symbol"],
                data_type=request.args.get("data_type", "raw"),
                market=request.args.get("market", "SPOT"),
                period=request.args.get("period", "1m"),
                version=(
                    int(request.args["version"])
                    if "version" in request.args
                    else None
                ),
            )
        except KeyError as exc:
            return jsonify({"error": f"missing field {exc}"}), 422
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 422
        return jsonify({"schema": out})

    return app
