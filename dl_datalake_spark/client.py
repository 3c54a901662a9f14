"""DataLakeClient: the thin facade the reference exposes over HTTP/CLI
(`client/dl_client.py`, `client/api_server.py`) — one object wiring
reader/writer/manifest/features/maintenance together.

Everything here is delegation; the engine lives in lake/ and
operators/. Serving this over FastAPI/Typer is a deployment concern —
the reference's own docs call the orchestration swappable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.lake.export import export_terminal_csv
from dl_datalake_spark.lake.features import FeatureStore
from dl_datalake_spark.lake.maintenance import (
    IntegrityReport,
    audit,
    audit_lists,
    verify_integrity,
)
from dl_datalake_spark.lake.manifest import ManifestManager
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.reader import LakeReader
from dl_datalake_spark.lake.writer import LakeWriter
from dl_datalake_spark.operators.resample import resample_ohlcv
from dl_datalake_spark.sources.csv_source import read_ohlcv_csv, read_ticks_csv


class DataLakeClient:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        manifest_path: str | None = None,
        emit_cdf: bool = False,
    ):
        self.spark = spark
        self.base_path = base_path.rstrip("/")
        self.manifest = ManifestManager(spark, manifest_path or f"{self.base_path}_manifest")
        self.writer = LakeWriter(spark, self.base_path, self.manifest, emit_cdf=emit_cdf)
        self.reader = LakeReader(spark, self.base_path)
        self.features = FeatureStore(spark, self.base_path, self.manifest)

    # -- row-level change feed (CDF) -----------------------------------------
    def read_change_feed(
        self,
        exchange: str,
        symbol: str,
        after_version: int = -1,
        market: str = "SPOT",
        data_type: str = "raw",
        period: str = "1m",
    ):
        """Cursored row-level change feed (requires the lake to be
        written with emit_cdf=True); see LakeReader.read_change_feed
        for the gap contract.  Returns (df | None, next_cursor)."""
        key = DatasetKey(exchange, market, symbol, data_type, period)
        return self.reader.read_change_feed(key, after_version=after_version)

    @staticmethod
    def paginate_change_feed(feed: DataFrame | None, cursor: int, limit: int):
        """Whole-commit pagination for the change feed: returns
        (page_df | None, page_cursor, truncated). Never splits a commit
        across a page boundary — a consumer persisting page_cursor has
        seen EVERY row of every commit <= page_cursor, preserving the
        feed's loud-gap contract (a naive ``LIMIT n`` + cursor=latest
        silently drops every changed row past the limit). If the first
        unserved commit alone exceeds `limit` it is served whole (n may
        exceed limit) rather than torn. `truncated` means more commits
        remain past page_cursor; the consumer should re-request."""
        if feed is None:
            return None, cursor, False
        counts = sorted(
            (r["commit_version"], r["n"])
            for r in feed.groupBy("commit_version")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if not counts:
            return None, cursor, False
        running, last_v = 0, None
        for v, n in counts:
            if last_v is not None and running + n > limit:
                break
            running += n
            last_v = v
            if running >= limit:
                break
        truncated = last_v < counts[-1][0]
        if not truncated:
            # cursor may exceed the max fed version (row-less commits at
            # the tail still advance it) — keep the reader's cursor
            return feed, cursor, False
        return feed.where(F.col("commit_version") <= last_v), last_v, True

    # -- read (api_server.py:58-82) ----------------------------------------
    def read_ohlc(
        self,
        exchange: str,
        symbol: str,
        start: str | None = None,
        end: str | None = None,
        data_type: str = "raw",
        bounds: dict | None = None,
    ) -> DataFrame:
        return self.reader.read_range(
            exchange, symbol, data_type, start, end, bounds=bounds
        )

    def list_symbols(self, exchange: str | None = None) -> list[str]:
        return self.reader.list_symbols(exchange)

    def read_ohlc_at(
        self,
        exchange: str,
        symbol: str,
        version: int,
        market: str = "SPOT",
        data_type: str = "raw",
        period: str = "1m",
    ) -> DataFrame:
        """Time travel (Delta ``VERSION AS OF``): the dataset exactly as
        of commit `version`; `dataset_history` lists the versions."""
        return self.reader.read_dataset_at(
            DatasetKey(exchange, market, symbol, data_type, period), version
        )

    def dataset_history(
        self,
        exchange: str,
        symbol: str,
        market: str = "SPOT",
        data_type: str = "raw",
        period: str = "1m",
    ) -> list[dict]:
        return self.reader.dataset_history(
            DatasetKey(exchange, market, symbol, data_type, period)
        )

    def read_ohlc_multi(
        self,
        exchange: str,
        symbols: list[str],
        market: str = "SPOT",
        data_type: str = "raw",
        period: str = "1m",
    ) -> dict[str, DataFrame]:
        """Read several symbols' datasets at ONE consistent cut: a
        `write_ohlc_multi` commit is visible in every returned frame or
        in none (lake/multilog.py) — a cross-symbol join/aggregate never
        mixes epochs while ingest is running."""
        keys = [DatasetKey(exchange, market, s, data_type, period) for s in symbols]
        return self.reader.read_datasets(keys)

    def restore_ohlc(
        self,
        exchange: str,
        symbol: str,
        version: int,
        market: str = "SPOT",
        data_type: str = "raw",
        period: str = "1m",
    ):
        """Roll the dataset back to a committed version (Delta RESTORE;
        metadata-only — see LakeWriter.restore_dataset)."""
        return self.writer.restore_dataset(
            DatasetKey(exchange, market, symbol, data_type, period), version
        )

    def restore_lake(self, txid: str):
        """Roll EVERY dataset of multi-commit `txid` back to its state
        as of that commit, atomically (the write-side inverse of
        read_ohlc_multi_at — undo a bad write_ohlc_multi by restoring
        to the last good one; see LakeWriter.restore_lake_to)."""
        return self.writer.restore_lake_to(txid)

    def read_ohlc_multi_at(
        self,
        exchange: str,
        symbols: list[str],
        txid: str,
        market: str = "SPOT",
        data_type: str = "raw",
        period: str = "1m",
    ) -> dict[str, DataFrame]:
        """Multi-dataset TIME TRAVEL: every symbol exactly as of the
        multi-commit `txid` (a `write_ohlc_multi` result's .txid) — the
        reproducible-backtest handle: replaying the same txid always
        yields the same atomic cross-dataset cut, loudly erroring if
        vacuum/prune has made it unreconstructable."""
        keys = [DatasetKey(exchange, market, s, data_type, period) for s in symbols]
        return self.reader.read_datasets_at(keys, txid)

    # -- ingest (cli.py:138-160) -------------------------------------------
    def ingest_csv(self, path: str, exchange: str, market: str, symbol: str, period: str = "1m"):
        df = read_ohlcv_csv(self.spark, path)
        return self.writer.write_ohlc(df, DatasetKey(exchange, market, symbol, "raw", period))

    def ingest_ticks_csv(self, path: str, exchange: str, market: str, symbol: str):
        df = read_ticks_csv(self.spark, path)
        return self.writer.write_ticks(df, DatasetKey(exchange, market, symbol, "ticks", "tick"))

    # -- aggregate (orchestration/flows.py:31-104) ---------------------------
    def aggregate_ohlc(
        self, exchange: str, market: str, symbol: str, source_period: str, target_period: str
    ):
        src = self.reader.read_dataset(DatasetKey(exchange, market, symbol, "raw", source_period))
        agg = resample_ohlcv(src, target_period)
        return self.writer.write_ohlc(
            agg, DatasetKey(exchange, "agg", symbol, "agg", target_period)
        )

    def refresh_rollup(
        self, exchange: str, market: str, symbol: str, source_period: str, target_period: str
    ):
        """Incremental continuous aggregate: bring the `target_period`
        rollup up to date by resampling ONLY raw rows at or after the
        last materialized bucket.

        The reference recomputes its aggregates from a full 7-day
        re-read on every flow run (flows.py:52-62); at 100 TB that full
        recompute is the difference between minutes and a scan of the
        entire lake. Mechanics:

        - watermark = max(time_to) over this rollup's manifest entries
          (data_type="agg", timeframe=target). Rollup rows carry
          bucket-start ts, so the watermark IS the newest bucket start —
          that bucket may have been built from then-incomplete raw data,
          so the refresh re-reads from exactly that bucket boundary and
          the writer's keep-last upsert replaces it.
        - the incremental raw read prunes year/month partitions from the
          watermark before the ts filter even reaches Parquet row
          groups, so refresh cost is O(new data), not O(dataset).
        """
        from datetime import datetime, timezone

        from dl_datalake_spark.operators.resample import timeframe_ms

        step = timeframe_ms(target_period)
        wm = (
            self.manifest.list_entries(
                symbol=symbol, data_type="agg", exchange=exchange, timeframe=target_period
            )
            .agg(F.max("time_to"))
            .collect()[0][0]
        )
        src = self.reader.read_dataset(
            DatasetKey(exchange, market, symbol, "raw", source_period)
        )
        if wm is not None:
            start = (wm // step) * step
            d = datetime.fromtimestamp(start / 1000, tz=timezone.utc)
            src = src.where(
                (F.col("year") > d.year)
                | ((F.col("year") == d.year) & (F.col("month") >= d.month))
            ).where(F.col("ts") >= start)
            if src.isEmpty():
                return None
        agg = resample_ohlcv(src, target_period)
        return self.writer.write_ohlc(
            agg, DatasetKey(exchange, "agg", symbol, "agg", target_period)
        )

    def refresh_rollup_cdc(
        self,
        exchange: str,
        market: str,
        symbol: str,
        source_period: str = "1m",
        target_period: str = "15m",
    ):
        """Rollup refresh driven by the source dataset's COMMIT LOG
        instead of the rollup watermark.

        The watermark path (refresh_rollup) only sees data NEWER than
        the last bucket — a backfill or correction upserted into an old
        month never reaches the rollup.  Here the consumer cursor is
        the source commit version: read_changes_since returns rows from
        exactly the partitions touched since the last consumed commit
        (old months included), the resample rebuilds those months'
        buckets, and keep-last upsert replaces them.  The cursor itself
        is persisted in the ROLLUP's commit payload (`source_version`),
        so cursor advance is atomic with the rollup write — a crash
        between them replays the slice idempotently.

        Constraint (shared with the watermark path): target buckets
        must not span month partitions (true for s/min/h buckets).
        """
        src_key = DatasetKey(exchange, market, symbol, "raw", source_period)
        agg_key = DatasetKey(exchange, "agg", symbol, "agg", target_period)
        hist = self.writer.commit_log(agg_key).history()
        cursor = max((c.get("source_version", -1) for c in hist), default=-1)
        info = self.reader.changes_since(src_key, cursor)
        if info.df is None and not info.has_delete:
            return None
        if info.df is not None and not info.has_delete:
            agg = resample_ohlcv(info.df, target_period)
            return self.writer.write_ohlc(
                agg, agg_key, commit_meta={"source_version": info.latest}
            )
        # Delete-aware path: a source bucket the delete EMPTIED produces
        # no agg row, so a keep-last upsert would leave its stale rollup
        # row in place forever.  Rebuild the touched months wholesale:
        # drop them from the rollup, then write the recomputed buckets.
        # Crash-safety: the cursor (source_version) rides only the FINAL
        # write — a crash after the drop but before it replays the whole
        # slice idempotently (the re-drop is a no-op, the write restores).
        if info.touched is not None:
            months = [tuple(p) for p in info.touched]
        else:
            # full-scan fallback slice: rebuild every month the rollup has
            existing = self.reader.read_dataset(agg_key)
            months = (
                [
                    (int(r["year"]), int(r["month"]))
                    for r in existing.select("year", "month").distinct().collect()
                ]
                if "year" in existing.columns
                else []
            )
        if months:
            pred = " OR ".join(f"(year = {y} AND month = {m})" for y, m in months)
            self.writer.delete_where(
                agg_key, pred, months=months, commit_meta={"cdc_rebuild": True}
            )
        if info.df is not None:
            agg = resample_ohlcv(info.df, target_period)
            return self.writer.write_ohlc(
                agg, agg_key, commit_meta={"source_version": info.latest}
            )
        # the delete emptied the whole source: nothing to write, but the
        # cursor must still advance — record it in a no-op commit
        with self.writer.commit_log(agg_key).transaction(
            payload={
                "mode": "cdc-noop",
                "source_version": info.latest,
                "partitions": [],
            }
        ):
            pass
        return None

    def refresh_rollup_all(
        self,
        exchange: str,
        market: str = "SPOT",
        source_period: str = "1m",
        target_period: str = "15m",
    ) -> dict[str, object]:
        """Refresh the target rollup for EVERY symbol of an exchange in
        ONE resample job.

        The per-symbol `refresh_rollup` loop submits one scan+agg per
        symbol — fine for ten symbols, 1,000 Spark jobs for 1,000. Here
        the raw scan is a single manifest-pruned multi-dataset read,
        per-symbol watermarks arrive as a broadcast join (not a driver
        loop), the resample groups by (symbol, bucket) in one hash-agg,
        and the upsert is ONE multi-dataset write job
        (writer.write_ohlc_multi): one keep-last merge, one dynamic
        partition overwrite fanning out to every symbol's directories,
        and one batched manifest MERGE — per-symbol manifest rows
        unchanged.
        """
        from dl_datalake_spark.operators.resample import resample_ohlcv, timeframe_ms

        step = timeframe_ms(target_period)
        src = self.read_window(exchange=exchange, data_type="raw")
        if src is None:
            return {}
        src = src.where(F.col("period") == source_period)
        # materialize the (tiny) per-symbol watermark table driver-side:
        # the write loop below REWRITES the manifest, and a lazy plan
        # still referencing the old manifest parquet would hit
        # FILE_NOT_EXIST on recompute
        wm_rows = (
            self.manifest.list_entries(
                data_type="agg", exchange=exchange, timeframe=target_period
            )
            .groupBy("symbol")
            .agg(((F.max("time_to") / step).cast("long") * step).alias("_start"))
            .collect()
        )
        if wm_rows:
            wm = self.spark.createDataFrame(wm_rows, "symbol string, _start long")
            src = src.join(F.broadcast(wm), "symbol", "left").where(
                F.col("_start").isNull() | (F.col("ts") >= F.col("_start"))
            )
        agg = resample_ohlcv(
            src.select("symbol", "ts", "open", "high", "low", "close", "volume"),
            target_period,
            by=["symbol"],
        ).persist()
        agg.count()  # pin every partition before writes mutate inputs
        try:
            return self.writer.write_ohlc_multi(
                agg,
                exchange,
                market="agg",
                data_type="agg",
                period=target_period,
            )
        finally:
            agg.unpersist()

    # -- export (UI data.py:154-359) -----------------------------------------
    def export_ohlc(
        self,
        path: str,
        exchange: str,
        symbol: str,
        start: str | None = None,
        end: str | None = None,
        period: str = "1m",
        resample_to: str | None = None,
        single_file: bool = True,
    ) -> None:
        df = self.reader.read_range(exchange, symbol, "raw", start, end)
        export_terminal_csv(
            df, path, ticker=symbol.upper(), period=period,
            resample_to=resample_to, single_file=single_file,
        )

    # -- maintenance ---------------------------------------------------------
    def verify(self, exchange: str, symbol: str, data_type: str = "raw") -> IntegrityReport:
        return verify_integrity(self.reader.read_range(exchange, symbol, data_type))

    def audit(self, limit: int | None = 10_000) -> dict[str, list[str]]:
        return audit_lists(self.spark, self.base_path, self.manifest, limit=limit)

    def audit_frames(self):
        """Unrealized anti-join DataFrames — the scale path (a big lake
        can hold millions of dataset paths; don't collect them all)."""
        return audit(self.spark, self.base_path, self.manifest)

    def delete_dataset(self, **filters) -> int:
        return self.manifest.delete_entries(**filters)

    def delete_rows(
        self,
        exchange: str,
        symbol: str,
        data_type: str = "raw",
        market: str = "SPOT",
        period: str = "1m",
        where: str | None = None,
        start_ms: int | None = None,
        end_ms: int | None = None,
        strategy: str = "rewrite",
    ) -> dict:
        """Row-level delete (see LakeWriter.delete_where).  Give either
        a SQL `where` predicate or an inclusive [start_ms, end_ms] ts
        range (the range form partition-prunes the probe scan).
        `strategy="rewrite"` copy-on-writes the touched partitions;
        `strategy="dv"` records merge-on-read deletion vectors and
        rewrites nothing (lake/dv.py) — the right call when the matched
        fraction is tiny."""
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(exchange, market, symbol, data_type, period)
        range_given = start_ms is not None or end_ms is not None
        if (where is None) == (not range_given):
            raise ValueError("give exactly one of `where` or a ts range")
        if range_given and (start_ms is None or end_ms is None):
            # half-open input would otherwise slip past the XOR and die
            # as int(None) deep in delete_range — surface it as the 4xx
            # validation error the API layer maps ValueError to
            raise ValueError("ts-range delete requires BOTH start_ms and end_ms")
        if where is not None:
            res = self.writer.delete_where(key, where, strategy=strategy)
        else:
            res = self.writer.delete_range(
                key, int(start_ms), int(end_ms), strategy=strategy
            )
        return {"deleted": res.rows, "partitions": res.partitions}

    def rename_column(
        self,
        exchange: str,
        symbol: str,
        old: str,
        new: str,
        data_type: str = "raw",
        market: str = "SPOT",
        period: str = "1m",
    ) -> dict:
        """Metadata-only column RENAME via column mapping
        (LakeWriter.rename_column): zero files rewritten, reads serve
        the new name immediately, time travel keeps each epoch's own
        names."""
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(exchange, market, symbol, data_type, period)
        self.writer.rename_column(key, old, new)
        return {"renamed": {old: new}}

    def drop_column(
        self,
        exchange: str,
        symbol: str,
        name: str,
        data_type: str = "raw",
        market: str = "SPOT",
        period: str = "1m",
    ) -> dict:
        """Metadata-only column DROP (LakeWriter.drop_column): reads
        stop projecting the column; the physical name is retired so a
        future re-add can never resurrect the old values."""
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(exchange, market, symbol, data_type, period)
        self.writer.drop_column(key, name)
        return {"dropped": name}

    def dataset_schema(
        self,
        exchange: str,
        symbol: str,
        data_type: str = "raw",
        market: str = "SPOT",
        period: str = "1m",
        version: int | None = None,
    ) -> dict | None:
        """The dataset's recorded write-time schema contract ({column:
        Spark DDL type}, lake/schema.py) as of `version` (None = head);
        None for pre-contract history."""
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(exchange, market, symbol, data_type, period)
        return self.writer.commit_log(key).schema_at(version)

    def alter_column_type(
        self,
        exchange: str,
        symbol: str,
        column: str,
        new_type: str,
        data_type: str = "raw",
        market: str = "SPOT",
        period: str = "1m",
    ) -> dict:
        """Rewrite-backed NON-WIDENING type change (LakeWriter.
        alter_column_type): full rewrite under one commit, losslessness
        enforced by a round-trip probe, time travel serves each epoch's
        own type."""
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(exchange, market, symbol, data_type, period)
        res = self.writer.alter_column_type(key, column, new_type)
        return {"rows_rewritten": res.rows, "partitions": res.partitions}

    def update_rows(
        self,
        exchange: str,
        symbol: str,
        where: str,
        set: dict[str, str],
        data_type: str = "raw",
        market: str = "SPOT",
        period: str = "1m",
        strategy: str = "rewrite",
    ) -> dict:
        """Row-level UPDATE ... SET (LakeWriter.update_where): `set`
        maps column -> SQL expression evaluated against the pre-update
        row; `where` is a SQL predicate.  `strategy="dv"` uses the
        merge-on-read shape (deletion-vector the old copies, append the
        post-images) — O(matched rows) of write on any dataset size."""
        from dl_datalake_spark.lake.paths import DatasetKey

        key = DatasetKey(exchange, market, symbol, data_type, period)
        res = self.writer.update_where(key, set, where, strategy=strategy)
        return {"updated": res.rows, "partitions": res.partitions}

    def purge_rows(
        self,
        where: str,
        exchange: str | None = None,
        market: str | None = None,
        data_type: str | None = None,
    ) -> dict:
        """ATOMIC cross-dataset purge (LakeWriter.delete_where_multi):
        delete `where` from every cataloged dataset matching the
        filters, merge-on-read, committed-or-invisible as one multilog
        epoch — the GDPR shape ('remove user X everywhere').

        A heterogeneous catalog must not block the purge: datasets the
        DV delete cannot serve — legacy ones with no commit-pinned
        listing, or ones whose schema lacks a column the predicate
        references — are PRE-FILTERED (one driver-side schema analysis
        each, no job) and reported under ``skipped`` with the reason,
        instead of aborting the whole epoch with an AnalysisException
        mid-claim.  Returns {'txid': ..., 'deleted': {dataset rel
        path: rows}, 'skipped': {dataset rel path: reason}}."""
        from dl_datalake_spark.lake.paths import DatasetKey, dataset_rel_path
        from dl_datalake_spark.lake.snapshot import resolve_live_files

        entries = self.manifest.list_entries(
            exchange=exchange, market=market, data_type=data_type
        )
        keys = [
            DatasetKey(
                r["exchange"], r["market"], r["symbol"], r["data_type"],
                __import__("json").loads(r["metadata_json"] or "{}").get(
                    "timeframe", "1m"
                ),
            )
            for r in entries.select(
                "exchange", "market", "symbol", "data_type", "metadata_json"
            ).distinct().collect()
        ]
        eligible: list[DatasetKey] = []
        skipped: dict[str, str] = {}
        for k in keys:
            rel = dataset_rel_path(k.normalized())
            path = self.writer.dataset_path(k)
            live = resolve_live_files(self.writer.fs, path)
            if live is None:
                skipped[rel] = (
                    "no commit-pinned listing (legacy dataset) — purge it "
                    "with delete_rows(strategy='rewrite') individually"
                )
                continue
            if live:
                try:
                    # analysis only (limit(0) / empty frame, never
                    # executed): does the predicate resolve against this
                    # dataset's schema?  Resolved against the COMMIT-LOGGED
                    # CONTRACT when one exists — logical names (post
                    # rename_column) and null-filled merge_schema columns,
                    # exactly what delete_where_multi's contract_read scan
                    # serves — so a purge is never silently skipped on a
                    # dataset the delete would handle correctly.  The raw
                    # first-file probe remains only for pre-contract
                    # datasets.
                    from dl_datalake_spark.lake.commitlog import CommitLog
                    from dl_datalake_spark.lake.schema import contract_read

                    contract = contract_read(
                        CommitLog(path, fs=self.writer.fs),
                        self.writer.base_path, path, live[0],
                    )
                    if contract is not None:
                        ddl, back = contract
                        probe = self.spark.createDataFrame([], ddl)
                        renames = {
                            p: l for p, l in back.items() if p in probe.columns
                        }
                        if renames:
                            probe = probe.withColumnsRenamed(renames)
                        probe.where(where).schema
                    else:
                        (
                            self.spark.read.option("basePath", path)
                            .parquet(f"{path}/{live[0]}")
                            .limit(0)
                            .where(where)
                            .schema
                        )
                except Exception as exc:
                    skipped[rel] = (
                        f"predicate does not resolve against schema: {exc}"
                    )
                    continue
            eligible.append(k)
        if not eligible:
            return {"txid": None, "deleted": {}, "skipped": skipped}
        out = self.writer.delete_where_multi(eligible, where)
        txid = next(iter({res.txid for res in out.values()}), None)
        return {
            "txid": txid,
            "deleted": {r: res.rows for r, res in out.items()},
            "skipped": skipped,
        }

    # -- SQL surface (reference: DuckDB SQL over parquet, reader.py:57-62) ---
    def register_view(
        self,
        name: str,
        exchange: str,
        symbol: str,
        data_type: str = "raw",
        start: str | None = None,
        end: str | None = None,
    ) -> None:
        """Expose a dataset (optionally time-bounded) as a temp view for
        `sql()`. The view is the pruned/pushed-down scan, so SQL over it
        keeps the same physical plan as the DataFrame path."""
        self.reader.read_range(exchange, symbol, data_type, start, end).createOrReplaceTempView(
            name
        )

    def sql(self, query: str) -> DataFrame:
        """Spark SQL with NAMED LAKE TABLES (lake/sql_catalog.py):
        `lake.<exchange>_<symbol>_<data_type>_<period>` references —
        including Delta-style `VERSION AS OF n` / `TIMESTAMP AS OF
        'ts'` time travel — resolve through the same pinned/contract
        scan every DataFrame read uses; registered temp views and
        plain SQL keep working untouched.  The engine analogue (and
        superset) of the reference's ad-hoc DuckDB SQL over parquet
        globs."""
        return self._sql_catalog().sql(query)

    def sql_tables(self) -> list[str]:
        """Addressable `lake.<name>` tables (SHOW TABLES analogue)."""
        return self._sql_catalog().tables()

    def _sql_catalog(self):
        from dl_datalake_spark.lake.sql_catalog import LakeSQLCatalog

        return LakeSQLCatalog(
            self.spark, self.reader, self.writer.fs, writer=self.writer
        )

    # -- manifest-pruned cross-dataset read (plans/manifest_pruning.py) ------
    def read_window(self, time_from: int | None = None, time_to: int | None = None, **filters):
        """Time-window read across every dataset the manifest says can
        match — datasets whose [time_from, time_to] interval misses the
        window are never even listed. Something the reference's
        one-glob-per-symbol reader cannot express."""
        from dl_datalake_spark.plans import read_pruned

        return read_pruned(self.spark, self.manifest, time_from, time_to, **filters)
