"""Manifest catalog: one row per dataset write, path-keyed upsert.

Reference: SQLite via SQLAlchemy (`metadata/manifest.py:22-173`) — one
row per physical file with time_from/time_to for watermark resume.
Spark-native equivalent: a small Parquet-backed `_manifest` table with
the same columns, path-keyed keep-last upsert, written atomically
(tmp dir + rename) since the manifest is tiny, driver-local metadata —
NOT the data plane. On a shared deployment this would be a Delta table
with MERGE; the API here is storage-agnostic.

Fixes the reference's semver bug (`manifest.py:111` int-casts version →
crashes on "1.0.0", observed in test_11): get_latest_version sorts by
numeric components.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dl_datalake_spark.lake.commitlog import CommitLog
from dl_datalake_spark.lake.fs import Filesystem, get_fs
from dl_datalake_spark.lake.paths import sanitize_symbol

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("market", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("time_from", T.LongType()),
        T.StructField("time_to", T.LongType()),
        T.StructField("version", T.StringType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("script_git_hash", T.StringType()),
        T.StructField("metadata_json", T.StringType()),
    ]
)


_GIT_HASH_CACHE: dict[str, str | None] = {}


def current_git_hash() -> str | None:
    """PRODUCING-SCRIPT git hash for provenance stamping (the reference
    records the ingest script's hash per manifest row, manifest.py:38).
    Resolution order: `DL_DATALAKE_GIT_HASH` env var, then the caller's
    CWD's repo — never this package's own checkout, which is a framework
    detail (and meaningless when installed as a wheel). None outside a
    repo. Cached per cwd."""
    env = os.environ.get("DL_DATALAKE_GIT_HASH")
    if env:
        return env
    cwd = os.getcwd()
    if cwd not in _GIT_HASH_CACHE:
        import subprocess

        try:
            out = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=cwd,
                capture_output=True,
                text=True,
                timeout=5,
            )
            _GIT_HASH_CACHE[cwd] = out.stdout.strip() if out.returncode == 0 else None
        except Exception:
            _GIT_HASH_CACHE[cwd] = None
    return _GIT_HASH_CACHE[cwd]


def _version_sort_key(v: str) -> tuple:
    parts = []
    for p in str(v).replace("-", ".").split("."):
        parts.append((0, int(p)) if p.isdigit() else (1, p))
    return tuple(parts)


class ManifestManager:
    def __init__(
        self,
        spark: SparkSession,
        manifest_path: str,
        keep_history: bool = True,
        fs: Filesystem | None = None,
    ):
        self.spark = spark
        self.path = manifest_path.rstrip("/")
        self.keep_history = keep_history
        self._next_id = None
        self.fs = fs if fs is not None else get_fs(self.path, spark)
        # Catalog mutations are read-modify-write; the commit log
        # serializes them across processes AND hosts (the reference
        # serializes the same section behind SQLite's single-host file
        # lock, manifest.py:52-55).  The log dir is a SIBLING of the
        # manifest dir because _store replaces the manifest dir wholesale.
        self._log = CommitLog(self.path, fs=self.fs, log_dir=self.path + "_commits")

    def _txn(self):
        return self._log.transaction(timeout=60.0)

    # -- storage ------------------------------------------------------------

    def _exists(self) -> bool:
        return any(f.endswith(".parquet") for f in self.fs.listdir(self.path))

    def load(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def _store(self, df: DataFrame) -> None:
        """Atomic replace: write to a staging dir NEXT TO the manifest
        (same filesystem, so both swap steps are atomic renames — a
        tempdir stage would degrade to a cross-mount copy), then swap."""
        tmp = self.path + f".staging.{uuid.uuid4().hex}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.path + f".old.{uuid.uuid4().hex}"
        if self.fs.exists(self.path):
            self.fs.rename(self.path, old)
        self.fs.rename(tmp, self.path)
        self.fs.rmtree(old)
        if self.keep_history:
            # re-read the committed files: `df`'s lineage still points at
            # the pre-swap manifest files, which no longer exist
            self._append_snapshot(self.load())

    # -- time travel (Iceberg/Delta-style snapshot log) ---------------------
    #
    # Every committed catalog state is ALSO appended to `<path>_history`
    # stamped with a monotone snapshot_ts (epoch µs), giving the catalog
    # the snapshot lineage the reference's SQLite manifest lacks: any
    # past state is reconstructable (`load_at`), and an ingest rollback
    # is a diff of two snapshots. The log grows by one catalog copy per
    # commit — catalogs are kilobytes-per-thousand-datasets, so even at
    # 100 TB data scale the log stays driver-trivial; prune_history
    # bounds it when commits are very frequent.

    @property
    def history_path(self) -> str:
        return self.path + "_history"

    def _append_snapshot(self, df: DataFrame) -> None:
        import time

        snap = int(time.time() * 1_000_000)
        last = self._last_snapshot_ts()
        if last is not None and snap <= last:
            snap = last + 1  # clock went backwards / same-µs commit
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.history_path, f"snapshot_ts={snap}")
        )

    def _history_df(self) -> DataFrame | None:
        hp = self.history_path
        if not self.fs.exists(hp):
            return None
        return self.spark.read.schema(MANIFEST_SCHEMA).option(
            "basePath", hp
        ).parquet(hp)

    def _last_snapshot_ts(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def snapshots(self) -> list[int]:
        """Committed snapshot timestamps (epoch µs), ascending — read
        from the partition directory names, no data scan."""
        out = []
        for d in self.fs.listdir(self.history_path):
            if d.startswith("snapshot_ts="):
                try:
                    out.append(int(d.split("=", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def load_at(self, ts_us: int) -> DataFrame:
        """The catalog exactly as of epoch-µs `ts_us`: the newest
        snapshot committed at or before that instant. Empty DataFrame
        before the first commit."""
        eligible = [s for s in self.snapshots() if s <= ts_us]
        if not eligible:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        hp = os.path.join(self.history_path, f"snapshot_ts={eligible[-1]}")
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(hp)

    def prune_history(self, keep_last: int = 100) -> int:
        """Drop all but the newest `keep_last` snapshots; returns the
        number removed. Partition-directory deletes — no rewrite."""
        snaps = self.snapshots()
        drop = snaps[:-keep_last] if keep_last > 0 else snaps
        for s in drop:
            self.fs.rmtree(os.path.join(self.history_path, f"snapshot_ts={s}"))
        return len(drop)

    # -- API (reference manifest.py:42-173 parity) --------------------------

    def add_entry(
        self,
        exchange: str,
        market: str,
        symbol: str,
        path: str,
        data_type: str = "raw",
        time_from: int | None = None,
        time_to: int | None = None,
        version: str = "1.0.0",
        checksum: str | None = None,
        script_git_hash: str | None = None,
        metadata: dict[str, Any] | None = None,
    ) -> None:
        self.add_entries(
            [
                {
                    "exchange": exchange,
                    "market": market,
                    "symbol": symbol,
                    "path": path,
                    "data_type": data_type,
                    "time_from": time_from,
                    "time_to": time_to,
                    "version": version,
                    "checksum": checksum,
                    "script_git_hash": script_git_hash,
                    "metadata": metadata,
                }
            ]
        )

    def add_entries(self, rows: list[dict[str, Any]]) -> None:
        """Batched path-keyed upsert: N dataset rows in ONE catalog
        lock + load + merge + store cycle — the MERGE-style union a
        multi-dataset write (writer.write_ohlc_multi) needs, instead of
        N sequential lock/load/store round-trips. Each dict takes the
        add_entry keyword names; `path` must be unique within a batch
        (last write wins is undefined inside one MERGE)."""
        if not rows:
            return
        paths = [r["path"] for r in rows]
        if len(set(paths)) != len(paths):
            raise ValueError("add_entries: duplicate path within one batch")
        with self._txn():
            current = self.load()
            max_id = current.agg(F.max("id")).collect()[0][0] or 0
            # a path-keyed upsert REPLACES the row, so each range must
            # widen monotonically across writes — otherwise a second
            # write's narrower touched-partition range would shadow
            # earlier data and break time-range pruning
            # (plans/manifest_pruning.py) and the resume watermark
            existing = {
                r["path"]: (r["t0"], r["t1"])
                for r in current.where(F.col("path").isin(paths))
                .groupBy("path")
                .agg(F.min("time_from").alias("t0"), F.max("time_to").alias("t1"))
                .collect()
            }
            data = []
            now = datetime.now(timezone.utc).replace(tzinfo=None)
            for i, r in enumerate(rows):
                tf, tt = r.get("time_from"), r.get("time_to")
                old = existing.get(r["path"])
                if old is not None:
                    if tf is not None and old[0] is not None:
                        tf = min(tf, old[0])
                    if tt is not None and old[1] is not None:
                        tt = max(tt, old[1])
                data.append(
                    (
                        max_id + 1 + i,
                        r["exchange"].upper(),
                        r["market"].upper(),
                        r["symbol"].upper(),
                        r["path"],
                        r.get("data_type", "raw"),
                        tf,
                        tt,
                        r.get("version", "1.0.0"),
                        r.get("checksum"),
                        now,
                        r.get("script_git_hash") or current_git_hash(),
                        json.dumps(r.get("metadata") or {}),
                    )
                )
            new = self.spark.createDataFrame(data, MANIFEST_SCHEMA)
            # path-keyed upsert: new row wins (manifest.py:63-99 semantics)
            w = Window.partitionBy("path").orderBy(F.desc("_src"))
            merged = (
                current.withColumn("_src", F.lit(0))
                .unionByName(new.withColumn("_src", F.lit(1)))
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )
            self._store(merged)

    def list_entries(
        self,
        symbol: str | None = None,
        data_type: str | None = None,
        exchange: str | None = None,
        market: str | None = None,
        timeframe: str | None = None,
        path: str | None = None,
    ) -> DataFrame:
        df = self.load()
        if path is not None:
            df = df.where(F.col("path") == path)
        if timeframe is not None:
            # JSON-metadata predicate (pipeline.py:147-163 filters the
            # same field row-at-a-time in Python; here it's an engine
            # expression, pushable and parallel)
            df = df.where(
                F.get_json_object(F.col("metadata_json"), "$.timeframe") == timeframe
            )
        if symbol is not None:
            # filters accept raw symbols ("BTC/USDT"); entries store the
            # sanitized key ("BTC_USDT"), same as the path layout
            df = df.where(F.col("symbol") == sanitize_symbol(symbol))
        if data_type is not None:
            df = df.where(F.col("data_type") == data_type)
        if exchange is not None:
            df = df.where(F.col("exchange") == exchange.upper())
        if market is not None:
            df = df.where(F.col("market") == market.upper())
        return df.orderBy("id")

    def delete_entries(self, **filters) -> int:
        with self._txn():
            keep = self.load()
            drop = self.list_entries(**filters)
            n = drop.count()
            if n:
                remaining = keep.join(drop.select("path"), "path", "left_anti")
                self._store(remaining.select(*[f.name for f in MANIFEST_SCHEMA.fields]))
            return n

    def get_latest_version(self, symbol: str, data_type: str) -> str | None:
        rows = (
            self.list_entries(symbol=symbol, data_type=data_type)
            .select("version")
            .distinct()
            .collect()
        )
        if not rows:
            return None
        return max((r["version"] for r in rows), key=_version_sort_key)

    def watermark(self, exchange: str, symbol: str, data_type: str = "raw") -> int | None:
        """Resume cursor = max(time_to) (exchange_connector.py:89-105)."""
        row = (
            self.list_entries(symbol=symbol, data_type=data_type, exchange=exchange)
            .agg(F.max("time_to"))
            .collect()[0]
        )
        return row[0]
