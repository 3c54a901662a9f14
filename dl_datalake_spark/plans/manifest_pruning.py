"""Manifest-driven scan pruning (SURVEY §4.2 item 1).

The reference stores `time_from`/`time_to` in its manifest but only
uses them as a resume watermark — never to prune reads
(`metadata/manifest.py:33-34` vs `storage/reader.py:41-48`, whose glob
wildcards all year/month directories). This module closes that gap:
select only the datasets whose [time_from, time_to] interval overlaps
the query range (the writer widens each dataset's range monotonically
across writes, so the interval is always a sound cover), then hand
Catalyst the explicit path list.

This composes with (does not replace) partition pruning: the manifest
check drops whole datasets driver-side before any listing happens —
e.g. a one-day query over an exchange with thousands of symbols only
schedules scans for symbols that were live that day — and Hive
`year=/month=` pruning then cuts directories inside each surviving
dataset. At 100 TB the manifest stays a metadata-sized driver-side
filter (the cost Delta/Iceberg pay reading their transaction log);
finer file-level skipping is those formats' job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.lake.manifest import ManifestManager


def prune_files(
    manifest: ManifestManager,
    time_from: int | None = None,
    time_to: int | None = None,
    **filters,
) -> list[str]:
    """Dataset paths of manifest entries overlapping [time_from, time_to].

    Interval-overlap predicate (`entry.time_to >= lo AND
    entry.time_from <= hi`) evaluated engine-side over the manifest
    table; only the surviving path strings come back to the driver.
    """
    df = manifest.list_entries(**filters)
    if time_from is not None:
        df = df.where(F.col("time_to") >= time_from)
    if time_to is not None:
        df = df.where(F.col("time_from") <= time_to)
    return [r["path"] for r in df.select("path").collect()]


def read_pruned(
    spark: SparkSession,
    manifest: ManifestManager,
    time_from: int | None = None,
    time_to: int | None = None,
    **filters,
) -> DataFrame | None:
    """Scan exactly the manifest-selected dataset paths, then re-apply
    the ts predicate (interval stats are necessary, not sufficient) and
    sort.

    Returns None when nothing overlaps — the caller decides the empty
    schema, same contract as the reference's empty-read path.
    """
    paths = prune_files(manifest, time_from, time_to, **filters)
    if not paths:
        return None
    # per-dataset snapshot resolution (lake/snapshot.py): pinned
    # datasets scan exactly their committed live files — a raw subtree
    # read would fold in MVCC tombstones awaiting vacuum
    from dl_datalake_spark.lake.fs import get_fs
    from dl_datalake_spark.lake.snapshot import resolve_live_files

    fs = get_fs(_base_of(paths), spark)
    srcs: list[str] = []
    for p in paths:
        live = resolve_live_files(fs, p)
        if live is None:
            srcs.append(p)
            continue
        if live and (time_from is not None or time_to is not None):
            # commit-stats file skipping, same rules as
            # LakeReader._scan_paths: unknown stats are scanned
            from dl_datalake_spark.lake.commitlog import CommitLog

            stats = CommitLog(p, fs=fs).file_stats()
            live = [
                rel
                for rel in live
                if (s := stats.get(rel)) is None
                or s[0] is None
                or s[1] is None
                or (
                    (time_to is None or s[0] <= time_to)
                    and (time_from is None or s[1] >= time_from)
                )
            ]
        srcs.extend(f"{p}/{rel}" for rel in live)
    if not srcs:
        return None
    df = spark.read.option("basePath", _base_of(paths)).parquet(*srcs)
    if time_from is not None:
        df = df.where(F.col("ts") >= time_from)
    if time_to is not None:
        df = df.where(F.col("ts") <= time_to)
    return df.orderBy("ts")


def _base_of(paths: list[str]) -> str:
    """Common base directory so Hive partition columns survive an
    explicit-file-list read."""
    parts = [p.split("/") for p in paths]
    common = []
    for segs in zip(*parts):
        if all(s == segs[0] for s in segs) and "=" not in segs[0]:
            common.append(segs[0])
        else:
            break
    return "/".join(common) or "/"
