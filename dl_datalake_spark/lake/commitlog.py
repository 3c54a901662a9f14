"""Optimistic per-dataset commit log: multi-process-safe write serialization.

Replaces the advisory single-host ``path_lock`` for DATASET WRITES.  The
old lock was a process-local ``threading.Lock`` plus an ``O_EXCL``
lockfile in the local tempdir — correct on one host, invisible to a
writer on another host sharing the same object storage.  This module
puts the coordination state INSIDE the dataset directory, so any writer
that can see the data can see the log (the Delta log mechanic on a
plain filesystem, minus file-level manifests):

    <dataset>/_commits/00000000000000000000.json   (version 0)
    <dataset>/_commits/00000000000000000001.json   (version 1)
    ...

The ``_commits`` name starts with ``_`` so Spark's file index treats it
as hidden — parquet scans of the dataset never see it.

Protocol (writer side, ``CommitLog.transaction()``):

1. **Read** the log: latest version ``v`` = highest numbered file.
2. **Claim** version ``v+1`` by atomically creating ``{v+1}.json`` with
   an in-progress marker (``create_exclusive``).  Exactly one writer
   can win a given version; a loser has by construction observed that a
   commit happened after its read — its snapshot is stale, so it
   re-reads and retries (optimistic validation, no blocking lock).
3. **Write** the data (the read-modify-write the caller runs inside the
   transaction; the claim makes it exclusive, so the snapshot it reads
   is exactly the committed ``v`` state).
4. **Finalize** by atomically replacing the claim file's content with
   the commit payload (``status: committed`` + caller metadata).

A claim that was never finalized (writer crashed) blocks the next
version; after ``stale_timeout_s`` without finalization the next writer
rolls it aside (atomic rename to ``.abandoned``) and takes over — the
rename can only succeed for one contender.  Partial data from a crashed
writer is bounded by Spark's own job-commit protocol (task/job output
lands via its committer; an uncommitted job leaves only temporary
dirs), the same exposure the lockfile design had.

On object storage this needs two primitives from the Filesystem
implementation: atomic create-if-absent (HDFS create(overwrite=false);
S3 conditional PUT via recent Hadoop s3a) and atomic single-file rename
(HDFS native; S3 copy+delete — acceptable here because the rolled-aside
file is garbage either way).  See ``lake/fs.py``.

Reference parity note: the reference serializes writers through a
SQLite file lock (``dl-datalake/src/dl_datalake/metadata/manifest.py:
52-55``) — also single-host.  This log is the piece that makes the
100 TB multi-writer story real.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager

from dl_datalake_spark.lake.fs import Filesystem, LocalFS

LOG_DIR = "_commits"
STALE_TIMEOUT_S = 300.0
CLAIM_POLL_S = 0.05


class CommitConflict(Exception):
    """Another writer committed between our read and our claim."""


class CommitTimeout(TimeoutError):
    """Could not claim a commit slot within the deadline."""


def _fmt(version: int) -> str:
    return f"{version:020d}.json"


class CommitLog:
    def __init__(
        self,
        dataset_path: str,
        fs: Filesystem | None = None,
        stale_timeout_s: float = STALE_TIMEOUT_S,
        log_dir: str | None = None,
    ):
        """`log_dir` defaults to `<dataset_path>/_commits`.  Override it
        when the coordinated state is itself replaced by directory swap
        (e.g. the manifest catalog) — the log must then live OUTSIDE the
        swapped tree or every commit would erase its own history."""
        self.dataset_path = dataset_path.rstrip("/")
        self.log_dir = log_dir.rstrip("/") if log_dir else f"{self.dataset_path}/{LOG_DIR}"
        self.fs = fs if fs is not None else LocalFS()
        self.stale_timeout_s = stale_timeout_s

    # -- log inspection ----------------------------------------------------

    def _entries(self) -> list[int]:
        out = []
        for name in self.fs.listdir(self.log_dir):
            stem, dot, ext = name.partition(".")
            if ext == "json" and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def _read_entry(self, version: int) -> dict:
        try:
            return json.loads(self.fs.read_bytes(f"{self.log_dir}/{_fmt(version)}"))
        except (OSError, ValueError):
            # mid-replace or just rolled aside: treat as in-progress
            return {"status": "in-progress"}

    def latest_version(self) -> int:
        """Highest FINALIZED version; -1 for a fresh dataset."""
        for v in reversed(self._entries()):
            if self._read_entry(v).get("status") == "committed":
                return v
        return -1

    def history(self) -> list[dict]:
        """All finalized commits, oldest first (audit/debug surface)."""
        out = []
        for v in self._entries():
            e = self._read_entry(v)
            if e.get("status") == "committed":
                out.append({"version": v, **{k: e[k] for k in e if k != "status"}})
        return out

    def prune(self, keep_last: int = 100) -> int:
        """Drop all but the newest `keep_last` FINALIZED commit files,
        plus any rolled-aside `.abandoned.*` leftovers.  Version
        numbering is unaffected (the newest files stay, and new claims
        build on the highest retained version).  One tiny file per
        commit adds up — a dataset ingested every minute for a year is
        ~0.5 M files — so this belongs in the same maintenance cadence
        as compaction (`cli maintain`).  Returns files removed."""
        committed = [
            v for v in self._entries() if self._read_entry(v).get("status") == "committed"
        ]
        drop = committed[:-keep_last] if keep_last > 0 else []
        removed = 0
        for v in drop:
            try:
                self.fs.remove(f"{self.log_dir}/{_fmt(v)}")
                removed += 1
            except OSError:
                pass
        for name in self.fs.listdir(self.log_dir):
            if ".abandoned." in name:
                try:
                    self.fs.remove(f"{self.log_dir}/{name}")
                    removed += 1
                except OSError:
                    pass
        return removed

    # -- claim / finalize --------------------------------------------------
    #
    # Fencing: every claim carries a unique `owner_token`.  A writer that
    # outlives `stale_timeout_s` can be usurped (its claim rolled aside and
    # the slot re-claimed by another writer); before finalize/abort we
    # re-read the slot and verify the token, so a usurped zombie raises
    # CommitConflict instead of overwriting the usurper's claim (which
    # would run two read-modify-writes concurrently and misattribute the
    # commit).  A heartbeat thread additionally touches the claim's mtime
    # during the transaction so a LIVE long-running writer (a large Spark
    # merge easily exceeds 300 s) never looks stale in the first place —
    # touch() refuses to recreate a rolled-aside file, so the heartbeat
    # cannot resurrect a lost claim.  Residual window: verify-then-write
    # in _finalize is not CAS, so a usurpation landing in the microseconds
    # between the check and the rename can still be misattributed — the
    # store-level fix needs conditional writes (S3 If-None-Match / etag).

    def _try_rollback_stale(self, version: int) -> None:
        path = f"{self.log_dir}/{_fmt(version)}"
        try:
            age = time.time() - self.fs.getmtime(path)
        except OSError:
            return  # already gone
        if age < self.stale_timeout_s:
            return
        # Atomic roll-aside: exactly one contender's rename succeeds.
        try:
            self.fs.rename(path, f"{path}.abandoned.{uuid.uuid4().hex}")
        except OSError:
            pass

    def _claim(self, version: int, token: str) -> bool:
        marker = json.dumps(
            {
                "status": "in-progress",
                "owner": f"{os.uname().nodename}:{os.getpid()}",
                "owner_token": token,
                "claimed_at": time.time(),
            }
        ).encode()
        self.fs.makedirs(self.log_dir)
        return self.fs.create_exclusive(f"{self.log_dir}/{_fmt(version)}", marker)

    def _owns_claim(self, version: int, token: str) -> bool:
        """Re-read the slot file: do we still hold it?  Missing, unreadable,
        or carrying a different token all mean a contender rolled our
        stale claim aside and took over."""
        try:
            entry = json.loads(self.fs.read_bytes(f"{self.log_dir}/{_fmt(version)}"))
        except (OSError, ValueError):
            return False
        return entry.get("owner_token") == token

    def _finalize(self, version: int, payload: dict | None, token: str) -> None:
        if not self._owns_claim(version, token):
            raise CommitConflict(
                f"claim on version {version} of {self.dataset_path} was usurped "
                f"(transaction exceeded stale_timeout_s={self.stale_timeout_s}); "
                f"this writer's output must not be trusted as committed"
            )
        body = {"status": "committed", "committed_at": time.time(), **(payload or {})}
        self.fs.write_bytes_atomic(
            f"{self.log_dir}/{_fmt(version)}", json.dumps(body).encode()
        )

    def _abort(self, version: int, token: str) -> None:
        # Never delete a slot we no longer own — it is the usurper's
        # live claim now, not ours to release.
        if not self._owns_claim(version, token):
            return
        try:
            self.fs.remove(f"{self.log_dir}/{_fmt(version)}")
        except OSError:
            pass

    def _start_heartbeat(self, version: int, token: str):
        """Daemon thread refreshing the claim's mtime so a live writer
        never crosses the stale threshold.  Returns a stop callable."""
        import threading

        path = f"{self.log_dir}/{_fmt(version)}"
        interval = max(min(self.stale_timeout_s / 3.0, 60.0), 0.05)
        stop = threading.Event()

        def beat():
            while not stop.wait(interval):
                try:
                    self.fs.touch(path)  # raises if rolled aside: stop
                except OSError:
                    return

        t = threading.Thread(target=beat, name=f"commit-heartbeat-{version}", daemon=True)
        t.start()

        def stopper():
            stop.set()
            t.join(timeout=5.0)

        return stopper

    @contextmanager
    def transaction(self, timeout: float = 60.0, payload: dict | None = None):
        """Claim the next commit slot, run the caller's read-modify-write
        exclusively, finalize on success, release the slot on failure.

        Yields a dict the caller may mutate to add commit metadata
        (rows, time range, ...) — it is persisted into the commit file.
        """
        deadline = time.monotonic() + timeout
        conflicts = 0
        token = uuid.uuid4().hex
        while True:
            entries = self._entries()
            committed = -1
            pending = None
            for v in entries:
                if self._read_entry(v).get("status") == "committed":
                    committed = max(committed, v)
                else:
                    pending = v if pending is None else min(pending, v)
            if pending is not None and pending > committed:
                # someone's write is in flight ahead of us
                self._try_rollback_stale(pending)
                if time.monotonic() > deadline:
                    raise CommitTimeout(
                        f"commit slot {pending} of {self.dataset_path} held "
                        f"in-progress past deadline"
                    )
                time.sleep(CLAIM_POLL_S)
                continue
            nxt = committed + 1
            if self._claim(nxt, token):
                break
            # claim lost: a concurrent writer took nxt — our snapshot is
            # stale; loop re-reads the log and retries (optimistic retry)
            conflicts += 1
            if time.monotonic() > deadline:
                raise CommitTimeout(
                    f"lost {conflicts} claim races on {self.dataset_path} "
                    f"within {timeout}s"
                )
            time.sleep(CLAIM_POLL_S)

        meta: dict = dict(payload or {})
        if conflicts:
            meta["claim_conflicts"] = conflicts
        stop_heartbeat = self._start_heartbeat(nxt, token)
        try:
            yield meta
        except BaseException:
            stop_heartbeat()
            self._abort(nxt, token)
            raise
        stop_heartbeat()
        self._finalize(nxt, meta, token)
