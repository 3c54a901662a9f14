"""Driver-side mutual exclusion for lake read-modify-write sections.

Both the manifest catalog and a dataset upsert are load → merge → store
cycles; without exclusion two concurrent writers lose one side's rows
(the reference serializes the same sections behind SQLite's file lock,
`metadata/manifest.py:52-55`, 30 s timeout). In-process contention gets
a per-path threading.Lock; cross-process contention an O_EXCL lockfile
with the same 30 s timeout. This is driver-local metadata coordination
only — executor data-plane parallelism is untouched. A shared
deployment would swap this for Delta/Iceberg optimistic commits.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import tempfile
import threading
import time

_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()
LOCK_TIMEOUT_S = 30.0


def _thread_lock(path: str) -> threading.Lock:
    with _LOCKS_GUARD:
        if path not in _LOCKS:
            _LOCKS[path] = threading.Lock()
        return _LOCKS[path]


def _lockfile_for(path: str) -> str:
    """Lockfiles live OUTSIDE the locked tree (tempdir, keyed by path
    hash): a stray file inside a Hive-partitioned lake directory would
    confuse partition discovery."""
    digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()
    d = os.path.join(tempfile.gettempdir(), "dl_lake_locks")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, digest + ".lock")


@contextlib.contextmanager
def path_lock(path: str, timeout: float = LOCK_TIMEOUT_S):
    lock = _thread_lock(path)
    if not lock.acquire(timeout=timeout):
        raise TimeoutError(f"lock timeout ({timeout}s): {path}")
    lockfile = _lockfile_for(path)
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fd = os.open(lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"lockfile timeout ({timeout}s): {lockfile}") from None
                time.sleep(0.05)
        try:
            yield
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.remove(lockfile)
    finally:
        lock.release()
