"""Concurrent download scheduler (SURVEY §2.9 T9).

Re-expresses the reference UI's `backend/routers/ingest.py:33-202`
DownloadManager: a global worker pool, a per-exchange concurrency cap,
a task registry with a pending → running → completed/failed lifecycle,
and a connector-instance cache — all strictly driver-side. The Spark
data plane is untouched: each worker just calls
`ExchangeConnector.download_ohlcv`, and Spark's own scheduler
parallelizes the writes those produce.

On a real cluster this is exactly where ingest concurrency belongs:
N slow REST cursors run on driver threads while every flush fans out
to executors; the per-exchange semaphore is the politeness cap the
exchange's rate limiter demands, independent of cluster size.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field


@dataclass
class DownloadTask:
    task_id: str
    exchange: str
    symbol: str
    status: str = "pending"          # pending → running → completed | failed
    rows: int = 0
    error: str | None = None
    _done: threading.Event = field(default_factory=threading.Event)

    def wait(self, timeout: float | None = None) -> bool:
        return self._done.wait(timeout)


class DownloadManager:
    """Global pool of `max_workers`, at most `per_exchange` concurrent
    downloads per exchange (reference: 20 global / 5 per exchange,
    ingest.py:36-39,202)."""

    def __init__(
        self,
        connector_factory: Callable[[str], object],
        max_workers: int = 20,
        per_exchange: int = 5,
    ):
        self._factory = connector_factory
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._per_exchange = per_exchange
        self._semaphores: dict[str, threading.Semaphore] = {}
        self._connectors: dict[str, object] = {}
        self._tasks: dict[str, DownloadTask] = {}
        self._lock = threading.Lock()

    # -- registry -----------------------------------------------------------
    def _semaphore(self, exchange: str) -> threading.Semaphore:
        with self._lock:
            if exchange not in self._semaphores:
                self._semaphores[exchange] = threading.Semaphore(self._per_exchange)
            return self._semaphores[exchange]

    def connector(self, exchange: str):
        """Exchange-instance cache (ingest.py:44-56 semantics)."""
        with self._lock:
            if exchange not in self._connectors:
                self._connectors[exchange] = self._factory(exchange)
            return self._connectors[exchange]

    def get_task(self, task_id: str) -> DownloadTask | None:
        return self._tasks.get(task_id)

    def list_tasks(self) -> list[DownloadTask]:
        return list(self._tasks.values())

    # -- submission ---------------------------------------------------------
    def submit(self, exchange: str, symbol: str, run: Callable[[object], int]) -> DownloadTask:
        """Queue `run(connector) -> rows_written` for `symbol` on
        `exchange`; returns immediately with a registered task."""
        task = DownloadTask(task_id=uuid.uuid4().hex, exchange=exchange, symbol=symbol)
        self._tasks[task.task_id] = task
        sem = self._semaphore(exchange)

        def work():
            with sem:
                task.status = "running"
                try:
                    task.rows = run(self.connector(exchange))
                    task.status = "completed"
                except Exception as e:  # noqa: BLE001 — task boundary
                    task.status = "failed"
                    task.error = str(e)
                finally:
                    task._done.set()

        future: Future = self._pool.submit(work)
        task._future = future  # type: ignore[attr-defined]
        return task

    def shutdown(self, wait: bool = True):
        self._pool.shutdown(wait=wait)
