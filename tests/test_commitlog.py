"""Commit-log protocol tests: multi-process conflict detection & retry.

These run WITHOUT Spark — the protocol is pure filesystem — so the
cross-process test can hammer the log hard (many real OS processes,
every transaction a read-modify-write) in a couple of seconds.  The
Spark-level concurrent writer behavior is covered in test_lake_writer
(threads) and test_commitlog_multiprocess_spark (two driver processes).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.lake.commitlog import CommitLog, CommitTimeout
from dl_datalake_spark.lake.fs import Filesystem, LocalFS, get_fs, has_visible_children


# ---------------------------------------------------------------------------
# single-process protocol basics
# ---------------------------------------------------------------------------
def test_commit_versions_are_contiguous_and_payload_persisted(tmp_path):
    log = CommitLog(str(tmp_path / "ds"))
    assert log.latest_version() == -1
    for i in range(3):
        with log.transaction(payload={"mode": "upsert"}) as meta:
            meta["rows"] = i * 10
    hist = log.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["rows"] for h in hist] == [0, 10, 20]
    assert all(h["mode"] == "upsert" for h in hist)
    assert log.latest_version() == 2


def test_failed_transaction_releases_slot(tmp_path):
    log = CommitLog(str(tmp_path / "ds"))
    with pytest.raises(RuntimeError):
        with log.transaction():
            raise RuntimeError("writer blew up")
    # slot was released, next transaction takes version 0
    with log.transaction():
        pass
    assert log.latest_version() == 0


def test_pending_claim_blocks_until_timeout(tmp_path):
    log = CommitLog(str(tmp_path / "ds"))
    with log.transaction():
        pass
    assert log._claim(1, "stuck-token")  # stuck writer
    with pytest.raises(CommitTimeout):
        with log.transaction(timeout=0.3):
            pass


def test_commits_dir_is_invisible_to_data_checks(tmp_path):
    ds = tmp_path / "ds"
    log = CommitLog(str(ds))
    with log.transaction():
        pass
    fs = LocalFS()
    assert fs.isdir(str(ds))
    assert not has_visible_children(fs, str(ds))  # only _commits inside
    (ds / "year=2023").mkdir()
    assert has_visible_children(fs, str(ds))


# ---------------------------------------------------------------------------
# cross-process: N real processes, each doing read-modify-write increments
# through transactions; conflicts must retry, nothing may be lost
# ---------------------------------------------------------------------------
def _worker(ds_path: str, n_iters: int, out_q, barrier=None) -> None:
    log = CommitLog(ds_path)
    counter = os.path.join(ds_path, "counter.json")
    conflicts = 0
    if barrier is not None:
        # All workers reach here only after paying their own interpreter
        # startup/import cost, then start the transaction loop TOGETHER:
        # without this, spawn startup skew on a fast box can serialize
        # the workers entirely (each finishes its 25 pure-filesystem
        # iterations before the next finishes importing) and the
        # at-least-one-claim-race assertion below turns flaky.
        barrier.wait(timeout=120)
    for _ in range(n_iters):
        with log.transaction(timeout=60.0) as meta:
            # read-modify-write under the claimed slot: this is exactly
            # the writer's merge-and-overwrite shape
            try:
                with open(counter) as fh:
                    state = json.load(fh)
            except FileNotFoundError:
                state = {"total": 0}
            state["total"] += 1
            tmp = f"{counter}.tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(state, fh)
            os.replace(tmp, counter)
            conflicts += meta.get("claim_conflicts", 0)
    out_q.put(conflicts)


def test_two_process_writers_lose_nothing_and_detect_conflicts(tmp_path):
    ds = tmp_path / "ds"
    ds.mkdir()
    n_procs, n_iters = 4, 25
    ctx = mp.get_context("spawn")  # no inherited fds/locks: real isolation
    q = ctx.Queue()
    barrier = ctx.Barrier(n_procs)  # synchronized start => real contention
    procs = [
        ctx.Process(target=_worker, args=(str(ds), n_iters, q, barrier))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=180)
        assert p.exitcode == 0
    conflict_counts = [q.get(timeout=10) for _ in procs]

    with open(ds / "counter.json") as fh:
        total = json.load(fh)["total"]
    assert total == n_procs * n_iters  # every increment survived

    log = CommitLog(str(ds))
    hist = log.history()
    assert [h["version"] for h in hist] == list(range(n_procs * n_iters))
    # with 4 processes hammering one log, at least one claim race must
    # have happened and been retried (recorded in the commit payloads)
    assert sum(conflict_counts) > 0 or any("claim_conflicts" in h for h in hist)
    # regression guard on retry cost (VERDICT r8 #5, measured in
    # scripts/commit_scaling.py: 0.08-0.29 retries/commit at 2-8
    # writers): a claim race is only lost to a writer that COMMITTED in
    # between, so total retries are bounded by commits x contenders; a
    # spin regression (claims lost without progress) blows well past it
    total_commits = n_procs * n_iters
    assert sum(conflict_counts) <= total_commits * (n_procs - 1), (
        f"retry storm: {sum(conflict_counts)} claim retries for "
        f"{total_commits} commits from {n_procs} writers"
    )


# ---------------------------------------------------------------------------
# Filesystem abstraction: a non-os fake backend drives the whole protocol
# ---------------------------------------------------------------------------
class DictFS(Filesystem):
    """In-memory Filesystem: proves the lake's driver-side discovery and
    the commit log run entirely through the abstraction (no os calls)."""

    def __init__(self):
        self.files: dict[str, bytes] = {}
        self.dirs: set[str] = set()
        self.mtimes: dict[str, float] = {}
        self._clock = 0.0

    def _children(self, path):
        path = path.rstrip("/") + "/"
        names = set()
        for p in list(self.files) + list(self.dirs):
            if p.startswith(path):
                names.add(p[len(path):].split("/", 1)[0])
        return names

    def listdir(self, path):
        return sorted(self._children(path))

    def isdir(self, path):
        return path.rstrip("/") in self.dirs or bool(self._children(path))

    def exists(self, path):
        return path in self.files or self.isdir(path)

    def walk_files(self, path):
        path = path.rstrip("/") + "/"
        for p in sorted(self.files):
            if p.startswith(path):
                d, _, f = p.rpartition("/")
                yield d, f

    def getmtime(self, path):
        if path not in self.mtimes:
            raise OSError(path)
        return self.mtimes[path]

    def getsize(self, path):
        return len(self.files[path])

    def makedirs(self, path):
        self.dirs.add(path.rstrip("/"))

    def remove(self, path):
        if path not in self.files:
            raise OSError(path)
        del self.files[path]
        self.mtimes.pop(path, None)

    def rmtree(self, path):
        path = path.rstrip("/")
        for p in [p for p in self.files if p.startswith(path + "/")]:
            del self.files[p]
        self.dirs = {d for d in self.dirs if not (d == path or d.startswith(path + "/"))}

    def rename(self, src, dst):
        if src in self.files:
            if dst in self.files:
                raise OSError(f"exists: {dst}")
            self.files[dst] = self.files.pop(src)
            self.mtimes[dst] = self.mtimes.pop(src)
        elif self.isdir(src):
            for p in [p for p in self.files if p.startswith(src + "/")]:
                self.files[dst + p[len(src):]] = self.files.pop(p)
            self.dirs = {dst + d[len(src):] if d.startswith(src) else d for d in self.dirs}
        else:
            raise OSError(f"missing: {src}")

    def read_bytes(self, path):
        if path not in self.files:
            raise OSError(path)
        return self.files[path]

    def write_bytes_atomic(self, path, data):
        self._clock += 1
        self.files[path] = data
        self.mtimes[path] = self._clock

    def create_exclusive(self, path, data):
        if path in self.files:
            return False
        self._clock += 1
        self.files[path] = data
        self.mtimes[path] = self._clock
        return True

    def touch(self, path):
        if path not in self.files:
            raise OSError(path)
        self._clock += 1
        self.mtimes[path] = self._clock


def test_commitlog_runs_on_fake_filesystem():
    fs = DictFS()
    log = CommitLog("/lake/ds", fs=fs)
    with log.transaction(payload={"mode": "upsert"}) as meta:
        meta["rows"] = 5
    with log.transaction() as meta:
        meta["rows"] = 7
    assert [h["rows"] for h in log.history()] == [5, 7]
    assert log.latest_version() == 1
    # claims + finalized files all went through the fake
    assert all(p.startswith("/lake/ds/_commits/") for p in fs.files)


def test_reader_path_discovery_on_fake_filesystem():
    """LakeReader's partition-level discovery (list symbols, probe
    dataset dirs) works against a backend that is not `os` at all."""
    from dl_datalake_spark.lake.reader import LakeReader

    fs = DictFS()
    base = "/lake"
    for sym in ("AAA_USD", "BBB_USD"):
        fs.makedirs(f"{base}/exchange=BINANCE/market=SPOT/symbol={sym}"
                    f"/data_type=raw/period=1m/year=2023/month=1")
        fs.files[
            f"{base}/exchange=BINANCE/market=SPOT/symbol={sym}"
            f"/data_type=raw/period=1m/year=2023/month=1/part-0.parquet"
        ] = b""
    # control dirs must stay invisible to discovery
    fs.makedirs(f"{base}/exchange=BINANCE/market=SPOT/symbol=AAA_USD"
                f"/data_type=raw/period=1m/_commits")

    reader = LakeReader.__new__(LakeReader)
    reader.spark = None
    reader.base_path = base
    reader.fs = fs
    assert reader.list_symbols() == ["AAA_USD", "BBB_USD"]
    assert reader.list_symbols("binance") == ["AAA_USD", "BBB_USD"]
    paths = reader._dataset_paths("BINANCE", "AAA_USD", "raw", None, None)
    assert paths == [
        f"{base}/exchange=BINANCE/market=SPOT/symbol=AAA_USD/data_type=raw/period=1m"
    ]
    # a dataset dir holding only its commit log is NOT scannable data
    fs.makedirs(f"{base}/exchange=BINANCE/market=SPOT/symbol=CCC_USD"
                f"/data_type=raw/period=9m/_commits")
    assert reader._dataset_paths("BINANCE", "CCC_USD", "raw", None, None) == []


def test_get_fs_scheme_dispatch(tmp_path):
    assert isinstance(get_fs(str(tmp_path)), LocalFS)
    assert isinstance(get_fs("file:///x"), LocalFS)
    with pytest.raises(ValueError):
        get_fs("s3a://bucket/lake")  # needs a SparkSession for Hadoop conf


# ---------------------------------------------------------------------------
# two REAL Spark driver processes upserting the same dataset concurrently
# ---------------------------------------------------------------------------
_SPARK_WRITER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.lake.writer import LakeWriter

offset = int(sys.argv[1]); base = sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("two-proc-writer-" + str(offset))
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .getOrCreate()
)
start = 1672574400000
rows = [(start + (offset + i) * 60000, float(offset + i)) for i in range(30)]
df = spark.createDataFrame(rows, "ts long, price double")
w = LakeWriter(spark, base, commit_timeout_s=300.0)
res = w.write_ticks(df, DatasetKey("BINANCE", "SPOT", "XYZUSDT", "ticks", "1m"))
assert res.rows >= 30, res
spark.stop()
"""


def test_two_spark_driver_processes_upsert_without_losing_rows(tmp_path):
    """Two independent Spark DRIVER processes (separate JVMs — the
    single-host stand-in for two hosts sharing object storage) upsert
    disjoint ts ranges of the SAME dataset concurrently.  The old
    advisory lock lived in each process's tempdir view; the commit log
    lives in the dataset directory, so the writers serialize through it
    and both batches survive."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = str(tmp_path / "lake")
    script = _SPARK_WRITER_SCRIPT.format(repo=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(off), base],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for off in (0, 30)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")[-3000:]

    # verify from a THIRD session: all 60 rows present, none clobbered
    from dl_datalake_spark.lake.commitlog import CommitLog
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.session import get_spark

    from dl_datalake_spark.lake.reader import LakeReader

    spark = get_spark("two-proc-verify")
    w = LakeWriter(spark, base)
    key = DatasetKey("BINANCE", "SPOT", "XYZUSDT", "ticks", "1m")
    # the committed SNAPSHOT (pinned file list) holds exactly the 60
    # merged rows; the raw directory additionally holds the first
    # writer's superseded file as an MVCC tombstone awaiting vacuum
    got = LakeReader(spark, base).read_dataset(key)
    assert got.count() == 60
    assert got.select("ts").distinct().count() == 60
    raw = spark.read.option("basePath", base).parquet(w.dataset_path(key))
    assert raw.count() >= 60  # tombstones visible only to raw dir reads

    hist = CommitLog(w.dataset_path(key)).history()
    assert [h["version"] for h in hist] == [0, 1]
    assert sum(h["rows"] for h in hist) >= 60  # second commit saw 60 merged


def test_prune_keeps_newest_and_numbering_continues(tmp_path):
    ds = tmp_path / "ds"
    log = CommitLog(str(ds))
    for i in range(7):
        with log.transaction() as meta:
            meta["i"] = i
    # leave an abandoned roll-aside behind too
    assert log._claim(7, "stuck-token")
    log.stale_timeout_s = 0.0
    log._try_rollback_stale(7)
    # default TTL keeps the FRESH roll-aside leftovers (audit trail of a
    # usurpation that just happened); only the four old commits go
    removed = log.prune(keep_last=3)
    assert removed == 4
    # a zero TTL sweeps both leftovers (abandoned slot AND its consumed
    # fence — the CAS rename leaves both token-named)
    assert log.prune(keep_last=3, abandoned_ttl_s=0.0) == 2
    assert [h["version"] for h in log.history()] == [4, 5, 6]
    assert log.latest_version() == 6
    with log.transaction() as meta:
        meta["i"] = 7
    assert log.latest_version() == 7


def test_prune_commit_logs_walks_lake(tmp_path, spark):
    from dl_datalake_spark.lake.maintenance import prune_commit_logs

    base = tmp_path / "lake"
    for sym in ("AAA", "BBB"):
        ds = base / f"exchange=X/market=SPOT/symbol={sym}/data_type=raw/period=1m"
        log = CommitLog(str(ds))
        for _ in range(5):
            with log.transaction():
                pass
    rep = prune_commit_logs(spark, str(base), keep_last=2)
    assert len(rep) == 2 and all(n == 3 for n in rep.values())
    for sym in ("AAA", "BBB"):
        ds = base / f"exchange=X/market=SPOT/symbol={sym}/data_type=raw/period=1m"
        assert [h["version"] for h in CommitLog(str(ds)).history()] == [3, 4]


# ---------------------------------------------------------------------------
# HadoopFS: the object-storage path, exercised via the JVM against
# file:// URIs (same code path an s3a:// base takes, minus the store)
# ---------------------------------------------------------------------------
def test_hadoopfs_primitives_roundtrip(spark, tmp_path):
    from dl_datalake_spark.lake.fs import HadoopFS, get_fs

    base = f"file://{tmp_path}"
    fs = get_fs(base, spark)
    assert isinstance(fs, HadoopFS)
    fs.makedirs(f"{base}/d1/d2")
    assert fs.isdir(f"{base}/d1") and not fs.isdir(f"{base}/nope")
    assert fs.create_exclusive(f"{base}/d1/a.json", b'{"x":1}')
    assert not fs.create_exclusive(f"{base}/d1/a.json", b'{"x":2}')  # atomic-ish claim
    assert fs.read_bytes(f"{base}/d1/a.json") == b'{"x":1}'
    fs.write_bytes_atomic(f"{base}/d1/a.json", b'{"x":3}')
    assert fs.read_bytes(f"{base}/d1/a.json") == b'{"x":3}'
    assert sorted(fs.listdir(f"{base}/d1")) == ["a.json", "d2"]
    fs.rename(f"{base}/d1/a.json", f"{base}/d1/b.json")
    assert [(d.rsplit("/", 1)[-1], f) for d, f in fs.walk_files(base)] == [("d1", "b.json")]
    assert fs.getsize(f"{base}/d1/b.json") == 7
    fs.remove(f"{base}/d1/b.json")
    fs.rmtree(f"{base}/d1")
    assert not fs.exists(f"{base}/d1")


def test_get_fs_autoselects_conditional_cas_for_object_store_schemes(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7: get_fs must hand object-store schemes the
    ConditionalConsumeFS-mixed class so fence consumption never rides a
    copy+delete rename. s3a/gs are in the default set; the env override
    lets a deployment reroute any scheme (exercised here with file:// so
    the JVM branch actually constructs)."""
    from dl_datalake_spark.lake.fs import (
        OBJECT_STORE_SCHEMES,
        ConditionalConsumeFS,
        HadoopFS,
        ObjectStoreFS,
        get_fs,
    )

    assert {"s3a", "s3", "gs"} <= OBJECT_STORE_SCHEMES
    # the mixin override wins over HadoopFS's bare-rename default
    assert ObjectStoreFS.consume_rename is ConditionalConsumeFS.consume_rename
    # default set: file:// stays plain HadoopFS
    fs_plain = get_fs(f"file://{tmp_path}", spark)
    assert isinstance(fs_plain, HadoopFS) and not isinstance(fs_plain, ObjectStoreFS)
    # env override reroutes the scheme through the conditional-CAS class
    monkeypatch.setenv("DL_OBJECT_STORE_SCHEMES", "file,s3a")
    fs = get_fs(f"file://{tmp_path}", spark)
    assert isinstance(fs, ObjectStoreFS)


def test_objectstore_fs_commit_and_fence_consume_over_jvm(spark, tmp_path):
    """The commit lifecycle + marker-based fence consumption over
    ObjectStoreFS with a real JVM Hadoop filesystem (file:// stands in
    for s3a://): the conditional-create marker path must work end-to-end
    through create(overwrite=false).

    Deliberately NOT a thread race: RawLocalFileSystem's
    create(overwrite=false) is CHECK-THEN-CREATE (the HadoopFS
    docstring's documented caveat — a 6-thread race over local-JVM was
    observed double-winning under load), so local contention proves
    nothing about the production guarantee, which targets backends with
    a truly conditional create (S3 If-None-Match, HDFS atomic create).
    Exactly-one-winner under contention is pinned against an atomic
    exclusive-create backend in
    test_consume_rename_exactly_one_winner_on_nonatomic_backend; this
    test pins the JVM plumbing: marker claim, winner cleanup, consumed
    fences staying consumed, and a held marker blocking consumption."""
    from dl_datalake_spark.lake.fs import ObjectStoreFS

    base = f"file://{tmp_path}/oslake"
    fs = ObjectStoreFS(spark, base)
    ds = f"{base}/ds"

    log = CommitLog(ds, fs=fs)
    with log.transaction() as meta:
        meta["rows"] = 3
    with log.transaction() as meta:
        meta["rows"] = 4
    assert log.latest_version() == 1
    assert [h["rows"] for h in log.history()] == [3, 4]

    # marker-based consume through the JVM conditional create
    src = f"{base}/ds/_commits/000000000000.fence.racetok"
    fs.write_bytes_atomic(src, b"fence")
    assert fs.consume_rename(src, f"{src}.abandoned.0") is True
    assert not fs.exists(src)
    assert not fs.exists(f"{src}.consumed")  # winner cleaned its marker
    assert fs.exists(f"{src}.abandoned.0")
    # a consumed fence can never be consumed again
    assert fs.consume_rename(src, f"{src}.abandoned.1") is False
    # a held marker blocks consumption and leaves the fence untouched
    src2 = f"{base}/ds/_commits/000000000001.fence.tok2"
    fs.write_bytes_atomic(src2, b"fence")
    assert fs.create_exclusive(f"{src2}.consumed", b"held")
    assert fs.consume_rename(src2, f"{src2}.abandoned.x") is False
    assert fs.exists(src2)


def test_lake_write_read_over_hadoopfs_scheme_base(spark, tmp_path):
    """Full writer -> commit log -> reader cycle with a scheme-prefixed
    base path: every driver-side discovery call and the commit protocol
    run through the JVM Hadoop filesystem, the shape an s3a:// lake
    uses."""
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    base = f"file://{tmp_path}/lake"
    w = LakeWriter(spark, base)
    key = DatasetKey("BINANCE", "SPOT", "BTCUSDT", "ticks", "1m")
    start = 1672574400000
    df = spark.createDataFrame(
        [(start + i * 60000, float(i)) for i in range(10)], "ts long, price double"
    )
    w.write_ticks(df, key)
    # upsert a second overlapping batch through the same scheme base
    df2 = spark.createDataFrame(
        [(start + i * 60000, 100.0 + i) for i in range(5, 15)], "ts long, price double"
    )
    w.write_ticks(df2, key)

    r = LakeReader(spark, base)
    got = r.read_dataset(key)
    assert got.count() == 15
    assert got.where(F.col("price") >= 100.0).count() == 10  # keep-last won
    assert r.list_symbols("BINANCE") == ["BTCUSDT"]
    hist = w.commit_log(key).history()
    assert [h["version"] for h in hist] == [0, 1]


# ---------------------------------------------------------------------------
# CDC-lite: commits record touched partitions; consumers read only them
# ---------------------------------------------------------------------------
def test_read_changes_since_reads_only_touched_partitions(spark, tmp_path):
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    r = LakeReader(spark, base)
    key = DatasetKey("BINANCE", "SPOT", "BTCUSDT", "ticks", "1m")
    jan = 1672574400000  # 2023-01-01
    mar = 1677660000000  # 2023-03-01

    # commit 0: january data
    w.write_ticks(
        spark.createDataFrame(
            [(jan + i * 60000, 1.0) for i in range(10)], "ts long, price double"
        ),
        key,
    )
    # fresh consumer: everything since "before the beginning"
    df, cursor = r.read_changes_since(key, after_version=-1)
    assert cursor == 0 and df.count() == 10

    # caught-up consumer: nothing new
    df2, cursor2 = r.read_changes_since(key, after_version=cursor)
    assert df2 is None and cursor2 == 0

    # commit 1: march data — the incremental read returns ONLY march
    w.write_ticks(
        spark.createDataFrame(
            [(mar + i * 60000, 2.0) for i in range(5)], "ts long, price double"
        ),
        key,
    )
    df3, cursor3 = r.read_changes_since(key, after_version=cursor)
    assert cursor3 == 1
    assert df3.count() == 5
    months = {(x["year"], x["month"]) for x in df3.select("year", "month").distinct().collect()}
    assert months == {(2023, 3)}
    # the commit record itself carries the touched partitions
    hist = w.commit_log(key).history()
    assert hist[-1]["partitions"] == [[2023, 3]]
    assert hist[0]["partitions"] == [[2023, 1]]

    # commit 2 touches january again -> incremental read = january only
    w.write_ticks(
        spark.createDataFrame([(jan, 9.0)], "ts long, price double"), key
    )
    df4, cursor4 = r.read_changes_since(key, after_version=cursor3)
    assert cursor4 == 2
    assert {(x["year"], x["month"]) for x in df4.select("year", "month").distinct().collect()} == {(2023, 1)}
    assert df4.where(F.col("price") == 9.0).count() == 1  # upserted row visible
    assert df4.count() == 10  # partition granularity: whole month returned


_MULTI_WRITER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from dl_datalake_spark.lake.writer import LakeWriter

offset = int(sys.argv[1]); base = sys.argv[2]; syms = sys.argv[3].split(",")
spark = (
    SparkSession.builder.master("local[2]")
    .appName("two-proc-multi-" + str(offset))
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .getOrCreate()
)
start = 1672574400000
rows = [
    (sym, start + (offset + i) * 60000, 1.0, 2.0, 0.5, 1.5, 10.0)
    for sym in syms
    for i in range(10)
]
df = spark.createDataFrame(
    rows,
    "symbol string, ts long, open double, high double, low double, close double, volume double",
)
w = LakeWriter(spark, base, commit_timeout_s=300.0)
out = w.write_ohlc_multi(df, "BINANCE", "SPOT")
assert set(out) == set(syms), out
spark.stop()
"""


def test_two_process_multi_writes_with_overlapping_symbols(tmp_path):
    """Two Spark DRIVER processes running write_ohlc_multi with
    OVERLAPPING symbol sets: sorted-order commit-log claims serialize
    the shared dataset across processes, disjoint ts ranges both
    survive on it, and each touched dataset's log shows the commits."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = str(tmp_path / "lake")
    script = _MULTI_WRITER_SCRIPT.format(repo=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(off), base, syms],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for off, syms in ((0, "AAA_USD,BBB_USD"), (10, "BBB_USD,CCC_USD"))
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")[-3000:]

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.session import get_spark

    spark = get_spark("two-proc-multi-verify")
    r = LakeReader(spark, base)
    w = LakeWriter(spark, base)
    # the shared symbol holds BOTH processes' disjoint ts ranges
    shared = r.read_dataset(DatasetKey("BINANCE", "SPOT", "BBB_USD", "raw", "1m"))
    assert shared.count() == 20
    assert shared.select("ts").distinct().count() == 20
    for sym, expect_commits in (("AAA_USD", 1), ("BBB_USD", 2), ("CCC_USD", 1)):
        hist = w.commit_log(DatasetKey("BINANCE", "SPOT", sym, "raw", "1m")).history()
        assert len(hist) == expect_commits, (sym, hist)
        assert all(h["multi"] for h in hist)


def test_sigkilled_writer_claim_is_taken_over(tmp_path):
    """A writer killed with SIGKILL mid-transaction (no cleanup code
    runs) leaves an unfinalized claim; after the stale timeout the next
    writer rolls it aside and takes the slot — the lake cannot be
    wedged by a dead process."""
    import signal
    import subprocess
    import sys
    import time

    ds = str(tmp_path / "ds")
    script = f"""
import sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from dl_datalake_spark.lake.commitlog import CommitLog
log = CommitLog({ds!r})
with log.transaction() as meta:
    print("claimed", flush=True)
    time.sleep(300)  # hold the claim until killed
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", script], stdout=subprocess.PIPE, text=True
    )
    assert proc.stdout.readline().strip() == "claimed"
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)

    log = CommitLog(ds, stale_timeout_s=0.5)
    # immediately after the kill the claim still blocks (not yet stale)
    with pytest.raises(CommitTimeout):
        with log.transaction(timeout=0.2):
            pass
    time.sleep(0.6)
    # past the stale timeout: roll-aside + takeover
    with log.transaction(timeout=10.0) as meta:
        meta["recovered"] = True
    hist = log.history()
    assert [h["version"] for h in hist] == [0]
    assert hist[0]["recovered"] is True
    # the dead writer's claim was rolled aside, not silently reused
    assert any(".abandoned." in n for n in os.listdir(os.path.join(ds, "_commits")))


# ---------------------------------------------------------------------------
# fencing: a usurped writer must not clobber the usurper's claim
# ---------------------------------------------------------------------------
def _slot(ds_path: str, version: int) -> str:
    return os.path.join(ds_path, "_commits", f"{version:020d}.json")


def test_usurped_finalize_raises_and_leaves_usurper_claim(tmp_path):
    """A writer whose claim was rolled aside (it looked stale) must fail
    its finalize with CommitConflict instead of recreating the slot file
    and overwriting the usurper's live claim — that would run two
    read-modify-writes concurrently and misattribute the commit."""
    from dl_datalake_spark.lake.commitlog import CommitConflict

    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    usurper = CommitLog(ds)
    with pytest.raises(CommitConflict):
        with log.transaction() as meta:
            # simulate the stale-timeout takeover happening mid-transaction
            # through the REAL roll-aside protocol (fence consume first)
            CommitLog(ds, stale_timeout_s=0.0)._try_rollback_stale(0)
            assert usurper._claim(0, "usurper-token")
            meta["rows"] = 1
    entry = json.loads(open(_slot(ds, 0)).read())
    assert entry["owner_token"] == "usurper-token"
    assert entry["status"] == "in-progress"  # not overwritten as committed
    assert log.latest_version() == -1  # nothing was misrecorded


def test_usurped_abort_never_deletes_usurper_claim(tmp_path):
    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    usurper = CommitLog(ds)
    with pytest.raises(RuntimeError, match="writer blew up"):
        with log.transaction():
            CommitLog(ds, stale_timeout_s=0.0)._try_rollback_stale(0)
            assert usurper._claim(0, "usurper-token")
            raise RuntimeError("writer blew up")
    # the zombie's abort left the usurper's claim alone
    entry = json.loads(open(_slot(ds, 0)).read())
    assert entry["owner_token"] == "usurper-token"


def test_heartbeat_keeps_live_long_transaction_from_looking_stale(tmp_path):
    """A live writer running longer than stale_timeout_s is protected by
    the claim heartbeat: contenders' roll-aside probes see a fresh mtime
    and never usurp it."""
    import time

    ds = str(tmp_path / "ds")
    log = CommitLog(ds, stale_timeout_s=0.4)
    contender = CommitLog(ds, stale_timeout_s=0.4)
    with log.transaction() as meta:
        for _ in range(4):  # hold well past the stale timeout
            time.sleep(0.25)
            contender._try_rollback_stale(0)  # must be a no-op every time
        meta["rows"] = 7
    assert log.latest_version() == 0
    assert log.history()[0]["rows"] == 7
    assert not any(
        ".abandoned." in n for n in os.listdir(os.path.join(ds, "_commits"))
    )


# ---------------------------------------------------------------------------
# CDC prune-truncation guard: a cursor older than the retained history
# must trigger the full-scan fallback, never a silently partial slice
# ---------------------------------------------------------------------------
def test_read_changes_since_falls_back_when_history_pruned(spark, tmp_path):
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    base = str(tmp_path / "lake")
    w = LakeWriter(spark, base)
    r = LakeReader(spark, base)
    key = DatasetKey("BINANCE", "SPOT", "BTCUSDT", "ticks", "1m")
    jan = 1672574400000  # 2023-01-01
    mar = 1677660000000  # 2023-03-01

    w.write_ticks(spark.createDataFrame([(jan, 1.0)], "ts long, price double"), key)      # v0: jan
    w.write_ticks(spark.createDataFrame([(mar, 2.0)], "ts long, price double"), key)      # v1: mar
    w.write_ticks(spark.createDataFrame([(jan + 60000, 3.0)], "ts long, price double"), key)  # v2: jan
    log = w.commit_log(key)
    assert log.prune(keep_last=1) == 2  # only v2 retained

    # cursor=0: v1 (march) was pruned — touched-set would say jan-only;
    # the truncation guard must force the full-dataset fallback instead
    df, cursor = r.read_changes_since(key, after_version=0)
    assert cursor == 2
    months = {(x["year"], x["month"]) for x in df.select("year", "month").distinct().collect()}
    assert months == {(2023, 1), (2023, 3)}

    # cursor=1: the gap IS covered by the retained v2 — narrow slice works
    df2, cursor2 = r.read_changes_since(key, after_version=1)
    assert cursor2 == 2
    months2 = {(x["year"], x["month"]) for x in df2.select("year", "month").distinct().collect()}
    assert months2 == {(2023, 1)}

    # caught-up consumer unaffected
    df3, cursor3 = r.read_changes_since(key, after_version=2)
    assert df3 is None and cursor3 == 2


# ---------------------------------------------------------------------------
# HadoopFS: scheme-qualified walk roots; real errors surface from
# create_exclusive instead of masquerading as a lost claim race
# ---------------------------------------------------------------------------
def test_hadoopfs_walk_files_yields_base_prefixed_roots(spark, tmp_path):
    base = f"file://{tmp_path}/lake"
    fs = get_fs(base, spark)
    fs.makedirs(f"{base}/exchange=X/market=SPOT")
    fs.write_bytes_atomic(f"{base}/exchange=X/market=SPOT/part-0.parquet", b"x")
    fs.write_bytes_atomic(f"{base}/top.json", b"y")
    walked = list(fs.walk_files(base))
    assert len(walked) == 2
    for root, _f in walked:
        assert root == base or root.startswith(base + "/"), root
    assert (base, "top.json") in walked
    assert (f"{base}/exchange=X/market=SPOT", "part-0.parquet") in walked


def test_prune_commit_logs_works_on_scheme_base(spark, tmp_path):
    """prune_commit_logs rebuilds dataset paths from walk roots; with a
    scheme-qualified base those must stay scheme-qualified or the prune
    silently no-ops on paths that don't exist."""
    from dl_datalake_spark.lake.maintenance import prune_commit_logs

    base = f"file://{tmp_path}/lake"
    fs = get_fs(base, spark)
    ds = f"{base}/exchange=X/market=SPOT/symbol=AAA/data_type=raw/period=1m"
    log = CommitLog(ds, fs=fs)
    for _ in range(5):
        with log.transaction():
            pass
    rep = prune_commit_logs(spark, base, keep_last=2)
    assert rep == {ds: 3}
    assert [h["version"] for h in CommitLog(ds, fs=fs).history()] == [3, 4]


def test_hadoopfs_create_exclusive_raises_on_real_errors(spark, tmp_path):
    base = f"file://{tmp_path}"
    fs = get_fs(base, spark)
    fs.write_bytes_atomic(f"{base}/afile", b"x")
    # losing the race (path exists) is the ONLY condition that returns False
    assert not fs.create_exclusive(f"{base}/afile", b"y")
    assert fs.read_bytes(f"{base}/afile") == b"x"
    # a genuinely broken write (parent is a file) must raise, not spin the
    # caller's retry loop until CommitTimeout
    with pytest.raises(Exception) as exc_info:
        fs.create_exclusive(f"{base}/afile/child", b"y")
    assert not isinstance(exc_info.value, AssertionError)


def test_hadoopfs_getmtime_missing_raises_oserror(spark, tmp_path):
    base = f"file://{tmp_path}"
    fs = get_fs(base, spark)
    with pytest.raises(OSError):
        fs.getmtime(f"{base}/nope.json")
    with pytest.raises(OSError):
        fs.read_bytes(f"{base}/nope.json")
    with pytest.raises(OSError):
        fs.touch(f"{base}/nope.json")
    # touch refreshes an existing file and never creates one
    fs.write_bytes_atomic(f"{base}/a.json", b"x")
    fs.touch(f"{base}/a.json")
    assert fs.read_bytes(f"{base}/a.json") == b"x"


# ---------------------------------------------------------------------------
# CAS finalize: the fence rename closes the round-5 verify-then-write window
# ---------------------------------------------------------------------------
def test_finalize_is_cas_roll_aside_in_old_residual_window(tmp_path):
    """Round-5 residual: _finalize was verify-then-write, so a usurpation
    landing between the ownership check and the commit write was silently
    misattributed.  Finalize is now one atomic fence rename — a usurpation
    injected at the LAST possible instant (after the transaction body, as
    the finalize rename is being issued) must surface as CommitConflict,
    never a misattributed commit over the usurper's claim."""
    from dl_datalake_spark.lake.commitlog import CommitConflict

    ds = str(tmp_path / "ds")

    class UsurpOnFinalize(LocalFS):
        armed = False
        fired = False

        def rename(self, src, dst):
            if self.armed and not self.fired and ".fence." in src and dst.endswith(".finalizing"):
                self.fired = True
                # contender usurps in the microsecond before the CAS lands
                CommitLog(ds, stale_timeout_s=0.0)._try_rollback_stale(0)
                assert CommitLog(ds)._claim(0, "usurper-token")
            super().rename(src, dst)

    fs = UsurpOnFinalize()
    log = CommitLog(ds, fs=fs)
    with pytest.raises(CommitConflict):
        with log.transaction() as meta:
            meta["rows"] = 1
            fs.armed = True
    assert fs.fired
    entry = json.loads(open(os.path.join(ds, "_commits", f"{0:020d}.json")).read())
    assert entry["owner_token"] == "usurper-token"
    assert entry["status"] == "in-progress"  # usurper's claim untouched
    assert log.latest_version() == -1  # nothing misrecorded


def test_crashed_finalize_is_recoverable_after_stale_timeout(tmp_path):
    """An owner that dies BETWEEN the fence rename and the slot write
    leaves a `.finalizing` marker.  Contenders treat it as a live
    finalize while fresh (no takeover), then consume it and roll the
    slot aside once stale — the lake cannot be wedged by a process that
    died inside the microsecond finalize window."""
    import time

    ds = str(tmp_path / "ds")
    log = CommitLog(ds, stale_timeout_s=0.3)
    assert log._claim(0, "tok")
    fence = log._fence(0, "tok")
    os.rename(fence, fence + ".finalizing")  # died right here
    slot = os.path.join(ds, "_commits", f"{0:020d}.json")
    os.utime(slot, (1, 1))  # the slot itself looks ancient

    contender = CommitLog(ds, stale_timeout_s=0.3)
    contender._try_rollback_stale(0)  # .finalizing is FRESH: backs off
    assert os.path.exists(slot)

    time.sleep(0.35)
    contender._try_rollback_stale(0)  # now stale: consumed + rolled aside
    assert not os.path.exists(slot)
    with contender.transaction(timeout=5.0) as meta:
        meta["recovered"] = True
    assert contender.latest_version() == 0
    assert contender.history()[0]["recovered"] is True


def test_prune_sweeps_orphan_fences_never_live_ones(tmp_path):
    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    with log.transaction():
        pass  # v0 committed; its fence was consumed by finalize
    commits = os.path.join(ds, "_commits")
    orphan = os.path.join(commits, f"{0:020d}.json.fence.deadtoken")
    with open(orphan, "w") as fh:
        fh.write("fence")
    with log.transaction():  # live v1 transaction holds a live fence
        log.prune(keep_last=10)
        fences = [n for n in os.listdir(commits) if ".fence." in n]
        assert os.path.basename(orphan) not in fences  # orphan swept
        assert any(n.startswith(f"{1:020d}.json.fence.") for n in fences)
    assert log.latest_version() == 1  # live transaction finalized fine


def test_prune_abandoned_ttl_old_swept_recent_kept(tmp_path):
    """Abandoned roll-aside markers age out of the log on the maintenance
    cadence: markers older than the TTL are swept, recent ones stay (a
    fresh usurpation's audit trail survives one pass), and the prune
    remains cursor-safe — retained commit coverage is untouched."""
    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    for i in range(3):
        with log.transaction() as meta:
            meta["i"] = i
    # two dead claims rolled aside at different times
    for tok in ("dead-old", "dead-new"):
        assert log._claim(3, tok)
        CommitLog(ds, stale_timeout_s=0.0)._try_rollback_stale(3)
    commits = os.path.join(ds, "_commits")
    aged = [n for n in os.listdir(commits) if ".abandoned." in n]
    assert len(aged) == 4  # 2 slots + 2 fences
    # age HALF of them past the TTL
    for n in aged[:2]:
        os.utime(os.path.join(commits, n), (1, 1))

    removed = log.prune(keep_last=100, abandoned_ttl_s=3600.0)
    left = [n for n in os.listdir(commits) if ".abandoned." in n]
    assert removed == 2 and sorted(left) == sorted(aged[2:])
    # committed history untouched; next version continues
    assert [h["version"] for h in log.history()] == [0, 1, 2]
    with log.transaction():
        pass
    assert log.latest_version() == 3


def test_fence_cas_protocol_over_hadoopfs_scheme_base(spark, tmp_path):
    """The fence-file CAS (claim fence -> consume by rename) must hold
    through the JVM Hadoop filesystem too — the path an s3a:// lake
    takes.  Commit, leave a dead claim, usurp it via the real roll-aside,
    and confirm the slot is re-claimable and history continues."""
    base = f"file://{tmp_path}/ds"
    fs = get_fs(base, spark)
    log = CommitLog(base, fs=fs)
    with log.transaction() as meta:
        meta["rows"] = 1
    assert log.latest_version() == 0

    assert log._claim(1, "dead-token")  # writer died holding v1
    CommitLog(base, fs=fs, stale_timeout_s=0.0)._try_rollback_stale(1)
    # both the slot and its fence were consumed into .abandoned markers
    names = fs.listdir(f"{base}/_commits")
    assert sum(1 for n in names if ".abandoned." in n) == 2

    with log.transaction(timeout=10.0) as meta:
        meta["recovered"] = True
    assert log.latest_version() == 1
    assert log.history()[-1]["recovered"] is True


# ---------------------------------------------------------------------------
# conditional-write CAS: the fence protocol on a store whose rename is
# NON-atomic copy+delete (S3-style) — consume_rename's exactly-one-winner
# guarantee must come from the conditional CREATE, not from rename
# ---------------------------------------------------------------------------
from dl_datalake_spark.lake.fs import ConditionalConsumeFS  # noqa: E402


class S3LikeFS(ConditionalConsumeFS, LocalFS):
    """LocalFS whose `rename` deliberately emulates S3's copy+delete:
    NOT atomic, and — the killer — two racers renaming the same src can
    BOTH appear to succeed (both read the bytes before either deletes).
    consume_rename therefore must not ride it; the mixin reroutes the
    guarantee through create_exclusive (the conditional-PUT analogue)."""

    rename_calls = 0

    def rename(self, src: str, dst: str) -> None:
        # copy phase: any concurrent reader of src still sees it
        type(self).rename_calls += 1
        data = self.read_bytes(src)  # OSError if missing, like S3 GET
        self.write_bytes_atomic(dst, data)
        try:
            self.remove(src)  # delete phase, best-effort like S3 DELETE
        except OSError:
            pass


def test_fence_protocol_on_nonatomic_rename_backend(tmp_path):
    """The usurpation suite's core scenarios replayed over S3LikeFS:
    usurped finalize raises and never clobbers the usurper's claim;
    usurped abort leaves the usurper's claim; normal commits finalize;
    a sigkilled-style stale claim is taken over exactly once."""
    from dl_datalake_spark.lake.commitlog import CommitConflict

    fs = S3LikeFS()
    ds = str(tmp_path / "ds")

    # normal transaction lifecycle
    log = CommitLog(ds, fs=fs)
    with log.transaction() as meta:
        meta["rows"] = 7
    assert log.latest_version() == 0
    assert log.history()[0]["rows"] == 7

    # usurped finalize -> CommitConflict, usurper claim untouched
    usurper = CommitLog(ds, fs=fs)
    with pytest.raises(CommitConflict):
        with log.transaction() as meta:
            CommitLog(ds, fs=fs, stale_timeout_s=0.0)._try_rollback_stale(1)
            assert usurper._claim(1, "usurper-token")
            meta["rows"] = 1
    entry = json.loads(open(_slot(ds, 1)).read())
    assert entry["owner_token"] == "usurper-token"
    assert entry["status"] == "in-progress"

    # usurped abort leaves the usurper's claim alone
    usurper._abort(1, "usurper-token")
    log2 = CommitLog(ds, fs=fs)
    with pytest.raises(RuntimeError, match="blew up"):
        with log2.transaction():
            CommitLog(ds, fs=fs, stale_timeout_s=0.0)._try_rollback_stale(1)
            assert usurper._claim(1, "usurper-token")
            raise RuntimeError("writer blew up")
    entry = json.loads(open(_slot(ds, 1)).read())
    assert entry["owner_token"] == "usurper-token"


def test_consume_rename_exactly_one_winner_on_nonatomic_backend(tmp_path):
    """Many threads racing consume_rename on one fence: exactly one wins
    even though the underlying rename would have let several 'succeed'."""
    import threading

    fs = S3LikeFS()
    src = str(tmp_path / "f.fence.tok")
    with open(src, "w") as fh:
        fh.write("fence")
    wins = []
    barrier = threading.Barrier(8)

    def racer(i):
        barrier.wait()
        if fs.consume_rename(src, f"{src}.abandoned.{i}"):
            wins.append(i)

    ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    assert not os.path.exists(src)

    # plain LocalFS rename under the same race is the control: the
    # mixin's guarantee must also hold when src never existed
    assert fs.consume_rename(str(tmp_path / "nope"), str(tmp_path / "x")) is False


# ---------------------------------------------------------------------------
# delta-encoded pinned listings (files_add/files_remove + checkpoints)
# ---------------------------------------------------------------------------
def _commit_files(log, files, partitions=None):
    with log.transaction(payload={"mode": "t"}) as meta:
        meta.update(files=sorted(files), partitions=partitions or [[2023, 1]])
    return meta["version"]


def test_append_chain_delta_encodes_and_resolves(tmp_path):
    """A pure-append history stores O(change) deltas between full-list
    checkpoints; latest_files/files_at reconstruct every snapshot."""
    log = CommitLog(str(tmp_path / "ds"))
    live: list[str] = []
    snapshots = []
    for i in range(14):
        live = live + [f"year=2023/month=1/part-{i:04d}.parquet"]
        _commit_files(log, live)
        snapshots.append(list(live))
    raw = [json.loads(open(f"{log.log_dir}/{v:020d}.json").read()) for v in log._entries()]
    # v0 and v10 are checkpoints; everything else is a one-file delta
    assert "files" in raw[0] and "files" in raw[10]
    for i in (1, 2, 9, 11, 13):
        assert "files" not in raw[i]
        assert raw[i]["files_add"] == [f"year=2023/month=1/part-{i:04d}.parquet"]
        assert raw[i]["files_remove"] == []
    assert log.latest_files() == sorted(snapshots[-1])
    for v in (0, 5, 9, 10, 13):
        assert log.files_at(v) == sorted(snapshots[v]), v


def test_partition_rewrite_falls_back_to_full_checkpoint(tmp_path):
    """When the delta wouldn't be smaller (rewrite replaces most files),
    the full list is stored — it doubles as a fresh checkpoint."""
    log = CommitLog(str(tmp_path / "ds"))
    _commit_files(log, ["a.parquet", "b.parquet"])
    _commit_files(log, ["c.parquet", "d.parquet"])  # full replacement
    raw1 = json.loads(open(f"{log.log_dir}/{1:020d}.json").read())
    assert raw1["files"] == ["c.parquet", "d.parquet"]
    assert "files_add" not in raw1
    assert log.files_at(0) == ["a.parquet", "b.parquet"]
    assert log.latest_files() == ["c.parquet", "d.parquet"]


def test_prune_keeps_delta_chain_anchor(tmp_path):
    """prune(keep_last) must extend retention back to the checkpoint the
    oldest retained delta folds onto — snapshots never become
    unknowable just because their deltas survived pruning."""
    log = CommitLog(str(tmp_path / "ds"))
    live: list[str] = []
    for i in range(14):
        live = live + [f"p{i}.parquet"]
        _commit_files(log, live)
    log.prune(keep_last=2)  # naive drop would leave only v12,v13 (deltas)
    kept = log._entries()
    assert kept == list(range(10, 14))  # anchored at the v10 checkpoint
    assert log.latest_files() == sorted(f"p{i}.parquet" for i in range(14))
    assert log.files_at(12) == sorted(f"p{i}.parquet" for i in range(13))
    assert log.files_at(9) is None  # pruned history: unknowable, not faked


def test_head_pointer_accelerates_latest_version(tmp_path):
    """VERDICT r11 #8: `_head` pointer gives O(1) head discovery — no
    directory listing on the fast path, forward probes cover a stale
    pointer, and a missing/corrupt pointer falls back to the listing."""
    import json

    from dl_datalake_spark.lake.commitlog import CommitLog

    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    for i in range(3):
        with log.transaction(payload={"mode": "append", "partitions": []}):
            pass
    hint = f"{log.log_dir}/_head"
    assert json.loads(log.fs.read_bytes(hint))["version"] == 2
    assert log.latest_version() == 2

    # fast path does not list the directory
    calls = []
    orig = log.fs.listdir

    def counting(path):
        calls.append(path)
        return orig(path)

    log.fs.listdir = counting
    try:
        assert log.latest_version() == 2
        assert calls == []
    finally:
        del log.fs.listdir

    # stale pointer (lost write): forward probes find the true head
    log.fs.write_bytes_atomic(hint, json.dumps({"version": 0}).encode())
    assert log.latest_version() == 2
    # corrupt pointer: listing fallback still answers
    log.fs.write_bytes_atomic(hint, b"not json")
    assert log.latest_version() == 2
    # pointer absent (legacy log): fallback, and next commit restores it
    log.fs.remove(hint)
    assert log.latest_version() == 2
    with log.transaction(payload={"mode": "append", "partitions": []}):
        pass
    assert json.loads(log.fs.read_bytes(hint))["version"] == 3


def test_head_pointer_ignored_by_entry_scans_and_prune(tmp_path):
    """The `_head` file is not a commit entry: history/prune/fold all
    skip it, and prune never deletes it."""
    from dl_datalake_spark.lake.commitlog import CommitLog

    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    for i in range(5):
        with log.transaction(payload={"mode": "append", "partitions": []}):
            pass
    assert [e["version"] for e in log.history()] == [0, 1, 2, 3, 4]
    log.prune(keep_last=2)
    assert log.fs.exists(f"{log.log_dir}/_head")
    assert log.latest_version() == 4


def test_head_pointer_valid_json_wrong_shape(tmp_path):
    """A pointer holding valid JSON that is NOT an object ('[1]',
    '"5"') must fall back to the listing scan, not crash
    latest_version with AttributeError."""
    from dl_datalake_spark.lake.commitlog import CommitLog

    ds = str(tmp_path / "ds")
    log = CommitLog(ds)
    for _ in range(3):
        with log.transaction(payload={"mode": "append", "partitions": []}):
            pass
    hint = f"{log.log_dir}/_head"
    for bad in (b"[1]", b'"5"', b"3.5", b"null"):
        log.fs.write_bytes_atomic(hint, bad)
        assert log.latest_version() == 2
