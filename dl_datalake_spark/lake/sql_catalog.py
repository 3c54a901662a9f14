"""Named-table SQL over the lake: `lake.<table>` references in plain
Spark SQL, with Delta-style time travel (`VERSION AS OF n`,
`TIMESTAMP AS OF 'ts'`).

The reference's SQL surface is ad-hoc DuckDB over parquet globs
(dl-datalake/src/dl_datalake/storage/reader.py:57-62): one glob, one
query, no catalog, no snapshot isolation.  Here every cataloged
dataset is addressable BY NAME inside any `spark.sql(...)` statement —
joins across lake tables, subqueries, window functions, all of Spark
SQL — and each reference resolves through the SAME scan every
DataFrame read uses (`LakeReader.read_dataset`: commit-pinned listing,
deletion vectors, schema contract with logical names, data-skipping
stats), so SQL and DataFrame reads can never disagree about a
dataset's contents.

Why a resolver and not a Spark TableCatalog plugin: Spark's
DataSourceV2 TableCatalog is a JVM extension point with no Python
implementation path (the Python DataSource API covers sources, not
catalogs).  The equivalent wiring that IS available Python-side is
name resolution + temp-view registration: `sql()` rewrites each
`lake.<name> [VERSION|TIMESTAMP AS OF …]` reference to a registered
view of the corresponding (possibly historical) snapshot, then hands
the statement to Spark's own parser — Catalyst sees ordinary
relations, so pushdown/pruning/AQE work untouched.  The rewrite only
touches the `lake.` prefix outside string literals; everything else
passes through verbatim.

Table names: `<exchange>_<symbol>_<data_type>_<period>` lowercased,
e.g. `binance_btc_usdt_raw_1m` — `SHOW TABLES` analogue via
`tables()`.  Market is part of the name only when a symbol exists in
more than one market (`<exchange>_<market>_<symbol>_…`), keeping the
common case short and names unambiguous.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from dl_datalake_spark.lake.paths import DatasetKey

# lake.<name>, optionally backquoted, optionally followed by a
# time-travel clause; string literals are masked to \x00<i>\x00
# placeholders before this runs, so the TIMESTAMP operand matches the
# placeholder and is unmasked in the handler.
_REF = re.compile(
    r"\blake\.(?:`(?P<q>[^`]+)`|(?P<n>[A-Za-z0-9_]+))"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+(?P<t>\x00\d+\x00))?",
    re.IGNORECASE,
)


class LakeSQLCatalog:
    """Resolve `lake.<table>` SQL references against a lake root.

    Built lazily over the dataset layout itself (one directory walk,
    no manifest dependency — datasets created by any writer resolve),
    refreshed per `sql()` call so newly created datasets are
    addressable immediately."""

    def __init__(self, spark: SparkSession, reader, fs) -> None:
        self.spark = spark
        self.reader = reader
        self.fs = fs

    # -- name registry -------------------------------------------------------

    def _discover(self) -> dict[str, DatasetKey]:
        """{table name: DatasetKey} for every dataset directory under
        the lake root (hive layout exchange=/market=/symbol=/
        data_type=/period=).  Short names (market elided) are assigned
        when unambiguous; the full `<exchange>_<market>_<symbol>_…`
        form is always present too."""
        base = self.reader.base_path.rstrip("/")
        keys: list[DatasetKey] = []
        for ex in self._vals(base, "exchange"):
            p1 = f"{base}/exchange={ex}"
            for mk in self._vals(p1, "market"):
                p2 = f"{p1}/market={mk}"
                for sym in self._vals(p2, "symbol"):
                    p3 = f"{p2}/symbol={sym}"
                    for dt in self._vals(p3, "data_type"):
                        p4 = f"{p3}/data_type={dt}"
                        for per in self._vals(p4, "period"):
                            keys.append(DatasetKey(ex, mk, sym, dt, per))
        out: dict[str, DatasetKey] = {}
        short_count: dict[str, int] = {}
        for k in keys:
            short = f"{k.exchange}_{k.symbol}_{k.data_type}_{k.period}".lower()
            short_count[short] = short_count.get(short, 0) + 1
        for k in keys:
            full = (
                f"{k.exchange}_{k.market}_{k.symbol}_{k.data_type}_{k.period}"
            ).lower()
            out[full] = k
            short = f"{k.exchange}_{k.symbol}_{k.data_type}_{k.period}".lower()
            if short_count[short] == 1:
                out[short] = k
        return out

    def _vals(self, path: str, seg: str) -> list[str]:
        try:
            names = self.fs.listdir(path)
        except OSError:
            return []
        pre = f"{seg}="
        return [n[len(pre):] for n in names if n.startswith(pre)]

    def tables(self) -> list[str]:
        """Addressable table names (the SHOW TABLES analogue)."""
        return sorted(self._discover())

    # -- SQL surface ---------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Run a Spark SQL statement in which `lake.<table>` references
        (optionally `VERSION AS OF n` / `TIMESTAMP AS OF 'ts'`) resolve
        to the corresponding dataset snapshots.  Non-lake SQL passes
        through untouched.

        `lake.<name>` for a name that is NOT a cataloged dataset passes
        through to Spark's own resolution (it may be a table aliased
        `lake`, or a 3-part name in a real `lake` catalog); only if
        Spark's analysis also fails is the error upgraded to name both
        failure modes with the known lake tables."""
        resolved = self.resolve(query)
        try:
            return self.spark.sql(resolved)
        except Exception as exc:
            from pyspark.errors import AnalysisException

            if isinstance(exc, AnalysisException) and re.search(
                r"\blake\.", query, re.IGNORECASE
            ):
                known = sorted(self._discover())
                raise ValueError(
                    "a `lake.<name>` reference resolved neither as a "
                    "cataloged lake dataset nor through Spark's own "
                    "analysis (table alias / catalog). Known lake tables: "
                    + ", ".join(known[:20])
                    + ("…" if len(known) > 20 else "")
                    + f". Spark's error: {exc}"
                ) from exc
            raise

    def resolve(self, query: str) -> str:
        """The rewritten statement (exposed for EXPLAIN/debugging):
        every lake reference replaced by a registered temp-view name."""
        if "lake." not in query.lower():
            return query
        # mask string literals (single- AND double-quoted — Spark treats
        # double quotes as strings by default) and SQL comments, so a
        # quoted 'lake.foo' or a comment mentioning lake.x is data, not
        # a reference
        literals: list[str] = []

        def _mask(m: re.Match) -> str:
            literals.append(m.group(0))
            return f"\x00{len(literals) - 1}\x00"

        masked = re.sub(
            r"'(?:[^'\\]|\\.)*'"
            r"|\"(?:[^\"\\]|\\.)*\""
            r"|--[^\n]*"
            r"|/\*.*?\*/",
            _mask,
            query,
            flags=re.DOTALL,
        )
        registry = self._discover()

        def _sub(m: re.Match) -> str:
            name = (m.group("q") or m.group("n")).lower()
            key = registry.get(name)
            if key is None:
                # Not a cataloged dataset.  The identifier `lake` is not
                # reserved: this may be a table ALIASED `lake`
                # (`JOIN orders lake ON lake.o_orderkey = …`) or a 3-part
                # name in a genuine `lake` catalog — pass the reference
                # through UNCHANGED and let Spark's own analysis decide
                # (sql() upgrades an analysis failure with the
                # known-tables hint).  A time-travel clause can only
                # mean a lake reference, so that stays a loud error.
                if m.group("v") is not None or m.group("t") is not None:
                    raise ValueError(
                        f"unknown lake table {name!r} (VERSION/TIMESTAMP "
                        "AS OF applies only to cataloged lake datasets) — "
                        "known tables: "
                        + ", ".join(sorted(registry)[:20])
                        + ("…" if len(registry) > 20 else "")
                    )
                return m.group(0)
            version = m.group("v")
            ts = m.group("t")
            if ts is not None:
                from dl_datalake_spark.lake.commitlog import CommitLog
                from dl_datalake_spark.lake.paths import dataset_rel_path

                ts = literals[int(ts.strip("\x00"))].strip("'\"")
                log = CommitLog(
                    f"{self.reader.base_path}/{dataset_rel_path(key.normalized())}",
                    fs=self.fs,
                )
                version = str(log.version_at_time(_to_epoch_s(ts)))
            # the substituted view name must be a plain identifier even
            # when the dataset identity carries non-word characters
            # (sanitize_symbol keeps dashes/dots — 'BTC-USDT' would
            # otherwise parse as a subtraction after substitution)
            view = re.sub(
                r"\W",
                "_",
                f"lake_{name}" + (f"__v{version}" if version is not None else ""),
            )
            df = (
                self.reader.read_dataset_at(key, int(version))
                if version is not None
                else self.reader.read_dataset(key)
            )
            df.createOrReplaceTempView(view)
            return view

        masked = _REF.sub(_sub, masked)
        return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], masked)


def _to_epoch_s(ts: str) -> float:
    """'2023-01-01 12:00:00' / ISO-8601 / bare epoch seconds -> seconds."""
    try:
        return float(ts)
    except ValueError:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(ts.replace(" ", "T"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
