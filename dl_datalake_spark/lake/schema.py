"""Write-time schema contract for the commit log.

The reference enforces only that a ``ts`` column exists at write time
(dl-datalake/src/dl_datalake/storage/writer.py:162-164); everything
else about a dataset's shape is implicit in whatever parquet happens to
land.  At 100 TB that is a table-killer: one producer flipping a
column's type (ts as string, price as int) lands silently and only
explodes at read time, dataset-wide — and since Spark's parquet
``mergeSchema`` CANNOT merge differing atomic types (CANNOT_MERGE_SCHEMAS
on an int32/int64 mix), the whole dataset becomes unreadable, not just
the bad batch.

This module is the Delta-style fix, re-expressed on the existing commit
log (lake/commitlog.py):

- every data-writing commit records the dataset's RESOLVED schema
  (``payload["schema"]`` = ordered {column: Spark DDL type string});
  commits that don't touch the schema carry it forward at finalize
  (``CommitLog._carry_schema``, the ``_carry_dv`` mechanic), so
  ``CommitLog.schema_at(version)`` is a one-entry read and pruning can
  never orphan the contract;
- on append, the batch's fingerprint is checked against the recorded
  schema UNDER THE COMMIT CLAIM (so concurrent evolutions serialize):

  * equal types — pass;
  * batch NARROWER than the table (int into bigint, float into double)
    — the batch is silently upcast at write (lossless, keeps the files
    uniform; Delta does the same implicit up-cast);
  * NEW columns, or WIDENING the table's type — rejected unless the
    writer opted in with ``merge_schema=True``, in which case the
    commit records the evolved schema (Delta's ``mergeSchema`` write
    option semantics);
  * anything else (string where a long lives, dropping ts's meaning)
    — rejected loudly, dataset untouched.

Type widening relies on Spark 4's parquet reader serving INT32 under a
LongType read schema and FLOAT under DoubleType (verified empirically;
``mergeSchema`` inference cannot do this) — so once a dataset's log
carries a schema, readers should pass it EXPLICITLY via
``spark.read.schema(...)``, which also kills the per-scan footer
inference cost (O(files) driver RPCs at 1e5 files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SchemaContractError(ValueError):
    """An append's schema is incompatible with the dataset's contract."""


# (from, to) pairs a batch column may be LOSSLESSLY upcast through, and
# the only per-table widenings merge_schema=True may record.  Mirrors
# Delta's type-widening table restricted to what Spark 4's parquet
# reader can serve without a rewrite (INT32-family -> int/bigint,
# INT32/INT64 never -> double: parquet stores no hint that the read
# schema may treat an integer as floating, and bigint->double is lossy).
WIDENINGS: frozenset[tuple[str, str]] = frozenset(
    {
        ("tinyint", "smallint"),
        ("tinyint", "int"),
        ("tinyint", "bigint"),
        ("smallint", "int"),
        ("smallint", "bigint"),
        ("int", "bigint"),
        ("float", "double"),
    }
)

# (batch, table) pairs the WRITER may cast up before writing — a strict
# superset of WIDENINGS: the cast happens batch-side (no reader support
# needed), so lossless int-family -> double is fine here (every int32
# is exact in a double; bigint -> double is NOT, past 2^53).
UPCASTS: frozenset[tuple[str, str]] = WIDENINGS | frozenset(
    {
        ("tinyint", "double"),
        ("smallint", "double"),
        ("int", "double"),
        ("tinyint", "float"),
        ("smallint", "float"),
    }
)


def can_upcast(t: str, pt: str) -> bool:
    """True when a batch/assignment value of type `t` may be cast to
    the table's `pt` at write without losing information the reader
    can observe.  Covers the static UPCASTS table (lossless) plus
    decimal literals (SQL `-1.0` parses as decimal(2,1)): decimal ->
    decimal is lossless when the target's integral and fractional
    ranges cover the source; decimal -> double (p <= 15) / float
    (p <= 6) is ROUND-TRIP-SAFE, not value-exact — a fractional
    decimal like 0.1 has no exact binary representation, so the
    stored double can differ from the decimal by ULPs even though it
    prints back to the same literal."""
    if t == pt or (t, pt) in UPCASTS:
        return True
    import re

    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        if pt == "double" and p <= 15:
            return True
        if pt == "float" and p <= 6:
            return True
        m2 = re.fullmatch(r"decimal\((\d+),(\d+)\)", pt)
        if m2:
            p2, s2 = int(m2.group(1)), int(m2.group(2))
            return s2 >= s and (p2 - s2) >= (p - s)
    return False


def fingerprint(df: DataFrame) -> dict[str, str]:
    """Ordered {column: Spark DDL type} of a frame — the canonical form
    the commit log records.  Types are ``simpleString`` (``bigint``,
    ``double``, ``array<double>``, ...), which round-trips through
    ``spark.read.schema(ddl)``."""
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def to_ddl(schema: dict[str, str]) -> str:
    """The explicit read schema for a recorded contract — pass to
    ``spark.read.schema(...)`` instead of mergeSchema inference."""
    return ", ".join(f"`{name}` {typ}" for name, typ in schema.items())


def contract_read(
    log, base_path: str, path: str, file_rel: str, version=None
) -> tuple[str, dict] | None:
    """(physical read DDL, physical->logical renames) for a contracted
    dataset — the ONE way any scan (reader or writer-internal) should
    open contracted parquet: the explicit schema serves widened columns,
    skips O(files) footer-merge inference, EXCLUDES retired physical
    columns (dropped/renamed-away bytes must never enter a frame — a
    mergeSchema read would surface them and, post re-add, collide with
    the fresh physical name), and the renames restore the logical names
    the contract promises.  Partition-column NAMES are parsed from the
    dataset path + one file path; their TYPES come from the commit's
    recorded `partition_types` (facts from the written frame) with a
    layout-convention fallback (`year`/`month` int, identity segments
    string) only for history predating the recording.  None for
    pre-contract history (callers fall back to mergeSchema)."""
    sch, cmap, _retired, ptypes, _spec = log.contract_at(version)
    if not sch:
        return None
    phys = {cmap.get(c, c): t for c, t in sch.items()}
    base = base_path.rstrip("/")
    rel = path[len(base) + 1 :] if path.startswith(base + "/") else ""
    for seg in f"{rel}/{file_rel}".split("/"):
        name, eq, _ = seg.partition("=")
        if eq and name not in phys:
            phys[name] = ptypes.get(
                name, "int" if name in ("year", "month") else "string"
            )
    back = {p: l for l, p in cmap.items() if p != l}
    return to_ddl(phys), back


def resolve_append(
    prev: dict[str, str] | None,
    batch: dict[str, str],
    merge_schema: bool,
    context: str = "",
) -> tuple[dict[str, str], dict[str, str]]:
    """Check a batch fingerprint against the dataset's recorded schema.

    Returns ``(resolved, upcasts)``: the schema the commit should
    record, and the {column: target type} lossless up-casts the writer
    must apply to the batch before writing (so the files stay uniform).
    Raises SchemaContractError on anything the contract refuses.

    Missing columns are always fine (reads null-fill them); a batch
    seen before any contract exists (``prev is None``) defines it.
    """
    if prev is None:
        return dict(batch), {}
    resolved = dict(prev)
    upcasts: dict[str, str] = {}
    errors: list[str] = []
    widened: list[str] = []
    new_cols: list[str] = []
    for name, t in batch.items():
        pt = prev.get(name)
        if pt is None:
            new_cols.append(name)
            resolved[name] = t
            continue
        if t == pt:
            continue
        if can_upcast(t, pt):
            # batch narrower than the table: lossless up-cast at write
            upcasts[name] = pt
            continue
        if (pt, t) in WIDENINGS:
            widened.append(f"{name}: {pt} -> {t}")
            resolved[name] = t
            continue
        errors.append(f"column {name!r}: {pt} -> {t} is not a supported change")
    if new_cols and not merge_schema:
        errors.append(
            f"new column(s) {new_cols} not in the dataset schema "
            "(pass merge_schema=True to evolve)"
        )
    if widened and not merge_schema:
        errors.append(
            "type widening " + "; ".join(widened)
            + " (pass merge_schema=True to evolve)"
        )
    if errors:
        raise SchemaContractError(
            (f"{context}: " if context else "")
            + "batch schema violates the dataset's write-time contract — "
            + "; ".join(errors)
            + ". Recorded schema: "
            + ", ".join(f"{k} {v}" for k, v in prev.items())
        )
    return resolved, upcasts


def apply_upcasts(df: DataFrame, upcasts: dict[str, str]) -> DataFrame:
    """Cast the batch's narrower columns up to the table's types."""
    if not upcasts:
        return df
    return df.withColumns({c: F.col(c).cast(t) for c, t in upcasts.items()})


def enforce_exact(
    table: dict[str, str] | None, post: dict[str, str], context: str
) -> dict[str, str]:
    """DML post-images (UPDATE / MERGE) never evolve the schema: every
    post-image column must already exist in the table's contract with a
    compatible type.  Returns the {column: type} up-casts to apply.
    No-op (empty) when the dataset predates the contract."""
    if table is None:
        return {}
    upcasts: dict[str, str] = {}
    errors = []
    for name, t in post.items():
        pt = table.get(name)
        if pt is None:
            errors.append(f"column {name!r} is not in the dataset schema")
        elif t != pt:
            if can_upcast(t, pt):
                upcasts[name] = pt
            else:
                errors.append(f"column {name!r}: {pt} -> {t}")
    if errors:
        raise SchemaContractError(
            f"{context}: post-image schema violates the dataset's "
            "contract (DML never evolves the schema) — " + "; ".join(errors)
        )
    return upcasts
