"""Declarative data-quality expectations, compiled to ONE aggregate pass.

The reference validates ingest rows imperatively (CSV shape checks in
its pipeline; SURVEY §2.2 P-items); production lakes declare
constraints per dataset and evaluate them engine-side. Each expectation
becomes a conditional-count column in a single `agg` over one scan —
N constraints cost one job, not N — and results come back as
(name, violations, total, passed) rows.

Supported constraints (all pure Column predicates, codegen-stage):
    not_null(col)                 unique(cols...)
    accepted_range(col, lo, hi)   accepted_values(col, [...])
    matches(col, regex)           custom(name, Column)

`enforce="fail"` raises on any violation; `"quarantine"` splits the
input into (good, bad) like the CSV quarantine path (csv_source.py);
`"report"` (default) just returns the tally.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(ValueError):
    """Raised under enforce='fail' when a constraint has violations."""


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column  # True = row passes

    # row-level constraints compose with & for quarantine splitting;
    # unique() is table-level and handled separately
    row_level: bool = True


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", F.col(col).isNotNull())


def accepted_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"range_{col}", F.col(col).isNull() | F.col(col).between(lo, hi)
    )


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        f"values_{col}", F.col(col).isNull() | F.col(col).isin(values)
    )


def matches(col: str, regex: str) -> Expectation:
    return Expectation(
        f"matches_{col}", F.col(col).isNull() | F.col(col).rlike(regex)
    )


def custom(name: str, predicate: Column) -> Expectation:
    return Expectation(name, predicate)


@dataclass(frozen=True)
class UniqueExpectation:
    cols: tuple[str, ...]

    @property
    def name(self) -> str:
        return "unique_" + "_".join(self.cols)


def unique(*cols: str) -> UniqueExpectation:
    return UniqueExpectation(tuple(cols))


def check(
    df: DataFrame,
    expectations: list,
    enforce: str = "report",
):
    """Evaluate all expectations.

    report     → DataFrame (name, violations, total, passed)
    fail       → same, but raises ExpectationError if any failed
    quarantine → (good_df, bad_df, report_df); bad = rows failing ANY
                 row-level constraint (unique() can't quarantine a
                 specific row — both copies are 'the duplicate')
    """
    if enforce not in ("report", "fail", "quarantine"):
        raise ValueError(f"enforce must be report|fail|quarantine, got {enforce!r}")
    rows = [e for e in expectations if isinstance(e, Expectation)]
    uniqs = [e for e in expectations if isinstance(e, UniqueExpectation)]

    # NULL predicates (three-valued logic) must count as violations:
    # a custom() predicate that evaluates to NULL satisfies neither p
    # nor ~p, so without the coalesce the row would be skipped by the
    # tally AND dropped from both quarantine splits silently.
    passes = {e.name: F.coalesce(e.predicate, F.lit(False)) for e in rows}

    aggs = [F.count(F.lit(1)).alias("_total")]
    for e in rows:
        aggs.append(F.sum((~passes[e.name]).cast("long")).alias(e.name))
    tally = df.agg(*aggs).collect()[0]
    total = tally["_total"]

    report = [(e.name, int(tally[e.name])) for e in rows]
    for u in uniqs:
        # duplicates = total rows minus distinct key rows; one agg each
        # (distinct-count per key set can't share the scan above)
        dup = df.select(*u.cols).groupBy(*u.cols).count().where(F.col("count") > 1)
        extra = dup.agg(
            F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("v")
        ).collect()[0]["v"]
        report.append((u.name, int(extra)))

    spark = df.sparkSession
    report_df = spark.createDataFrame(
        [(n, v, int(total), v == 0) for n, v in report],
        "name string, violations long, total long, passed boolean",
    )

    if enforce == "fail":
        failed = [n for n, v in report if v > 0]
        if failed:
            raise ExpectationError(f"expectations failed: {failed}")
        return report_df
    if enforce == "quarantine":
        good_pred = F.lit(True)
        for e in rows:
            good_pred = good_pred & passes[e.name]
        good = df.where(good_pred)
        bad = df.where(~good_pred)
        return good, bad, report_df
    return report_df
