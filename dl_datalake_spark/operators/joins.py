"""Temporal join operators Spark lacks as built-ins: backward as-of
join and a banded (bucketed) range join.

The reference has no data-plane joins at all (SURVEY §2.3;
dl-datalake/src/dl_datalake/ — zero join call sites), but its
feature-set model (features/manager.py:72-81) associates feature rows
to raw rows by (symbol, ts) convention; an as-of join is the operator
that makes that association executable. Both operators here are pure
DataFrame compositions — no UDFs, one shuffle each — so they survive a
100 TB scale-up:

- as-of join: union + prefix-window scan ≡ the classic merge-join
  formulation; cost = one shuffle on the `by` keys + a per-key sort,
  identical asymptotics to a sort-merge join.
- range join: equi-join on (key, time-bucket) with bucket fan-out on
  the probe side; turns an O(n·m) inequality join into a pruned
  equi-join that AQE can plan as a normal shuffled hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_count_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    right_on_alias: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks up `value_cols` from the
    latest right row with right.on <= left.on within the same `by` group
    (left join semantics — unmatched left rows keep nulls).

    Implementation: tag both sides, union by name, and carry the right
    side's values forward with a prefix window (`last(..., ignorenulls)`
    over rowsBetween(unboundedPreceding, 0)) ordered by (on, side) so a
    right row at the exact same timestamp is visible to the left row
    (>= semantics, matching DuckDB's ASOF JOIN). One shuffle on `by`.

    If several right rows share (by, on), the caller should pre-aggregate
    — this function keeps the last one in (on, side) order, which is
    nondeterministic across ties.
    """
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != on and c not in by]

    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    left_cols = [c for c in left.columns if c not in by and c != on]
    l = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
    )
    u = r.unionByName(l, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched_on = right_on_alias or f"{on}_right"
    out = u
    for c in value_cols:
        out = out.withColumn(
            f"_asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    out = out.withColumn(
        matched_on,
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True).over(w),
    )
    return out.where(F.col("_side") == 1).select(
        *by,
        on,
        *left_cols,
        F.col(matched_on),
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    lower: int = 0,
    upper: int = 1,
    count_alias: str = "match_count",
) -> DataFrame:
    """Count, per left row, right rows with right.on in
    [left.on + lower, left.on + upper) within the same `by` group.
    `on` must be an integer column (epoch ns/ms); lower/upper in the
    same unit. Left-join semantics: left rows with no match count 0.

    Scale path: both sides get a coarse bucket column of width
    (upper - lower); the probe side fans out to the covered buckets
    (at most 2 for a window equal to the bucket width), the join is a
    plain equi-join on (by..., bucket), and the exact range predicate
    filters inside the joined partitions. No broadcast of an
    inequality condition, no nested-loop join.
    """
    by = by or []
    width = upper - lower
    if width <= 0:
        raise ValueError("upper must be > lower")

    lkey = [F.col(c) for c in by]
    # integer division only: epoch-ns values (~1.7e18) exceed double's
    # 53-bit mantissa, so float bucket math would misplace boundary rows
    r = right.select(
        *by,
        F.col(on).alias("_r_on"),
        F.expr(f"`{on}` div {width}").alias("_bucket"),
    )
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"(`{on}` + {lower}) div {width}"),
                F.expr(f"(`{on}` + {upper} - 1) div {width}"),
            )
        ),
    )
    joined = l.join(
        r,
        [l[c] == r[c] for c in by] + [l["_bucket"] == r["_bucket"]],
        "left",
    ).where(
        F.col("_r_on").isNull()
        | (
            (F.col("_r_on") >= l[on] + F.lit(lower))
            & (F.col("_r_on") < l[on] + F.lit(upper))
        )
    )
    group_cols = [l[c] for c in left.columns]
    return joined.groupBy(*group_cols).agg(
        F.count(F.col("_r_on")).alias(count_alias)
    )
