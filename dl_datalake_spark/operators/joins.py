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
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: each left row picks up `value_cols` from the matching
    right row within the same `by` group (left join semantics —
    unmatched left rows keep nulls).

    direction:
      - "backward" (default): latest right with right.on <= left.on;
      - "forward": earliest right with right.on >= left.on;
      - "nearest": whichever of the two is closer in `on` (tie →
        backward, matching pandas.merge_asof).
    tolerance: maximum |right.on - left.on| for a match (same unit as
    `on`, which must then be numeric); farther matches become null.

    Implementation: tag both sides, union by name, and carry the right
    side's values with prefix/suffix windows (`last`/`first` ...
    ignorenulls) ordered so a right row at the exact same timestamp is
    visible in both directions (>= / <= semantics, matching DuckDB's
    ASOF JOIN). One shuffle on `by`; both window frames sort within the
    same partitions, so "nearest" costs one extra in-partition sort,
    not an extra shuffle.

    If several right rows share (by, on), the caller should pre-aggregate
    — ties there are engine-order nondeterministic.
    """
    by = by or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction}")
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

    # backward: right rows (side 0) sort BEFORE the left row at equal
    # `on`, prefix frame; forward: sort AFTER (side desc), suffix frame.
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_right = F.col("_side") == 0

    def bwd(c):
        return F.last(F.when(is_right, F.col(c)), ignorenulls=True).over(wb)

    def fwd(c):
        return F.first(F.when(is_right, F.col(c)), ignorenulls=True).over(wf)

    out = u
    use_b = direction in ("backward", "nearest")
    use_f = direction in ("forward", "nearest")
    if use_b:
        out = out.withColumn("_b_on", bwd(on))
        for c in value_cols:
            out = out.withColumn(f"_b_{c}", bwd(c))
    if use_f:
        out = out.withColumn("_f_on", fwd(on))
        for c in value_cols:
            out = out.withColumn(f"_f_{c}", fwd(c))

    # validity per direction (tolerance makes far matches null)
    b_ok = F.col("_b_on").isNotNull() if use_b else F.lit(False)
    f_ok = F.col("_f_on").isNotNull() if use_f else F.lit(False)
    if tolerance is not None:
        if use_b:
            b_ok = b_ok & ((F.col(on) - F.col("_b_on")) <= F.lit(tolerance))
        if use_f:
            f_ok = f_ok & ((F.col("_f_on") - F.col(on)) <= F.lit(tolerance))
    if direction == "nearest":
        # closer side wins; ties go backward
        take_b = b_ok & (
            ~f_ok | ((F.col(on) - F.col("_b_on")) <= (F.col("_f_on") - F.col(on)))
        )
        take_f = f_ok & ~take_b
    else:
        take_b, take_f = (b_ok, F.lit(False)) if use_b else (F.lit(False), f_ok)

    matched_on = right_on_alias or f"{on}_right"

    def pick(bc, fc):
        return F.when(take_b, bc).when(take_f, fc)

    out = out.withColumn(
        matched_on,
        pick(F.col("_b_on") if use_b else F.lit(None), F.col("_f_on") if use_f else F.lit(None)),
    )
    projected = [
        pick(
            F.col(f"_b_{c}") if use_b else F.lit(None),
            F.col(f"_f_{c}") if use_f else F.lit(None),
        ).alias(c)
        for c in value_cols
    ]
    return out.where(F.col("_side") == 1).select(
        *by,
        on,
        *left_cols,
        F.col(matched_on),
        *projected,
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
    )
    # The range predicate lives INSIDE the count, not in a WHERE: a
    # left row whose bucket copies all matched only out-of-range right
    # rows has no null row to survive a WHERE — filtering would drop it
    # entirely instead of counting 0 (found by the hypothesis property
    # suite on a 3-event soup; left-join semantics require the 0 row).
    in_range = (F.col("_r_on") >= l[on] + F.lit(lower)) & (
        F.col("_r_on") < l[on] + F.lit(upper)
    )
    group_cols = [l[c] for c in left.columns]
    return joined.groupBy(*group_cols).agg(
        F.count(F.when(in_range, F.lit(1))).alias(count_alias)
    )
