"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew; these operators
cover the two cases it can't: (a) a hash aggregation whose hot key
funnels into one task, and (b) a broadcast-averse join against a table
with a few pathological keys known up front.

Mechanics (both): append a salt in [0, salt_buckets) to the hot side,
explode the other side across all salts, so one hot key's rows spread
over salt_buckets tasks. Aggregations re-combine in a second (tiny)
pass keyed by the original columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dl_datalake_spark.functions.exact import ratio_round

__all__ = ["salted_agg", "salted_join", "skew_report"]


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    `aggs` is a list of (column, fn) with fn one of sum/count/min/max
    (the re-combinable aggregates; avg = sum+count composed by the
    caller). Phase 1 aggregates (keys..., salt) — the hot key's rows
    split across salt_buckets tasks; phase 2 merges the per-salt
    partials, a #keys×salt_buckets-row shuffle. Output columns are
    named `{fn}_{column}`.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    for _, fn in aggs:
        if fn not in mergers:
            raise ValueError(f"non-recombinable aggregate: {fn}")

    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[firsts[fn](c).alias(f"_p_{c}_{fn}") for c, fn in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[fn](f"_p_{c}_{fn}").alias(f"{fn}_{c}") for c, fn in aggs]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Column | list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: salt the skewed side,
    replicate `other` across every salt, join on (key, salt).

    `other` grows salt_buckets×, so use this when `other` is modest but
    too big (or too dynamic) to broadcast outright; for genuinely tiny
    tables F.broadcast is strictly better.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = s.join(o, on_cols + ["_salt"], how)
    return joined.drop("_salt")


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Hot-key diagnosis for a planned groupBy/join key: the top_n
    heaviest keys with their row share — the number you check before
    choosing salt_buckets. One hash-agg + a top-k (TakeOrdered, no
    global sort); the totals ride along as a 1-row broadcast.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n",
            ratio_round(F.col("n"), F.col("_tot")).alias("share"),
            ratio_round(
                F.col("n") * F.col("_nkeys"), F.col("_tot"), digits=4
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n"), *keys)
        .limit(top_n)
    )
