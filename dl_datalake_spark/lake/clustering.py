"""Multi-dimensional file clustering (Z-order) for data skipping.

The lake's Hive partitioning prunes on the partition axes (symbol,
year/month — `lake/paths.py`), and within a file Parquet min/max
footer stats prune row groups — but only along the SORT order. A scan
filtered on a non-leading column reads every file. Z-ordering rewrites
a dataset so every clustered column's per-file min/max range is tight:
interleave the bit patterns of the clustered columns into one Morton
key, range-partition + sort on that key, and each output file becomes
a small hyper-rectangle in the clustered space instead of a slab.

This is the standard lakehouse layout optimization (Delta OPTIMIZE
ZORDER BY, Iceberg rewrite with zorder); the reference has no
analogue — its layout axis is time only (`storage/writer.py:35-46`).

Scale shape: one aggregate pass for the per-column bucket bounds
(driver gets one tiny row — metadata, not data), one narrow projection
for the key, one range shuffle, one write. No windows, no global sort
of the raw columns, no driver data path. At 100 TB this is exactly the
plan a cluster runs; `repartitionByRange` samples the key, so skewed
key spaces still split evenly.

Bucketing is equi-depth: per-column `approx_percentile` edges (not
min/max equi-width), so heavy-tailed columns — ts, prices, volumes —
still fill all 2^bits buckets instead of collapsing into one. The
bucket lookup stays JVM-side: the edge array is a literal and the
bucket index is `aggregate(edges, count of edges <= v)` — 2^bits ≤ 64
comparisons per row, vectorizable, no UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, edges: list[float], bits: int) -> Column:
    """Equi-depth bucket index in [0, 2^bits): count of edges <= value.

    `edges` are the (2^bits - 1) interior quantile edges for the
    column, broadcast as a literal array.
    """
    arr = F.array(*[F.lit(float(e)) for e in edges])
    idx = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, e: acc + F.when(col.cast("double") >= e, 1).otherwise(0),
    )
    return F.least(idx, F.lit((1 << bits) - 1))


def morton_interleave(buckets: list[Column], bits: int) -> Column:
    """Morton (Z-curve) interleave: bit j of column c lands at position
    j * n_cols + c, so the curve alternates one bit per dimension —
    locality in the key implies locality in EVERY clustered column."""
    m = len(buckets)
    terms = []
    for c, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("long")
            terms.append(F.shiftleft(bit, j * m + c))
    return reduce(lambda a, b: a + b, terms).alias("zval")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 6
) -> DataFrame:
    """Attach a `zval` Morton key over `cols` (numeric/temporal).

    One agg pass computes every column's quantile edges together; the
    single collected row is bucket metadata (2^bits doubles per
    column), not data.
    """
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    edges_row = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), probs, 10_000).alias(c)
            for c in cols
        ]
    ).first()
    buckets = [
        _bucket(F.col(c), edges_row[c] or [0.0], bits) for c in cols
    ]
    return df.withColumn("zval", morton_interleave(buckets, bits))


def zorder_rewrite(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    num_files: int = 64,
    bits: int = 6,
) -> None:
    """Rewrite `df` as `num_files` Z-ordered parquet files.

    Range-partition on the Morton key (sampled split points — even
    output files regardless of key skew), sort within each partition so
    row-group stats are tight too, drop the key, write.
    """
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def file_skip_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of parquet files whose footer [min, max] for `col` does
    NOT intersect [lo, hi] — i.e. what a stats-pruning scan skips.
    Driver-side footer reads only (pure metadata)."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and (fmax < lo or fmin > hi):
            skipped += 1
    return skipped / max(1, len(files))
