"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, compares row count, column names, **column dtypes**
(normalized Spark simpleString vs DuckDB result type, with explicit
decimal precision/scale matching), and order-insensitive values
(columns sorted by name, rows sorted, floats compared to 1e-9).

The dtype check exists because the driver's value hash folds in the
Arrow type metadata: Spark SUM(DECIMAL(18,2)) -> decimal(28,2) while
DuckDB widens to DECIMAL(38,2), and DuckDB SUM(BIGINT) -> HUGEINT
(int128) while Spark stays bigint — values agree, hashes do not.
Round 1 (q12) and round 2 (agg_decimal_money) both shipped this class
because the old gate compared names + values only.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from __spark_entry__ import oracle_sql, queries
from dl_datalake_spark.session import get_spark
from dl_datalake_spark.tables import TABLE_NAMES


_SPARK_SCALARS = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}

_DUCK_SCALARS = {
    "tinyint": "int8",
    "smallint": "int16",
    "integer": "int32",
    "bigint": "int64",
    "hugeint": "int128",  # no Spark equivalent: flags uncast SUM(BIGINT)
    "utinyint": "uint8",
    "usmallint": "uint16",
    "uinteger": "uint32",
    "ubigint": "uint64",
    "float": "float32",
    "real": "float32",
    "double": "float64",
    "varchar": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp with time zone": "timestamp",
    "blob": "binary",
}


def norm_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal("):
        return t  # keep precision/scale verbatim: decimal(38,2)
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{norm_spark_type(t[6:-1])}>"
    if t.startswith("map<") or t.startswith("struct<"):
        return t  # rare in registry output; compare verbatim
    return _SPARK_SCALARS.get(t, t)


def norm_duck_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal("):
        return t.replace(" ", "")
    if t.endswith("[]"):
        return f"list<{norm_duck_type(t[:-2])}>"
    return _DUCK_SCALARS.get(t, t)


def dtype_problems(spark_dtypes, duck_cols, duck_types):
    """Compare per-column normalized types, matched by lowercased name."""
    s = {n.lower(): norm_spark_type(t) for n, t in spark_dtypes}
    d = {n.lower(): norm_duck_type(str(t)) for n, t in zip(duck_cols, duck_types)}
    out = []
    for col in sorted(set(s) & set(d)):
        if s[col] != d[col]:
            out.append(f"dtype[{col}] spark={s[col]} duck={d[col]}")
    return out


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def values_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not (
                    math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9)
                    or (math.isnan(va) and math.isnan(vb))
                ):
                    return False
            elif str(va) != str(vb):
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_dtypes = sdf.dtypes
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_rows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_types = rel.types
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        else:
            problems.extend(dtype_problems(spark_dtypes, duck_cols, duck_types))
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            ns = normalize(spark_rows, spark_cols)
            nd = normalize(duck_rows, duck_cols)
            if not values_equal(ns, nd):
                diff = [(a, b) for a, b in zip(ns, nd) if not values_equal([a], [b])]
                problems.append(f"values differ, e.g. {diff[:2]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(spark_rows)} rows  ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
