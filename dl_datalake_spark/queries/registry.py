"""Registry mapping query name → Spark callable and → DuckDB oracle SQL.

Cross-engine discipline (every query here obeys these, or it will
hash-mismatch):
- alias every computed column identically on both sides;
- round every float that passed through an aggregate (sum order across
  partitions is engine-dependent in the last bits);
- DuckDB `SUM(integer)` yields HUGEINT and `length`/`year`/`row_number`
  yield BIGINT → cast to match Spark's LONG/INT;
- never return a raw TIMESTAMP column (tz/unit representation differs)
  — project to DATE, string, or epoch integer;
- events.ts is int64 epoch-NANOSECONDS on the Spark side
  (nanosAsLong) and TIMESTAMP_NS in DuckDB → compare through
  `epoch_ns()` and do bucket math with integer division only
  (1.7e18 does not fit in a double);
- LIMIT/top-k queries must order by (rounded value, unique key) so both
  engines cut the same row set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# exact cross-engine ratio rounding lives with the scalar-function
# surface; re-exported here because every oracle-paired query uses it
from dl_datalake_spark.functions.exact import ratio_round, ratio_round_sql  # noqa: E402,F401
