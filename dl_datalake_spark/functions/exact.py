"""Exact cross-engine arithmetic helpers (see ratio_round_sql)."""

from __future__ import annotations


def ratio_round_sql(a: str, b: str, digits: int = 6) -> str:
    """Exact half-up rounding of the integer ratio a/b (a, b >= 0) for
    DuckDB oracles. Float ROUND(a/b, k) flips its last digit between
    engines when a/b lands within an ulp of a half boundary (Spark
    rounds the double's exact binary value via BigDecimal; DuckDB
    multiply-rounds) — small integer denominators hit such boundaries
    routinely (any odd a over b = 2^(k+1) terminates exactly on one).
    Integer floor-division sidesteps the float path entirely.
    """
    m = 10 ** digits
    return (
        f"((2 * CAST({a} AS BIGINT) * {m} + CAST({b} AS BIGINT))"
        f" // (2 * CAST({b} AS BIGINT))) / {float(m)}"
    )


def ratio_round(a, b, digits: int = 6):
    """Spark twin of ratio_round_sql: exact integer half-up a/b.

    Integer division without an F.div builtin: subtract pmod first so
    the double division's quotient is an exact integer (< 2^53 —
    exact in IEEE754)."""
    from pyspark.sql import functions as F

    m = 10 ** digits
    num = (2 * a.cast("long") * m + b.cast("long"))
    den = 2 * b.cast("long")
    q = (num - F.pmod(num, den)) / den
    return q / float(m)
