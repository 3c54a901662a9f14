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
    return f"({ratio_units_sql(a, b, digits)}) / {float(m)}"


def ratio_units_sql(a: str, b: str, digits: int = 6) -> str:
    """Integer form: round(a/b * 10^digits) half-up, as BIGINT SQL.
    Envelope: exact while 2*a*10^digits < 2^63 (a < ~4.6e12 at 6
    digits) — far beyond any per-group count this repo aggregates;
    for larger magnitudes drop digits.

    NONNEGATIVE a only: DuckDB's // truncates toward zero on negative
    numerators while Spark's floor() floors, so the two sides diverge
    by one unit exactly when a < 0 (caught live building
    emb_silhouette_by_label — shift the quantity into nonnegative
    range first and shift back after, as that query does)."""
    m = 10 ** digits
    return (
        f"(2 * CAST({a} AS BIGINT) * {m} + CAST({b} AS BIGINT))"
        f" // (2 * CAST({b} AS BIGINT))"
    )


def ratio_round(a, b, digits: int = 6):
    """Spark twin of ratio_round_sql: exact integer half-up a/b.

    Integer division without an F.div builtin: subtract pmod first so
    the double division's quotient is an exact integer (< 2^53 —
    exact in IEEE754)."""
    from pyspark.sql import functions as F

    m = 10 ** digits
    return ratio_units(a, b, digits) / float(m)


def ratio_units(a, b, digits: int = 6):
    """Spark twin of ratio_units_sql: round(a/b * 10^digits) half-up as
    a long Column (same 2^63 envelope)."""
    from pyspark.sql import functions as F

    m = 10 ** digits
    num = (2 * a.cast("long") * m + b.cast("long"))
    # null-safe like DuckDB's `x // 0` → NULL: division by a nullif'd
    # zero yields NULL instead of ANSI ArithmeticException
    den = F.nullif((2 * b.cast("long")), F.lit(0).cast("long"))
    # Spark long/long division detours through doubles, which round
    # past 2^53 — large cents/micros numerators DO exceed that (caught
    # live: a 1-micro flip on a 1.5e17 numerator; hypothesis later found
    # a 64-unit drift at 1.15e18, where a double ulp is 128 — so a
    # double candidate is NOT within ±1 of the floor).  DECIMAL(38,0)
    # division is exact decimal arithmetic rounded HALF_UP at scale 6,
    # i.e. within 1e-6 of the true quotient for the entire long range;
    # flooring that and correcting with exact long comparisons (for the
    # near-integer case rounding pushed across the boundary) is exact.
    q0 = F.floor(num.cast("decimal(38,0)") / den.cast("decimal(38,0)")).cast("long")
    q = (
        q0
        + F.when((q0 + 1) * den <= num, F.lit(1)).otherwise(F.lit(0))
        - F.when(q0 * den > num, F.lit(1)).otherwise(F.lit(0))
    )
    return q
