"""The local oracle gate must be dtype-strict: round 1 (q12) and
round 2 (agg_decimal_money) both shipped value-identical results whose
TYPE metadata diverged (Spark decimal widening vs DuckDB, HUGEINT sums)
and the old names+values comparison waved them through. These tests pin
the normalization mapping and that a mis-typed pair FAILS."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_correctness import dtype_problems, norm_duck_type, norm_spark_type


def test_scalar_normalization_mapping():
    assert norm_spark_type("bigint") == norm_duck_type("BIGINT") == "int64"
    assert norm_spark_type("int") == norm_duck_type("INTEGER") == "int32"
    assert norm_spark_type("double") == norm_duck_type("DOUBLE") == "float64"
    assert norm_spark_type("string") == norm_duck_type("VARCHAR") == "str"
    assert norm_spark_type("date") == norm_duck_type("DATE") == "date"
    assert norm_spark_type("timestamp") == norm_duck_type("TIMESTAMP") == "timestamp"
    assert (
        norm_spark_type("array<double>")
        == norm_duck_type("DOUBLE[]")
        == "list<float64>"
    )
    assert norm_spark_type("decimal(38,2)") == norm_duck_type("DECIMAL(38,2)")


def test_decimal_precision_mismatch_fails():
    # Spark SUM(DECIMAL(18,2)) -> decimal(28,2); DuckDB widens to (38,2)
    probs = dtype_problems(
        [("gross", "decimal(28,2)")], ["gross"], ["DECIMAL(38,2)"]
    )
    assert probs == ["dtype[gross] spark=decimal(28,2) duck=decimal(38,2)"]


def test_hugeint_uncast_sum_fails():
    # DuckDB SUM(BIGINT) -> HUGEINT (int128); Spark stays bigint
    probs = dtype_problems([("n", "bigint")], ["n"], ["HUGEINT"])
    assert probs == ["dtype[n] spark=int64 duck=int128"]


def test_matching_types_pass():
    assert (
        dtype_problems(
            [("a", "bigint"), ("b", "array<double>"), ("c", "decimal(38,4)")],
            ["a", "b", "c"],
            ["BIGINT", "DOUBLE[]", "DECIMAL(38,4)"],
        )
        == []
    )
