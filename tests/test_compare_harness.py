"""Meta-test: the oracle comparator must actually detect defects
(a vacuously-green harness is worse than none)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tools.oracle_check import canonicalize, compare


def test_detects_row_count_mismatch():
    a = pd.DataFrame({"x": [1, 2, 3]})
    b = pd.DataFrame({"x": [1, 2]})
    assert compare(a, b)


def test_detects_column_mismatch():
    a = pd.DataFrame({"x": [1]})
    b = pd.DataFrame({"y": [1]})
    assert compare(a, b)


def test_detects_single_ulp_float_difference():
    v = 1.0 / 3.0
    a = pd.DataFrame({"x": [v]})
    b = pd.DataFrame({"x": [np.nextafter(v, 1.0)]})
    assert compare(a, b), "one-ulp float difference must be detected"


def test_detects_value_mismatch_after_reorder():
    a = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    b = pd.DataFrame({"k": [2, 1], "v": ["b", "x"]})
    assert compare(a, b)


def test_accepts_row_and_column_reordering():
    a = pd.DataFrame({"k": [1, 2], "v": [10.5, 20.5]})
    b = pd.DataFrame({"v": [20.5, 10.5], "k": [2, 1]})
    assert not compare(a, b)


def test_accepts_matching_nulls():
    a = pd.DataFrame({"k": [1, 2], "v": [None, "b"]})
    b = pd.DataFrame({"k": [2, 1], "v": ["b", None]})
    assert not compare(a, b)


def test_detects_int_vs_float_representation():
    """The r2 `type_pivot` failure mode: numerically equal counts, int64
    on one side, float64 (DuckDB HUGEINT via fetchdf) on the other — the
    driver's hash diverges, so the self-check must too."""
    a = pd.DataFrame({"n": np.array([1, 2, 3], dtype=np.int64)})
    b = pd.DataFrame({"n": np.array([1.0, 2.0, 3.0], dtype=np.float64)})
    problems = compare(a, b)
    assert problems and "DTYPE" in problems[0]


def test_detects_decimal_vs_float_representation():
    """The r2 `sql_revenue_by_segment` failure mode: Spark DECIMAL
    arrives as object-dtype decimal.Decimal, DuckDB DOUBLE as float64 —
    equal values, different driver hash."""
    import decimal

    a = pd.DataFrame({"v": [decimal.Decimal("1.5"), decimal.Decimal("2.5")]})
    b = pd.DataFrame({"v": [1.5, 2.5]})
    problems = compare(a, b)
    assert problems and "DTYPE" in problems[0]


def test_accepts_equal_kind_object_strings():
    a = pd.DataFrame({"s": ["x", "y"]})
    b = pd.DataFrame({"s": ["y", "x"]})
    assert not compare(a, b)


def test_canonicalize_stable():
    df = pd.DataFrame({"b": [3, 1, 2], "a": ["z", "x", "y"]})
    c1 = canonicalize(df)
    c2 = canonicalize(df.iloc[[2, 0, 1]].reset_index(drop=True))
    assert c1.equals(c2)
