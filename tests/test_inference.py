"""Type-inference semantics — ported from the reference's types_test.go
table-driven cases (FIXTURES.md §4)."""

from __future__ import annotations

import pytest

from filesql_spark.inference import (
    ColumnType,
    classify_value,
    get_sample_values,
    infer_column_type,
    is_datetime,
)


@pytest.mark.parametrize(
    "values,expected",
    [
        # all integers → INTEGER
        (["1", "2", "3"], ColumnType.INTEGER),
        (["-5", "+7", "0"], ColumnType.INTEGER),
        # ints + ≥10% floats → REAL
        (["1", "2.5", "3"], ColumnType.REAL),
        (["1.5", "2.5"], ColumnType.REAL),
        # floats below 10% of a numeric mix → INTEGER wins (MinRealThreshold,
        # types.go:649-653); the stray reals will NULL out on cast
        (["1"] * 95 + ["2.5"] * 5, ColumnType.INTEGER),
        # any text → TEXT (early exit >50%)
        (["abc", "def"], ColumnType.TEXT),
        (["1", "abc", "2"], ColumnType.TEXT),
        # datetime families at ≥80% confidence
        (["2024-01-01T10:00:00Z", "2024-01-02T11:30:00Z"], ColumnType.DATETIME),
        (["2024-01-01 10:00:00", "2024-01-02 11:30:00"], ColumnType.DATETIME),
        (["2024-01-01", "2024-01-02"], ColumnType.DATETIME),
        (["1/2/2006 3:04:05 PM", "2/3/2007 4:05:06 AM"], ColumnType.DATETIME),
        (["02.01.2006", "03.02.2007"], ColumnType.DATETIME),
        (["15:04:05", "16:05:06"], ColumnType.DATETIME),
        # mixed datetime + text → TEXT
        (["2024-01-01", "not a date"], ColumnType.TEXT),
        # empties skipped; all-empty → TEXT
        (["", "", ""], ColumnType.TEXT),
        ([], ColumnType.TEXT),
        (["", "5", ""], ColumnType.INTEGER),
        # int64 overflow → not integer → REAL (parses as float)
        (["99999999999999999999"], ColumnType.REAL),
    ],
)
def test_infer_column_type(values, expected):
    assert infer_column_type(values) == expected


@pytest.mark.parametrize(
    "value,ok",
    [
        ("2024-01-01T10:00:00Z", True),
        ("2024-01-01T10:00:00+09:00", True),
        ("2024-01-01T10:00:00.123Z", True),
        ("2024-01-01 10:00:00", True),
        ("2024-01-01", True),
        ("1/2/2006", True),
        ("12/31/2023 23:59:59", True),
        ("02.01.2006 15:04:05", True),
        ("15:04", True),
        ("not-a-date", False),
        ("2024-13-01", False),  # regex passes, parse fails (month 13)
        ("123", False),  # too short, no separator
        ("", False),
    ],
)
def test_is_datetime(value, ok):
    assert is_datetime(value) == ok


def test_classify_order():
    # datetime wins over numeric-looking strings it matches
    assert classify_value("15:04:05") == ColumnType.DATETIME
    assert classify_value("42") == ColumnType.INTEGER
    assert classify_value("4.2") == ColumnType.REAL
    assert classify_value("4.2.1") == ColumnType.TEXT


def test_sampling_caps_at_1000():
    big = [str(i) for i in range(10_000)]
    s = get_sample_values(big)
    assert len(s) <= 1000
    # stratified: has values from all thirds
    nums = [int(v) for v in s]
    assert min(nums) < 3333 and max(nums) >= 6666


def test_early_text_termination():
    # >50% text short-circuits regardless of later numerics
    values = ["a", "b", "c"] + ["1"] * 2
    assert infer_column_type(values) == ColumnType.TEXT
