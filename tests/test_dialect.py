"""SQLite→Spark dialect shim unit tests."""

from __future__ import annotations

import pytest

from filesql_spark.dialect import rewrite, translate_strftime_format
from filesql_spark.errors import FilesqlError


def test_double_quoted_identifiers():
    assert rewrite('SELECT "a b" FROM "my table"') == "SELECT `a b` FROM `my table`"


def test_string_literals_untouched():
    assert rewrite("SELECT 'he said \"hi\"' FROM t") == "SELECT 'he said \"hi\"' FROM t"


def test_strftime_month():
    out = rewrite("SELECT strftime('%Y-%m', created_at) FROM t")
    assert out == "SELECT date_format(CAST((created_at) AS TIMESTAMP), 'yyyy-MM') FROM t"


def test_strftime_epoch():
    out = rewrite("SELECT strftime('%s', ts) FROM t")
    assert "unix_timestamp" in out


def test_strftime_nested_expr():
    out = rewrite("SELECT CAST(strftime('%H', timestamp) AS INTEGER) FROM logs")
    assert "date_format(CAST((timestamp) AS TIMESTAMP), 'HH')" in out


def test_julianday_diff():
    out = rewrite("SELECT julianday(max_d) - julianday(min_d) FROM t")
    assert out.count("2440587.5") == 2


def test_printf():
    assert (
        rewrite("SELECT printf('%.2f', x) FROM t")
        == "SELECT format_string('%.2f', x) FROM t"
    )


def test_ifnull():
    assert rewrite("SELECT ifnull(a, 0) FROM t") == "SELECT nvl(a, 0) FROM t"


def test_group_concat():
    assert (
        rewrite("SELECT group_concat(name) FROM t")
        == "SELECT concat_ws(',', collect_list(name)) FROM t"
    )
    assert (
        rewrite("SELECT group_concat(name, ';') FROM t")
        == "SELECT concat_ws(';', collect_list(name)) FROM t"
    )


def test_function_name_in_string_untouched():
    assert rewrite("SELECT 'strftime(%Y)' FROM t") == "SELECT 'strftime(%Y)' FROM t"


def test_unsupported_strftime_code():
    with pytest.raises(FilesqlError):
        translate_strftime_format("%G")


def test_strftime_literal_quoting():
    # literal alpha chars must be single-quoted for Java patterns
    assert translate_strftime_format("%YT%m") == "yyyy'T'MM"


def test_scalar_min_max():
    assert rewrite("SELECT MIN(a, b) FROM t") == "SELECT least(a, b) FROM t"
    assert rewrite("SELECT MAX(a, b, c) FROM t") == "SELECT greatest(a, b, c) FROM t"
    # 1-arg stays an aggregate
    assert rewrite("SELECT MIN(a) FROM t") == "SELECT min(a) FROM t"
    assert rewrite("SELECT MAX(x) FROM t GROUP BY y") == "SELECT max(x) FROM t GROUP BY y"


def test_date_now_family():
    assert (
        rewrite("SELECT date('now')")
        == "SELECT date_format(current_timestamp(), 'yyyy-MM-dd')"
    )
    assert "yyyy-MM-dd HH:mm:ss" in rewrite("SELECT datetime(created_at) FROM t")
    with pytest.raises(FilesqlError):
        rewrite("SELECT date('now', 'localtime')")


def _eval1(spark, sql: str):
    return spark.sql(rewrite(sql)).collect()[0][0]


def test_datetime_modifiers_arithmetic(spark):
    assert _eval1(spark, "SELECT datetime('2021-01-15 12:30:45', '+2 days', '-1 hours')") \
        == "2021-01-17 11:30:45"
    assert _eval1(spark, "SELECT date('2021-01-01', '-1 day')") == "2020-12-31"
    assert _eval1(spark, "SELECT time('2021-01-15 12:00:00', '+90 minutes')") == "13:30:00"


def test_datetime_modifiers_month_overflow_normalizes_like_sqlite(spark):
    # SQLite: Jan 31 + 1 month = Feb 31 → normalized to Mar 3 (2021), never
    # clamped to Feb 28 the way Spark's add_months would
    assert _eval1(spark, "SELECT date('2021-01-31', '+1 month')") == "2021-03-03"
    assert _eval1(spark, "SELECT date('2024-02-29', '+1 year')") == "2025-03-01"
    assert _eval1(spark, "SELECT date('2021-03-15', '-1 month')") == "2021-02-15"


def test_datetime_modifiers_start_of(spark):
    assert _eval1(spark, "SELECT date('2021-03-15', 'start of month')") == "2021-03-01"
    assert _eval1(spark, "SELECT date('2021-03-15', 'start of year')") == "2021-01-01"
    assert _eval1(spark, "SELECT datetime('2021-03-15 10:11:12', 'start of day')") \
        == "2021-03-15 00:00:00"
    # modifiers chain left-to-right (SQLite's "last day of month" idiom)
    assert _eval1(
        spark, "SELECT date('2021-02-10', 'start of month', '+1 month', '-1 day')"
    ) == "2021-02-28"


def test_datetime_modifier_weekday(spark):
    # 2021-02-28 is a Sunday: weekday 0 stays put, weekday 1 → next Monday
    assert _eval1(spark, "SELECT date('2021-02-28', 'weekday 0')") == "2021-02-28"
    assert _eval1(spark, "SELECT date('2021-02-28', 'weekday 1')") == "2021-03-01"


def test_strftime_expression_codes(spark):
    # %w/%W/%s have no Java pattern form — compiled to expressions
    assert _eval1(spark, "SELECT strftime('%w', '2021-02-28')") == "0"  # Sunday
    assert _eval1(spark, "SELECT strftime('%s', '1970-01-02 00:00:00')") == "86400"
    # C-strftime %W: 2021-01-03 precedes the first Monday → 00; 01-04 → 01
    assert _eval1(spark, "SELECT strftime('%W', '2021-01-03')") == "00"
    assert _eval1(spark, "SELECT strftime('%W', '2021-01-04')") == "01"
    assert _eval1(spark, "SELECT strftime('%Y-%m %w', '2021-02-28')") == "2021-02 0"
    assert _eval1(spark, "SELECT strftime('%H:%M:%f', '2021-01-01 10:20:30.123')") \
        == "10:20:30.123"
