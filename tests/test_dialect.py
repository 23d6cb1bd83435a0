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
        rewrite("SELECT date('now', '-7 days')")
