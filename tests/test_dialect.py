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
    # literal formats coerce each arg to the directive's type (SQLite
    # printf semantics); non-literal formats stay a plain rename
    out = rewrite("SELECT printf('%.2f', x) FROM t")
    assert out.startswith("SELECT format_string('%.2f', ")
    assert "AS DOUBLE" in out  # x coerced through the REAL-cast emulation
    assert (
        rewrite("SELECT printf(f, x) FROM t")
        == "SELECT format_string(f, x) FROM t"
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
    # scalar form → least/greatest under a NULL guard (SQLite scalar
    # min/max return NULL if ANY arg is NULL; least/greatest skip NULLs)
    assert rewrite("SELECT MIN(a, b) FROM t") == (
        "SELECT (CASE WHEN (a) IS NULL OR (b) IS NULL "
        "THEN NULL ELSE least(a, b) END) FROM t"
    )
    assert "greatest(a, b, c)" in rewrite("SELECT MAX(a, b, c) FROM t")
    # 1-arg stays an aggregate
    assert rewrite("SELECT MIN(a) FROM t") == "SELECT min(a) FROM t"
    assert rewrite("SELECT MAX(x) FROM t GROUP BY y") == "SELECT max(x) FROM t GROUP BY y"


def test_scalar_min_max_null_and_nested(spark):
    """sqlite3 ground truth: NULL poisons scalar min/max; nesting works
    (found by tests/test_fuzz_dialect.py — the sweep skipped nested
    same-name calls)."""
    import sqlite3

    stmt = "SELECT min(NULL, 5), max(3, NULL), max(max(1, 2), 3), min(min(4, 1), max(2, NULL))"
    con = sqlite3.connect(":memory:")
    exp = con.execute(stmt).fetchone()
    con.close()
    got = tuple(spark.sql(rewrite(stmt)).collect()[0])
    assert got == tuple(exp) == (None, None, 3, None)


def test_date_now_family():
    assert (
        rewrite("SELECT date('now')")
        == "SELECT date_format(current_timestamp(), 'yyyy-MM-dd')"
    )
    assert "yyyy-MM-dd HH:mm:ss" in rewrite("SELECT datetime(created_at) FROM t")
    # 'localtime' is supported (identity under the pinned UTC session TZ);
    # a genuinely unknown modifier still raises
    with pytest.raises(FilesqlError):
        rewrite("SELECT date('now', 'no such modifier')")


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


# ----------------------------------------------------------- LIKE rewrite


def test_like_becomes_ilike():
    assert rewrite("SELECT * FROM t WHERE name LIKE 'a%'") == (
        "SELECT * FROM t WHERE name ILIKE 'a%'"
    )
    assert rewrite("SELECT * FROM t WHERE name NOT LIKE '%x'") == (
        "SELECT * FROM t WHERE name NOT ILIKE '%x'"
    )


def test_like_inside_string_untouched():
    assert rewrite("SELECT 'I like cats' FROM t") == "SELECT 'I like cats' FROM t"


def test_ilike_input_not_double_rewritten():
    sql = "SELECT * FROM t WHERE a ILIKE 'x%'"
    assert rewrite(sql) == sql


def test_like_escape_clause_passes_through():
    out = rewrite("SELECT * FROM t WHERE a LIKE 'x!_%' ESCAPE '!'")
    assert out == "SELECT * FROM t WHERE a ILIKE 'x!_%' ESCAPE '!'"


def test_like_case_insensitive_matches_sqlite(spark):
    """SQLite LIKE is case-insensitive for ASCII by default
    (reference filesql_test.go:130-141 matches mixed-case names); Spark's
    LIKE is case-sensitive — the shim must close the divergence.
    (Known remaining difference: ILIKE folds full Unicode; SQLite only
    ASCII — documented in _rewrite_like.)"""
    spark.createDataFrame(
        [("Alice",), ("ALBERT",), ("bob",)], "name string"
    ).createOrReplaceTempView("like_t")
    rows = spark.sql(rewrite("SELECT name FROM like_t WHERE name LIKE 'al%'")).collect()
    assert sorted(r.name for r in rows) == ["ALBERT", "Alice"]


# ------------------------------------- doubled-quote escape vs rewriter


def test_find_call_after_doubled_quote_literal():
    """A '' escape inside a literal must not flip the in-string parity and
    hide a legitimate rewrite site to its right (VERDICT r2 minor #5)."""
    out = rewrite("SELECT 'it''s', ifnull(a, 0) FROM t")
    assert out == "SELECT 'it''s', nvl(a, 0) FROM t"


# ------------------------------------------------- datetime modifiers


def test_unixepoch_modifier(spark):
    out = rewrite("SELECT datetime(1092941466, 'unixepoch') AS d")
    assert spark.sql(out).collect()[0].d == "2004-08-19 18:51:06"


def test_unixepoch_with_arithmetic(spark):
    out = rewrite("SELECT date(0, 'unixepoch', '+1 day') AS d")
    assert spark.sql(out).collect()[0].d == "1970-01-02"


def test_unixepoch_must_be_first():
    with pytest.raises(FilesqlError, match="unixepoch"):
        rewrite("SELECT datetime('2024-01-01', '+1 day', 'unixepoch')")


def test_localtime_utc_identity(spark):
    """Engine sessions pin spark.sql.session.timeZone=UTC, so SQLite's
    localtime/utc conversions are identity (documented in _apply_modifier)."""
    out = rewrite("SELECT datetime('2024-03-05 12:00:00', 'localtime') AS a, "
                  "datetime('2024-03-05 12:00:00', 'utc') AS b")
    row = spark.sql(out).collect()[0]
    assert row.a == row.b == "2024-03-05 12:00:00"


def test_strftime_with_modifiers(spark):
    out = rewrite("SELECT strftime('%Y-%m-%d', '2024-01-31', '+1 month') AS d")
    # SQLite month-overflow normalization: Jan 31 + 1 month = Mar 2 (2024 leap)
    assert spark.sql(out).collect()[0].d == "2024-03-02"


# --------------------------------------------- r4 function-shim additions


def test_iif_and_format(spark):
    out = rewrite("SELECT iif(1 < 2, 'y', 'n') AS a, format('%d-%s', 7, 'x') AS b")
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b) == ("y", "7-x")


def test_total_vs_sum_empty(spark):
    """SQLite total() returns 0.0 where SUM returns NULL."""
    spark.createDataFrame([(1, None)], "id int, v double").createOrReplaceTempView("tot_t")
    out = rewrite("SELECT total(v) AS t, sum(v) AS s FROM tot_t")
    row = spark.sql(out).collect()[0]
    assert row.t == 0.0 and row.s is None


def test_unixepoch_function(spark):
    out = rewrite("SELECT unixepoch('2004-08-19 18:51:06') AS e, "
                  "unixepoch('1970-01-02', '+1 hour') AS f")
    row = spark.sql(out).collect()[0]
    assert row.e == 1092941466 and row.f == 86400 + 3600


def test_log_is_base10(spark):
    """SQLite's 1-arg log() is base-10 (2-arg log(B,X) is base-B); Spark's
    1-arg log is natural — the rewrite closes the silent divergence."""
    out = rewrite("SELECT log(100) AS a, log(2, 8) AS b, ln(1) AS c")
    row = spark.sql(out).collect()[0]
    assert row.a == 2.0 and row.b == 3.0 and row.c == 0.0


def test_glob_rewrite(spark):
    spark.createDataFrame(
        [("abc.txt",), ("ABC.TXT",), ("abc.dat",), ("a1c.txt",)], "f string"
    ).createOrReplaceTempView("glob_t")
    out = rewrite("SELECT f FROM glob_t WHERE f GLOB 'a*.txt'")
    assert "RLIKE" in out
    rows = sorted(r.f for r in spark.sql(out).collect())
    assert rows == ["a1c.txt", "abc.txt"]  # case-sensitive, unlike LIKE
    # character class + ? wildcard
    out2 = rewrite("SELECT f FROM glob_t WHERE f GLOB 'a[0-9]c.???'")
    assert [r.f for r in spark.sql(out2).collect()] == ["a1c.txt"]


def test_glob_non_literal_raises():
    with pytest.raises(FilesqlError, match="GLOB"):
        rewrite("SELECT * FROM t WHERE a GLOB b")


def test_glob_inside_string_untouched():
    assert rewrite("SELECT 'use GLOB here' FROM t") == "SELECT 'use GLOB here' FROM t"


def test_not_glob(spark):
    spark.createDataFrame(
        [("a.txt",), ("b.dat",)], "f string"
    ).createOrReplaceTempView("nglob_t")
    out = rewrite("SELECT f FROM nglob_t WHERE f NOT GLOB '*.txt'")
    assert "NOT RLIKE" in out
    assert [r.f for r in spark.sql(out).collect()] == ["b.dat"]


def test_collate_nocase(spark):
    """SQLite COLLATE NOCASE → Spark COLLATE UTF8_LCASE: case-insensitive
    comparison and ordering (same ASCII-vs-Unicode folding caveat as
    LIKE→ILIKE). COLLATE BINARY maps to the UTF8_BINARY default; RTRIM has
    no Spark equivalent and raises."""
    spark.createDataFrame(
        [("b",), ("A",), ("a",), ("B",)], "x string"
    ).createOrReplaceTempView("coll_t")
    out = rewrite("SELECT x FROM coll_t WHERE x = 'A' COLLATE NOCASE")
    assert sorted(r.x for r in spark.sql(out).collect()) == ["A", "a"]
    out2 = rewrite("SELECT x FROM coll_t ORDER BY x COLLATE NOCASE, x")
    assert [r.x for r in spark.sql(out2).collect()] == ["A", "a", "B", "b"]
    out3 = rewrite("SELECT COUNT(*) AS n FROM coll_t WHERE x = 'a' COLLATE BINARY")
    assert spark.sql(out3).collect()[0].n == 1
    with pytest.raises(FilesqlError, match="RTRIM"):
        rewrite("SELECT 1 WHERE 'a ' = 'a' COLLATE RTRIM")
    # collation keywords inside string literals untouched
    assert rewrite("SELECT 'collate nocase' FROM t") == "SELECT 'collate nocase' FROM t"


def test_sqlite_idioms_pass_through(spark):
    """SQLite idioms Spark SQL supports natively — pinned so a future shim
    change can't silently break them: || concat, IS / IS NOT, hex()
    (uppercase hex of UTF-8 bytes in both engines), nullif, sign."""
    out = rewrite(
        "SELECT 'a' || 'b' AS cat, 1 IS NOT NULL AS nn, hex('AB') AS h, "
        "nullif(3, 3) AS nf, sign(-7) AS sg"
    )
    row = spark.sql(out).collect()[0]
    assert row.cat == "ab" and row.nn is True
    assert row.h == "4142"  # uppercase, byte-wise — matches SQLite hex()
    assert row.nf is None and row.sg == -1


def test_char_unicode_quote(spark):
    """char() builds from full unicode codepoints (Spark's chr truncates
    mod 256 — the shim decodes UTF-32 instead); unicode() → ascii();
    quote() matches SQLite: NULL → 'NULL', numbers unquoted, text as a
    ''-escaped literal (typeof-keyed, constant-folded)."""
    out = rewrite("SELECT char(65, 66, 8364) AS c, unicode('€') AS u, "
                  "quote('it''s') AS q")
    row = spark.sql(out).collect()[0]
    assert row.c == "AB€"
    assert row.u == 8364
    assert row.q == "'it''s'"
    assert _eval1(spark, "SELECT quote(42)") == "42"
    assert _eval1(spark, "SELECT quote(4.5)") == "4.5"
    assert _eval1(spark, "SELECT quote(NULL)") == "NULL"


def test_char_type_in_cast_untouched(spark):
    """char is also a parenthesized TYPE name — CAST(x AS CHAR(5)) must not
    be rewritten as the char() codepoint function."""
    sql = "SELECT CAST('abcdef' AS CHAR(3)) AS c"
    assert rewrite(sql) == sql
    # Spark parses CHAR(n) but does not truncate on cast (SQLite's TEXT
    # affinity ignores the length too) — the point is the query still parses
    assert spark.sql(rewrite(sql)).collect()[0].c == "abcdef"


def test_planner_hints_are_identity():
    assert rewrite("SELECT * FROM t WHERE likely(a > 1)") == (
        "SELECT * FROM t WHERE (a > 1)"
    )
    assert rewrite("SELECT unlikely(b)") == "SELECT (b)"
    assert rewrite("SELECT likelihood(c = 1, 0.9)") == "SELECT (c = 1)"


def test_strftime_compound_aliases(spark):
    # %F/%T/%R are pure pattern aliases (C strftime; SQLite 3.44+)
    assert _eval1(spark, "SELECT strftime('%F', '2024-02-03 04:05:06')") == "2024-02-03"
    assert _eval1(spark, "SELECT strftime('%T', '2024-02-03 04:05:06')") == "04:05:06"
    assert _eval1(spark, "SELECT strftime('%R', '2024-02-03 04:05:06')") == "04:05"


def test_strftime_iso_weekday_and_week(spark):
    # cross-checked against C strftime (datetime.strftime): Sat=6, Sun=7, Mon=1
    import datetime

    for d in ["2024-02-03", "2024-02-04", "2024-02-05", "2021-01-03"]:
        py = datetime.date.fromisoformat(d)
        assert _eval1(spark, f"SELECT strftime('%u', '{d}')") == py.strftime("%u").lstrip("0") or py.isoweekday()
        assert _eval1(spark, f"SELECT strftime('%u', '{d}')") == str(py.isoweekday())
        assert _eval1(spark, f"SELECT strftime('%U', '{d}')") == py.strftime("%U")


def test_strftime_space_padded_hours(spark):
    assert _eval1(spark, "SELECT strftime('%k', '2024-02-03 04:05:06')") == " 4"
    assert _eval1(spark, "SELECT strftime('%k', '2024-02-03 14:05:06')") == "14"
    assert _eval1(spark, "SELECT strftime('%l', '2024-02-03 14:05:06')") == " 2"
    assert _eval1(spark, "SELECT strftime('%l', '2024-02-03 00:05:06')") == "12"


def test_json_extract(spark):
    # sqlite3 3.40: json_extract('{"a": {"b": 7}}', '$.a.b') = 7;
    # get_json_object returns the text form of the scalar
    assert _eval1(spark, """SELECT json_extract('{"a": {"b": 7}}', '$.a.b')""") == "7"
    assert _eval1(spark, """SELECT json_extract('{"a": [1,2,3]}', '$.a[1]')""") == "2"
    with pytest.raises(FilesqlError, match="json_extract"):
        rewrite("SELECT json_extract(doc, '$.a', '$.b')")


def test_json_array_length(spark):
    assert _eval1(spark, "SELECT json_array_length('[1,2,3]')") == 3
    assert _eval1(spark, """SELECT json_array_length('{"a":[1,2,3]}', '$.a')""") == 3


def test_json_valid(spark):
    assert _eval1(spark, "SELECT json_valid('[1,2]')") == 1
    assert _eval1(spark, "SELECT json_valid('nope')") == 0
    assert _eval1(spark, "SELECT json_valid(NULL)") is None


def test_glob_function_form(spark):
    # SQLite: glob(P, S) = S GLOB P (swapped args); sqlite3 3.40 confirms
    assert _eval1(spark, "SELECT glob('a*c', 'abc')") == True  # noqa: E712
    assert _eval1(spark, "SELECT glob('a*c', 'abd')") == False  # noqa: E712
    with pytest.raises(FilesqlError, match="string-literal"):
        rewrite("SELECT glob(pat_col, name) FROM t")


def test_glob_class_edge_cases(spark):
    # sqlite3 3.40 ground truth: ']' GLOB '[]a]'=1, 'a'=1, 'x'=0 (leading ]
    # is a literal member); backslash in a class is a literal member
    assert _eval1(spark, "SELECT ']' GLOB '[]a]'") == True  # noqa: E712
    assert _eval1(spark, "SELECT 'a' GLOB '[]a]'") == True  # noqa: E712
    assert _eval1(spark, "SELECT 'x' GLOB '[]a]'") == False  # noqa: E712
    assert _eval1(spark, "SELECT 'abc' GLOB 'a[]b]c'") == True  # noqa: E712
    assert _eval1(spark, r"SELECT 'a\c' GLOB 'a[\]c'") == True  # noqa: E712
    assert _eval1(spark, "SELECT 'a&b' GLOB 'a[&x]b'") == True  # noqa: E712


def test_glob_metachar_not_swallowed_by_literal_escaping(spark):
    # regression: the escaped '.' must survive Spark's string-literal
    # backslash handling — GLOB 'a.c' must NOT match 'axc'
    assert _eval1(spark, "SELECT 'a.c' GLOB 'a.c'") == True  # noqa: E712
    assert _eval1(spark, "SELECT 'axc' GLOB 'a.c'") == False  # noqa: E712


def test_string_literal_backslash_is_literal(spark):
    # SQLite literals have no escape character: 'a\c' is three characters.
    # Spark's parser would consume the backslash without the shim.
    assert _eval1(spark, r"SELECT 'a\c'") == "a\\c"
    assert _eval1(spark, r"SELECT length('a\c')") == 3
    assert _eval1(spark, r"SELECT 'it''s a \'") == "it's a \\"


def test_json_object_constructor(spark):
    # sqlite3 ground truth: compact separators, nulls kept, key order kept
    assert _eval1(spark, "SELECT json_object('a', 1, 'b', 'x')") == '{"a":1,"b":"x"}'
    assert _eval1(spark, "SELECT json_object('a', NULL, 'b', 2)") == '{"a":null,"b":2}'
    assert _eval1(spark, "SELECT json_object('a', 1.5)") == '{"a":1.5}'
    assert _eval1(spark, "SELECT json_object()") == "{}"
    with pytest.raises(FilesqlError, match="even number"):
        rewrite("SELECT json_object('a')")
    # dynamic TEXT keys are supported since r13b (element-wise build);
    # provably-numeric labels keep SQLite's exact error wording
    assert "concat(" in rewrite("SELECT json_object(k, v) FROM t")
    with pytest.raises(FilesqlError, match="labels must be TEXT"):
        rewrite("SELECT json_object(5, 1)")


def test_json_array_constructor(spark):
    assert _eval1(spark, "SELECT json_array(1, 2, 3)") == "[1,2,3]"
    assert _eval1(spark, "SELECT json_array('a', 'b')") == '["a","b"]'
    assert _eval1(spark, "SELECT json_array()") == "[]"


def test_typeof(spark):
    # sqlite3 ground truth: integer / real / text / null (blob via binary)
    assert _eval1(spark, "SELECT typeof(42)") == "integer"
    assert _eval1(spark, "SELECT typeof(4.5)") == "real"
    assert _eval1(spark, "SELECT typeof('a')") == "text"
    assert _eval1(spark, "SELECT typeof(NULL)") == "null"
    assert _eval1(spark, "SELECT typeof(unhex('00'))") == "blob"


def test_quote_blob(spark):
    # sqlite3 ground truth: quote(x'001f') => X'001F'
    assert _eval1(spark, "SELECT quote(unhex('001f'))") == "X'001F'"


def test_strftime_julian_day_matches_sqlite(spark):
    """%J fuzz vs the real sqlite3: julian day with SQLite's trailing-zero
    stripping, across whole days, half days, and fractional seconds."""
    import sqlite3

    from tests.test_dialect import _eval1  # self-import safe under pytest

    con = sqlite3.connect(":memory:")
    cases = [
        "2024-01-01 00:00:00",
        "2024-01-15 12:00:00",
        "2024-01-15 18:30:45.123",
        "2000-02-29 06:00:00",
        "1970-01-01 00:00:00",
        "2024-07-04 23:59:59.999",
    ]
    for ts in cases:
        want = con.execute("SELECT strftime('%J', ?)", (ts,)).fetchone()[0]
        got = _eval1(spark, f"SELECT strftime('%J', '{ts}')")
        assert got == want, (ts, got, want)


def test_upper_lower_ascii_only(spark):
    """SQLite's upper()/lower() fold ASCII only (ß and é pass through;
    Spark's Unicode fold would produce 'É'/'SS'). Found by
    tests/test_fuzz_dialect.py; same-function nesting exercises the
    recursive arg rewrite."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    exp = con.execute(
        "SELECT upper('straße éX'), lower(upper('Bé')), upper(upper('aé'))"
    ).fetchone()
    con.close()
    got = (
        _eval1(spark, "SELECT upper('straße éX')"),
        _eval1(spark, "SELECT lower(upper('Bé'))"),
        _eval1(spark, "SELECT upper(upper('aé'))"),
    )
    assert got == tuple(exp) == ("STRAßE éX", "bé", "Aé")


def test_hex_null_and_numbers(spark):
    """sqlite3 ground truth: hex(NULL)='', hex(12)='3132' (hex of the
    TEXT rendering), hex('ab')='6162'; blobs stay byte-level. Found by
    tests/test_fuzz_dialect.py (Spark: hex(NULL)=NULL, hex(12)='C')."""
    import sqlite3

    stmt = "SELECT hex(NULL), hex(12), hex(1.5), hex('ab'), hex(x'00ff')"
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(spark.sql(rewrite(stmt)).collect()[0])
    assert got == exp == ("", "3132", "312E35", "6162", "00FF")


def test_like_backslash_literal_pattern(spark):
    """SQLite LIKE without ESCAPE treats backslash as a literal char;
    Spark's matcher always escapes (a trailing one even errors). Literal
    patterns are fixed up; ESCAPE clauses pass through untouched."""
    import sqlite3

    stmt = (
        r"SELECT 'a\b' LIKE 'a\b', 'ab' LIKE 'a\b', 'a\' LIKE 'a\', "
        r"'a_b' LIKE 'aXb' ESCAPE 'X', 'C:\dir\f.txt' LIKE '%\dir\%'"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(int(v) for v in spark.sql(rewrite(stmt)).collect()[0])
    assert got == exp == (1, 0, 1, 0, 1)


def test_substr_exhaustive_vs_sqlite(spark):
    """Every (start, len) in [-8..8] x [-6..6] plus the 2-arg form on a
    6-char string, against the real SQLite — pins func.c's Y=0 /
    negative-Y / negative-Z rules end to end."""
    import sqlite3

    cols, names = [], []
    for y in range(-8, 9):
        cols.append(f"substr('abcdef', {y})")
        names.append(f"y{y}")
        for z in range(-6, 7):
            cols.append(f"substr('abcdef', {y}, {z})")
            names.append(f"y{y}z{z}")
    stmt = "SELECT " + ", ".join(cols)
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(spark.sql(rewrite(stmt)).collect()[0])
    bad = [
        (names[i], g, x) for i, (g, x) in enumerate(zip(got, exp)) if g != x
    ]
    assert not bad, bad[:10]


def test_trim_two_arg_and_round_negative(spark):
    """SQLite 2-arg trim family strips a character SET; round's negative
    digit count is taken as 0 (Spark would round into the integer part)."""
    import sqlite3

    stmt = (
        "SELECT trim('xxayx', 'x'), ltrim('xxay', 'x'), rtrim('yaxx', 'x'), "
        "trim('abcba', 'ab'), round(123.45, -1), round(155, -2), "
        "round(2.567, 2)"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(
        float(v) if hasattr(v, "as_integer_ratio") or str(type(v)) == "<class 'decimal.Decimal'>" else v
        for v in spark.sql(rewrite(stmt)).collect()[0]
    )
    assert got == exp == ("ay", "ay", "ya", "c", 123.0, 155.0, 2.57)


def test_cast_text_to_number_prefix_parse(spark):
    """SQLite CAST(TEXT AS INTEGER/REAL) parses the longest numeric
    prefix — '12abc'→12, no prefix→0, huge prefixes clamp to int64 —
    where Spark's cast NULLs on any trailing garbage (and ANSI mode
    raises). Non-numeric CAST targets stay untouched."""
    import sqlite3

    stmt = (
        "SELECT CAST('12abc' AS INTEGER), CAST('abc' AS INTEGER), "
        "CAST('  +42xyz' AS INTEGER), CAST('1.5e2xyz' AS REAL), "
        "CAST('99999999999999999999' AS INTEGER), CAST(NULL AS INTEGER), "
        "CAST(CAST('7pigs' AS INTEGER) AS REAL), CAST(12.9 AS INTEGER)"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(
        float(v) if type(v).__name__ == "Decimal" else v
        for v in spark.sql(rewrite(stmt)).collect()[0]
    )
    assert got == exp == (12, 0, 42, 150.0, 9223372036854775807, None, 7.0, 12)
    # CHAR(n)/TEXT/BLOB casts pass through exactly as written
    s2 = "SELECT CAST('abcdef' AS CHAR(3)) AS c"
    assert rewrite(s2) == s2


def test_printf_coercion_vs_sqlite(spark):
    """SQLite printf coerces args per directive (%d of 3.7 → 3, of text
    → prefix parse, of NULL → 0; %s of NULL → ''; %q/%Q/%w SQL-quote);
    Java's format_string throws on type mismatches instead."""
    import sqlite3

    stmt = (
        "SELECT printf('%d', 3.7), printf('%d', '12abc'), "
        "printf('%d', NULL), printf('%s', NULL), printf('%.2f', 'x9'), "
        "printf('%05d|%s', 42, 'ab'), printf('%d%%', 5), printf('%i', 9.9), "
        "printf('[%q]', 'it''s'), printf('[%Q]', NULL), format('%x', 255)"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(spark.sql(rewrite(stmt)).collect()[0])
    assert got == exp == (
        "3", "12", "0", "", "0.00", "00042|ab", "5%", "9",
        "[it''s]", "[NULL]", "ff",
    )


def test_string_agg_and_zeroblob(spark):
    """string_agg (3.44 group_concat alias) and zeroblob; zeroblob is
    differential vs sqlite3, string_agg pinned (local SQLite predates
    3.44)."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    exp = con.execute("SELECT hex(zeroblob(3)), length(zeroblob(4))").fetchone()
    con.close()
    got = spark.sql(
        rewrite("SELECT hex(zeroblob(3)) AS h, length(zeroblob(4)) AS l")
    ).collect()[0]
    assert (got.h, got.l) == tuple(exp) == ("000000", 4)
    assert (
        rewrite("SELECT string_agg(name, '|') FROM t")
        == "SELECT concat_ws('|', collect_list(name)) FROM t"
    )


def test_like_call_form_vs_sqlite(spark):
    """like(P, S[, E]) — function form with SQLite's swapped arg order;
    the operator with a parenthesized pattern must NOT be mistaken for
    it. (Without the pre-pass the operator rewrite renames the head to
    Spark's ilike(str, pat) — silently reversed arguments.)"""
    import sqlite3

    stmt = (
        r"SELECT like('a%', 'ABC'), like('a_c', 'abc'), like('x', 'y'), "
        r"like('a!%b', 'a%b', '!'), like('a\b', 'a\b'), "
        r"'ABC' LIKE ('a%')"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(int(v) for v in spark.sql(rewrite(stmt)).collect()[0])
    assert got == exp == (1, 1, 0, 1, 1, 1)


def test_sqlite_version_function():
    assert rewrite("SELECT sqlite_version()") == "SELECT '3.50.2'"


def test_concat_skips_nulls(spark, tmp_path):
    """SQLite 3.44 concat() ignores NULL args and renders numbers as
    text (the bundled sqlite3 here is 3.40, so expected values are
    pinned from the SQLite docs rather than differentially). Runs
    through the engine: REAL args render via the filesql_double_text
    session UDF since r12, like ||."""
    import filesql_spark as fs

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query(
            "SELECT concat('a', NULL, 'b') AS x, concat(NULL, NULL) AS y, "
            "concat(1, '-', 2.5) AS z, concat('p', concat(NULL, 'q')) AS n"
            " FROM one"
        ).collect()[0]
    finally:
        eng.close()
    assert (got.x, got.y, got.z, got.n) == ("ab", "", "1-2.5", "pq")


def test_json_group_aggregates_vs_sqlite(spark):
    """json_group_array/json_group_object incl. NULL elements (rendered
    as json null, never dropped) and the empty group → '[]'."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE j (k TEXT, v INTEGER)")
    con.executemany("INSERT INTO j VALUES (?,?)", [("a", 1), ("b", None), ("c", 3)])
    exp = con.execute(
        "SELECT json_group_array(v), json_group_object(k, v) FROM j"
    ).fetchone()
    exp_empty = con.execute(
        "SELECT json_group_array(v) FROM j WHERE k = 'zz'"
    ).fetchone()[0]
    con.close()

    spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 3)], "k string, v int"
    ).createOrReplaceTempView("j")
    got = spark.sql(rewrite(
        "SELECT json_group_array(v) AS a, json_group_object(k, v) AS o FROM j"
    )).collect()[0]
    got_empty = spark.sql(rewrite(
        "SELECT json_group_array(v) AS a FROM j WHERE k = 'zz'"
    )).collect()[0].a
    assert (got.a, got.o) == tuple(exp) == ("[1,null,3]", '{"a":1,"b":null,"c":3}')
    assert got_empty == exp_empty == "[]"


def test_json_type_vs_sqlite(spark):
    """json_type(X): top-level type names, differential vs sqlite3;
    malformed input raises like SQLite's 'malformed JSON'."""
    import sqlite3

    stmt = (
        'SELECT json_type(\'{"a":1}\'), json_type(\'[1,2]\'), '
        "json_type('\"x\"'), json_type('5'), json_type('5.5'), "
        "json_type('-3e2'), json_type('true'), json_type('null'), "
        "json_type('  [1] '), json_type(' 5 ')"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(spark.sql(rewrite(stmt)).collect()[0])
    assert got == exp == (
        "object", "array", "text", "integer", "real", "real",
        "true", "null", "array", "integer",
    )
    with pytest.raises(Exception, match="malformed JSON"):
        spark.sql(rewrite("SELECT json_type('nope')")).collect()
    # the path form rides the filesql_json_type session UDF (r13b)
    assert "filesql_json_type(" in rewrite("SELECT json_type('{}', '$.a')")


def test_json_quote_vs_sqlite(spark):
    import sqlite3

    stmt = ("SELECT json_quote(5), json_quote(5.5), json_quote('txt'), "
            "json_quote('a\"b'), json_quote(NULL)")
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()
    got = tuple(spark.sql(rewrite(stmt)).collect()[0])
    assert got == exp == ("5", "5.5", '"txt"', '"a\\"b"', "null")


def test_json_mutation_pinned_vs_sqlite(spark, tmp_path):
    """json_set/insert/replace/remove + json() through the engine front
    door, pinned against stdlib sqlite3 (the json fuzz tier in
    test_fuzz_dialect.py covers the random corpus)."""
    import sqlite3

    import filesql_spark as fs

    stmt = (
        "SELECT json_set('{}', '$.a.b', 1) AS c0, "
        "json_set('{}', '$.a', '[1,2]') AS c1, "
        "json_set('{}', '$.a', json('[1,2]')) AS c2, "
        "json_insert('{\"a\":1}', '$.a', 2, '$.b', 3) AS c3, "
        "json_replace('{\"a\":1}', '$.a', 2, '$.b', 3) AS c4, "
        "json_remove('[0,1,2,3]', '$[1]', '$[1]') AS c5, "
        "json_set('[1,2]', '$[#-1]', 9) AS c6, "
        "json_set('[1,2]', '$[5]', 9) AS c7, "
        "json_set('{\"a\":[1]}', '$.a[1]', 5) AS c8, "
        "json('  {\"q\": [1 , 2]} ') AS c9, "
        "json_set(json_set('{}', '$.x', 1), '$.y', 2) AS c10, "
        "json_set('{}', '$.a', json_extract('{\"b\":[1,2]}', '$.b')) AS c11, "
        "json_set('{}', '$.s', 'it''s') AS c12, "
        "json_set(NULL, '$.a', 1) AS c13, "
        "json_insert('{}', '$.a[4][4]', 1) AS c14"
    )
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = tuple(eng.query(stmt + " FROM one").collect()[0])
    finally:
        eng.close()
    assert got == exp


def test_json_each_vs_sqlite(spark, tmp_path):
    """json_each TVF: standalone, filtered, and correlated (comma-join →
    LATERAL VIEW) forms against sqlite3. key/value are TEXT here where
    SQLite types them per-value (documented divergence in json1.py)."""
    import sqlite3

    import filesql_spark as fs

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE j (id INTEGER, doc TEXT)")
    con.executemany(
        "INSERT INTO j VALUES (?, ?)",
        [(1, '{"a":1,"b":"t"}'), (2, "[10,20,30]"), (3, None)],
    )

    (tmp_path / "j.csv").write_text(
        'id,doc\n1,"{""a"":1,""b"":""t""}"\n2,"[10,20,30]"\n3,\n'
    )
    eng = fs.open(str(tmp_path / "j.csv"), spark=spark)
    try:
        q1 = "SELECT key, value, type FROM json_each('[10,20]')"
        exp = [tuple(str(x) for x in r) for r in con.execute(q1)]
        got = [tuple(r) for r in eng.query(q1).collect()]
        assert got == exp

        q2 = ("SELECT value FROM json_each('{\"p\":1,\"q\":2}') "
              "WHERE key = 'q'")
        assert [r[0] for r in eng.query(q2).collect()] == ["2"]

        q3 = ("SELECT j.id, je.value FROM j, json_each(j.doc) AS je "
              "ORDER BY j.id, je.fullkey")
        exp = [(r[0], str(r[1])) for r in con.execute(q3)]
        got = [tuple(r) for r in eng.query(q3).collect()]
        assert got == exp  # row 3 (NULL doc) contributes no rows

        q4 = "SELECT count(*) AS n FROM j, json_each(j.doc)"
        assert eng.query(q4).collect()[0][0] == con.execute(q4).fetchone()[0]

        # atom NULL for containers, fullkey paths, scalar doc row
        q5 = ("SELECT key, atom, fullkey FROM "
              "json_each('{\"a\":[1],\"b\":2}') ORDER BY key")
        exp = [tuple(None if x is None else str(x) for x in r)
               for r in con.execute(q5)]
        got = [tuple(r) for r in eng.query(q5).collect()]
        assert got == exp

        # json_tree: recursive descent, parent ids chain to containers
        q6 = ("SELECT key, value, type, atom, fullkey, path FROM "
              "json_tree('{\"a\":1,\"b\":[2,{\"c\":3}]}')")
        exp = [tuple(None if x is None else str(x) for x in r)
               for r in con.execute(q6)]
        got = [tuple(r) for r in eng.query(q6).collect()]
        assert got == exp
        # parent/id relation (values are engine-assigned DFS ids, so
        # check the RELATION, not the numbers): every non-root row's
        # parent is the id of the row whose fullkey == its path
        rows = eng.query(
            "SELECT id, parent, fullkey, path FROM "
            "json_tree('{\"a\":1,\"b\":[2,{\"c\":3}]}')"
        ).collect()
        by_fullkey = {r.fullkey: r.id for r in rows}
        for r in rows:
            if r.parent is not None:
                assert by_fullkey[r.path] == r.parent

        with pytest.raises(FilesqlError, match="FROM clause"):
            eng.query("SELECT json_each('[1]')")
    finally:
        eng.close()
    con.close()


# ----------------------------------------------------- pinned divergences
# VERDICT r9 #6/#7: the remaining dialect divergences that are DECIDED
# (documented, not scheduled for a fix) get tests that demonstrate the
# exact behavior delta against real SQLite, so any accidental drift in
# either direction fails loudly.


def test_divergence_unicode_like_folding(spark, tmp_path):
    """SQLite LIKE folds ASCII only ('É' LIKE 'é' is FALSE); the shim's
    ILIKE folds full Unicode (TRUE). ASCII behavior is identical."""
    import sqlite3

    import filesql_spark as fs

    con = sqlite3.connect(":memory:")
    assert con.execute("SELECT 'É' LIKE 'é'").fetchone()[0] == 0  # sqlite
    assert con.execute("SELECT 'A' LIKE 'a'").fetchone()[0] == 1
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query(
            "SELECT ('É' LIKE 'é') AS uni, ('A' LIKE 'a') AS asc_ FROM one"
        ).collect()[0]
        assert got.uni is True  # the pinned divergence
        assert got.asc_ is True  # ASCII folding matches SQLite
    finally:
        eng.close()


def test_divergence_computed_like_pattern_backslash(spark, tmp_path):
    """A backslash in a LIKE pattern: SQLite treats it as a literal
    character (no escape without ESCAPE); the shim literalizes it for
    LITERAL patterns (matches SQLite) but a COMPUTED pattern keeps
    Spark's escape semantics — '\\%' then matches a literal '%'."""
    import sqlite3

    import filesql_spark as fs

    con = sqlite3.connect(":memory:")
    #  literal pattern: backslash is a literal char in SQLite
    assert con.execute(r"SELECT 'a\b' LIKE 'a\b'").fetchone()[0] == 1
    #  computed pattern, same result in SQLite (still no escape char)
    assert con.execute(r"SELECT 'a\b' LIKE ('a\' || 'b')").fetchone()[0] == 1
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query(
            r"SELECT ('a\b' LIKE 'a\b') AS lit, "
            r"('a%' LIKE ('a' || '\' || '%')) AS comp_escape FROM one"
        ).collect()[0]
        assert got.lit is True  # literal pattern: matches SQLite
        # computed pattern: Spark reads \% as an ESCAPED percent —
        # matches the literal 'a%' (SQLite would require the pattern
        # chars verbatim: 'a\%' would NOT match 'a%'). The divergence.
        assert got.comp_escape is True
    finally:
        eng.close()


def test_divergence_cross_type_comparison(spark, tmp_path):
    """SQLite orders storage classes: NULL < numbers < TEXT < BLOB, so
    1 < 'a' is TRUE and 7 = '7' is FALSE (a literal carries no
    affinity: BINARY comparison). The r9 decision to keep Spark's loud
    ANSI error is SUPERSEDED (r13b): the comparison-affinity pass now
    folds literal/literal cross-type comparisons to their type-order
    constants and converts affinity-applied sides exactly — pinned
    differentially in test_fuzz_dialect.py's comparison tier."""
    import sqlite3

    import filesql_spark as fs

    con = sqlite3.connect(":memory:")
    exp = [con.execute(f"SELECT {e}").fetchone()[0] for e in
           ("1 < 'a'", "1 < '2'", "7 = '7'", "7 != '7'", "1 > 'a'")]
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query(
            "SELECT (1 < 'a') AS a, (1 < '2') AS b, (7 = '7') AS c, "
            "(7 != '7') AS d, (1 > 'a') AS e FROM one"
        ).collect()[0]
    finally:
        eng.close()
    assert [int(v) for v in got] == exp == [1, 1, 0, 1, 0]


def test_randomblob(spark, tmp_path):
    """randomblob(N): N pseudo-random bytes as a BLOB; N < 1 yields one
    byte (SQLite parity — values are random, so pin shape not content)."""
    import filesql_spark as fs

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        row = eng.query(
            "SELECT randomblob(16) AS b16, randomblob(1) AS b1, "
            "randomblob(0) AS b0, randomblob(-3) AS bneg, "
            "length(randomblob(8)) AS l8, typeof(randomblob(4)) AS t "
            "FROM one"
        ).collect()[0]
        assert len(row.b16) == 16 and len(row.b1) == 1
        assert len(row.b0) == 1 and len(row.bneg) == 1  # n<1 → 1 byte
        assert row.l8 == 8
        assert row.t == "blob"
        # two independent calls should (overwhelmingly) differ
        a, b = (bytes(r[0]) for r in
                eng.query("SELECT randomblob(16) FROM one "
                          "UNION ALL SELECT randomblob(16) FROM one")
                .collect())
        assert a != b
    finally:
        eng.close()


def test_float_modulo_matches_sqlite(spark, tmp_path):
    """SQLite `%` casts both operands to INTEGER; result is REAL when
    either operand is (7.5 % 2.3 → 1.0). Pinned against sqlite3."""
    import sqlite3

    import filesql_spark as fs

    stmt = ("SELECT 7.5 % 2 AS a, -7.5 % 2 AS b, 7.5 % -2 AS c, "
            "7.5 % 2.3 AS d, 7 % 2.5 AS e, 2 * 3.5 % 2 AS f, "
            "7.5 % 0 AS g, 7.5 % 2 % 3 AS h, 7 % 2 AS i")
    con = sqlite3.connect(":memory:")
    exp = tuple(con.execute(stmt).fetchone())
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = tuple(eng.query(stmt + " FROM one").collect()[0])
    finally:
        eng.close()
    assert got == exp
    assert isinstance(got[0], float) and isinstance(got[8], int)


def test_divergence_concat_precedence(spark, tmp_path):
    """CLOSED divergence (r16, was pinned since r11): SQLite's `||`
    binds TIGHTER than arithmetic — `1 + 2 || 'x'` is
    1 + ('2x' coerced to 2) = 3 — while Spark would parse
    (1 + 2) || 'x' = '3x'. The _rewrite_concat_grouping pass now
    parenthesizes ||-runs adjacent to arithmetic, restoring SQLite's
    grouping, and the value-dependent pass coerces the concat result
    numerically (value-exact; typed DOUBLE — the static-typing class)."""
    import sqlite3

    import filesql_spark as fs

    con = sqlite3.connect(":memory:")
    assert con.execute("SELECT 1 + 2 || 'x'").fetchone()[0] == 3
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query("SELECT 1 + 2 || 'x' AS c FROM one").collect()[0].c
        assert got == 3  # SQLite's grouping and coercion (r16)
    finally:
        eng.close()


def test_sign_and_abs_integer_semantics(spark, tmp_path):
    """r11 sweep findings, pinned against sqlite3: sign() returns
    INTEGER -1/0/1 (Spark's signum is DOUBLE), and abs() of an INTEGER
    operand widens to int64 (SQLite ints are always 8-byte;
    abs(-2147483648) = 2147483648 where Spark's INT literal would
    ANSI-overflow). abs of REAL stays REAL."""
    import sqlite3

    import filesql_spark as fs

    cases = [
        "sign(-4.2)", "sign(0)", "sign(7)", "sign(NULL)",
        "abs(-2147483648)", "abs(-7)", "abs(2.5)", "abs(-0.0)",
    ]
    select = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(cases))
    con = sqlite3.connect(":memory:")
    expected = con.execute(select).fetchone()
    con.close()

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query(select + " FROM one").collect()[0]
    finally:
        eng.close()
    for i, e in enumerate(cases):
        g, x = got[i], expected[i]
        assert g == x and type(g) is type(x), (e, g, x)


def test_divergence_boolean_rendering(spark, tmp_path):
    """Documented divergence: SQLite has no boolean type — a bare
    comparison SELECTs as INTEGER 1/0; this engine returns Spark's
    BooleanType (True/False), which is truthy-equivalent in every
    Python/database-api consumer. Pinned, not shimmed: coercing every
    boolean output column to int would rewrite ordinary projections."""
    import filesql_spark as fs

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        got = eng.query("SELECT 2 > 1 AS c FROM one").collect()[0].c
        assert got is True  # sqlite3 would return 1
    finally:
        eng.close()


def test_json_pretty_and_concat_render(spark, tmp_path):
    """r12: json_pretty (SQLite 3.46, doc-pinned format — the local
    stdlib sqlite3 predates it) and concat()'s %!.15g REAL rendering
    (consistent with ||, which is differentially pinned)."""
    import filesql_spark as fs

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        r = eng.query(
            "SELECT json_pretty('{\"a\":1,\"b\":[1,2]}') AS p, "
            "json_pretty('{\"a\":1}', '  ') AS p2, "
            "concat('a', NULL, 1e20) AS c, "
            "concat(2.5, 'x') AS c2 FROM one"
        ).collect()[0]
    finally:
        eng.close()
    assert r.p == '{\n    "a": 1,\n    "b": [\n        1,\n        2\n    ]\n}'
    assert r.p2 == '{\n  "a": 1\n}'
    assert r.c == "a1.0e+20"  # NULL skipped; %!.15g like || ('' || 1e20)
    assert r.c2 == "2.5x"


def test_alias_scans_ignore_comments():
    """A literal or identifier inside a trailing comment must not bind a
    phantom alias (r12: the alias scans blank -- and /* */ spans)."""
    out = rewrite("SELECT a, b -- note 'x'\n FROM t")
    assert "`x`" not in out
    out2 = rewrite("SELECT a /* alias 'y' */ , b FROM t")
    assert "`y`" not in out2


def test_timediff(spark, tmp_path):
    """r12: timediff(A, B) — SQLite 3.43, absent from the bundled
    sqlite3, so pinned two ways: hand-computed doc-style examples, and
    the defining round-trip property datetime(B, +components) == A
    verified through our datetime() modifiers (which ARE differentially
    pinned against sqlite3)."""
    import random

    import filesql_spark as fs

    (tmp_path / "one.csv").write_text("id\n1\n")
    eng = fs.open(str(tmp_path / "one.csv"), spark=spark)
    try:
        r = eng.query(
            "SELECT timediff('2023-02-15', '2023-01-15') AS a, "
            "timediff('2023-01-15', '2023-02-15') AS b, "
            "timediff('2024-03-03', '2024-01-31') AS c, "
            "timediff('2023-01-02 03:04:05.250', '2023-01-01') AS d, "
            "timediff('2020-06-01', '2020-06-01') AS e FROM one"
        ).collect()[0]
        assert r.a == "+0000-01-00 00:00:00.000"
        assert r.b == "-0000-01-00 00:00:00.000"
        # Jan 31 + 1 month normalizes to Mar 2; one more day reaches it
        assert r.c == "+0000-01-01 00:00:00.000"
        assert r.d == "+0000-00-01 03:04:05.250"
        assert r.e == "+0000-00-00 00:00:00.000"

        # round-trip property over a random corpus (whole seconds)
        rng = random.Random(99)
        pairs = []
        for _ in range(12):
            y1, y2 = rng.randint(1999, 2030), rng.randint(1999, 2030)
            a = (f"{y1:04d}-{rng.randint(1,12):02d}-{rng.randint(1,28):02d}"
                 f" {rng.randint(0,23):02d}:{rng.randint(0,59):02d}:"
                 f"{rng.randint(0,59):02d}")
            b = (f"{y2:04d}-{rng.randint(1,12):02d}-{rng.randint(1,31):02d}"
                 f" {rng.randint(0,23):02d}:{rng.randint(0,59):02d}:"
                 f"{rng.randint(0,59):02d}")
            pairs.append((a, b))
        sel = ", ".join(
            f"timediff('{a}', '{b}') AS d{i}" for i, (a, b) in enumerate(pairs)
        )
        diffs = eng.query(f"SELECT {sel} FROM one").collect()[0]
        for i, (a, b) in enumerate(pairs):
            d = diffs[i]
            sign, rest = d[0], d[1:]
            ymd, hms = rest.split(" ")
            yy, mm, dd = ymd.split("-")
            hh, mi, ss = hms.split(":")
            lo = b if sign == "+" else a  # components step lo upward
            hi = a if sign == "+" else b
            mods = ", ".join(
                f"'+{int(v)} {u}'"
                for v, u in ((yy, "years"), (mm, "months"), (dd, "days"),
                             (hh, "hours"), (mi, "minutes"),
                             (float(ss), "seconds"))
            )
            got = eng.query(
                f"SELECT datetime('{lo}', {mods}) AS v FROM one"
            ).collect()[0].v
            assert got == hi, (a, b, d, got)
    finally:
        eng.close()
