"""Round-17 regression pins: CAST-to-TEXT-affinity operands in
arithmetic (the r16 `n % CAST(x AS TEXT)` loud residue), NaN-vs-NULL
out-of-domain math (silent divergence found r17), and TEXT-operand
coercion for the SQLite math-function family — differential vs stdlib
sqlite3 through the engine front door.

Reference provenance: the reference delegates all of this to SQLite's
C core (filesql is a Go loader over modernc.org/sqlite — doc.go:68-77);
the pinned semantics are func.c's (sqlite3_value_double prefix parse
for abs/round, sqlite3_value_numeric_type strict parse for the 3.35
math functions, NULL for out-of-domain results)."""

from __future__ import annotations

import os
import sqlite3
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import filesql_spark as fs  # noqa: E402


def _diff(spark, tmp_path, stmt, rows, ddl, header, name="t"):
    con = sqlite3.connect(":memory:")
    con.execute(ddl)
    ph = ",".join("?" * len(rows[0]))
    con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
    expected = con.execute(stmt).fetchall()
    con.close()
    csv = header + "\n" + "\n".join(
        ",".join("" if v is None else str(v) for v in r) for r in rows
    )
    (tmp_path / f"{name}.csv").write_text(csv + "\n")
    eng = fs.open(str(tmp_path / f"{name}.csv"), spark=spark)
    try:
        got = [tuple(r) for r in eng.query(stmt).collect()]
    finally:
        eng.close()
    assert got == expected, (stmt, got, expected)


_ROWS = [(1, "5y", 5), (2, "5", 0), (3, "abc", 3), (4, "-2", -2),
         (6, "2e1", 20), (7, "0.5x", 1), (8, "07", 7)]
_DDL = "CREATE TABLE t (id INTEGER, s TEXT, n INTEGER)"
_HDR = "id,s,n"


# ------- r16 residue: CAST to a TEXT-affinity target used as an
# arithmetic operand — the static tracker now types it 'text', so the
# value-dependent pass applies SQLite's numeric-prefix coercion and the
# %-site zero guard (10 % '0' is NULL, not REMAINDER_BY_ZERO)

@pytest.mark.parametrize("stmt", [
    "SELECT id, n % CAST(s AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, n % CAST('abc' AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, id % CAST(n AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, n / CAST(s AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, CAST(s AS TEXT) * 2 AS v FROM t ORDER BY id",
    "SELECT id, CAST(s AS TEXT) + 1 AS v FROM t ORDER BY id",
    "SELECT id, n + CAST(s AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, CAST(s AS TEXT) % 3 AS v FROM t ORDER BY id",
    "SELECT id, 5 % CAST(s AS TEXT) AS v FROM t ORDER BY id",
])
def test_cast_text_arithmetic_operand(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS, _DDL, _HDR)


# ------- CAST-to-TEXT affinity in comparison contexts: the 'text'
# classification must agree with the affinity passes (CAST carries the
# target's affinity — sqlite3ExprAffinity)

@pytest.mark.parametrize("stmt", [
    "SELECT id, CAST(s AS TEXT) = n AS v FROM t ORDER BY id",
    "SELECT id, n = CAST(s AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, CAST(n AS TEXT) = s AS v FROM t ORDER BY id",
    "SELECT id, CAST(n AS TEXT) = n AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE CAST(s AS TEXT) > n ORDER BY id",
    "SELECT id FROM t WHERE CAST(s AS TEXT) BETWEEN 1 AND 6 ORDER BY id",
    "SELECT id FROM t WHERE CAST(s AS TEXT) IN (5, '5') ORDER BY id",
    "SELECT id FROM t ORDER BY CAST(s AS TEXT) = n, id",
    "SELECT id, CAST(CAST(n AS TEXT) AS INTEGER) AS v FROM t ORDER BY id",
])
def test_cast_text_comparison_affinity(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS, _DDL, _HDR)


# ------- silent-divergence fix (r17 find): Spark's sqrt/asin/acos/
# acosh/atanh/pow return NaN out of domain; SQLite returns NULL (its
# math functions return NULL whenever the C result is NaN)

@pytest.mark.parametrize("stmt", [
    "SELECT id, sqrt(n) AS v FROM t ORDER BY id",
    "SELECT id, asin(n) AS v FROM t ORDER BY id",
    "SELECT id, acos(n) AS v FROM t ORDER BY id",
    "SELECT id, acosh(n) AS v FROM t ORDER BY id",
    "SELECT id, atanh(n) AS v FROM t ORDER BY id",
    "SELECT id, pow(n, 0.5) AS v FROM t ORDER BY id",
    "SELECT id, power(n, 0.5) AS v FROM t ORDER BY id",
    "SELECT id, sqrt(n) + 1 AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE sqrt(n) IS NULL ORDER BY id",
    "SELECT id, coalesce(sqrt(n), -99) AS v FROM t ORDER BY id",
])
def test_out_of_domain_math_is_null(spark, tmp_path, stmt):
    rows = [(1, "x", -2), (2, "x", 2), (3, "x", 0), (4, "x", -1)]
    _diff(spark, tmp_path, stmt, rows, _DDL, _HDR)


# ------- TEXT operands of the math-function family: the 3.35 math
# functions strict-parse text (junk → NULL), abs prefix-parses
# (junk → 0.0)

@pytest.mark.parametrize("stmt", [
    "SELECT id, abs(s) AS v FROM t ORDER BY id",
    "SELECT id, abs(CAST(s AS TEXT)) AS v FROM t ORDER BY id",
    "SELECT id, sign(s) AS v FROM t ORDER BY id",
    "SELECT id, ceil(s) AS v FROM t ORDER BY id",
    "SELECT id, floor(s) AS v FROM t ORDER BY id",
    "SELECT id, sqrt(s) AS v FROM t ORDER BY id",
    "SELECT id, exp(s) AS v FROM t ORDER BY id",
    "SELECT id, ln(s) AS v FROM t ORDER BY id",
    "SELECT id, pow(s, 2) AS v FROM t ORDER BY id",
    "SELECT id, pow(2, s) AS v FROM t ORDER BY id",
    "SELECT id, sin(s) AS v FROM t ORDER BY id",
    "SELECT id, degrees(s) AS v FROM t ORDER BY id",
    "SELECT id, round(trim(s)) AS v FROM t ORDER BY id",
])
def test_math_function_text_operand(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS, _DDL, _HDR)


# ------- length-less CHAR-family CAST targets (TEXT affinity in
# SQLite; Spark has no bare CHAR spelling) and affinity-stripped +CAST
# comparison operands (unary + removes the CAST's affinity — storage
# compare, number < text)

@pytest.mark.parametrize("stmt", [
    "SELECT id, CAST(s AS CHAR) = n AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE CAST(s AS CHAR) = n ORDER BY id",
    "SELECT id, CAST(n AS VARCHAR) AS v FROM t ORDER BY id",
    "SELECT id, CAST(s AS CLOB) + 0 AS v FROM t ORDER BY id",
    "SELECT id, +CAST(s AS TEXT) = 5 AS v FROM t ORDER BY id",
    "SELECT id FROM t ORDER BY +CAST(s AS TEXT) = 5, id",
])
def test_bare_char_cast_and_plus_cast(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS, _DDL, _HDR)


# ------- unary minus over COMPOUND text operands (calls, CAST, paren
# groups): the unary-repl site now accepts any deterministic compound
# operand, same gate as binary TEXT-coercion arithmetic (r16's
# _vd_compound_operand)

@pytest.mark.parametrize("stmt", [
    "SELECT id, -upper(s) AS v FROM t ORDER BY id",
    "SELECT id, -trim(s) AS v FROM t ORDER BY id",
    "SELECT id, -CAST(s AS TEXT) AS v FROM t ORDER BY id",
    "SELECT id, -(s || '') AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE -CAST(s AS TEXT) ORDER BY id",
    "SELECT id FROM t ORDER BY -CAST(s AS TEXT), id",
    "SELECT id, -lower(s) * 2 AS v FROM t ORDER BY id",
])
def test_unary_minus_compound_text_operand(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS, _DDL, _HDR)


# ------- concat-inside-arithmetic-inside-comparison (the r16 residue):
# || binds tighter than + - * / %, so `n + 1 || '2' = s` is an
# arithmetic chain over a concat operand — a numeric VALUE with no
# affinity; the TEXT-affinity column side renders it per the runtime
# int/real flavor (the _cmp_chain_render dispatch)

_ROWS4 = [(1, "5y", 5, 2), (2, "5", 0, 3), (3, "abc", 7, -1),
          (4, "-2", -2, 4), (6, "2e1", 20, 5), (7, "0.5x", 1, 2),
          (8, "07", 3, 0), (9, "17", 4, 2)]
_DDL4 = "CREATE TABLE t (id INTEGER, s TEXT, n INTEGER, m INTEGER)"
_HDR4 = "id,s,n,m"


@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t WHERE n + 1 || '2' = s ORDER BY id",
    "SELECT id FROM t WHERE s = n + 1 || '2' ORDER BY id",
    "SELECT id FROM t WHERE n + 1 || '2' > s ORDER BY id",
    "SELECT id FROM t WHERE n - s || 'x' = 3 ORDER BY id",
    "SELECT id FROM t WHERE n + 1 || '2e1' = s ORDER BY id",
    "SELECT id FROM t WHERE s = n * (1 || '0') ORDER BY id",
    "SELECT id FROM t WHERE n - s = s ORDER BY id",
    "SELECT id FROM t WHERE coalesce(n,0) BETWEEN n+4-1 || '2e1' AND +''"
    " ORDER BY id",
    "SELECT id FROM t WHERE 4.5 + s = s ORDER BY id",
])
def test_concat_in_arithmetic_comparison(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS4, _DDL4, _HDR4)


# ------- mid-chain text operands in VALUE context: text operands past
# the second chain position (`n + 4 - s`), right-side multiplicative
# chains (`s + 1 / 2`), and chained division off an emission
# (`s / 2 * 3 / 4`, `ifnull(n,2.5) * 2 / 4` — both SILENTLY
# float-divided where SQLite DIVs the int flavor, r17 finds)

@pytest.mark.parametrize("stmt", [
    "SELECT id, n + 4 - s AS v FROM t ORDER BY id",
    "SELECT id, n + 4 - (1 || '2') AS v FROM t ORDER BY id",
    "SELECT id, 1 + 2 + s AS v FROM t ORDER BY id",
    "SELECT id, n * m + s AS v FROM t ORDER BY id",
    "SELECT id, n * 2 + m * s AS v FROM t ORDER BY id",
    "SELECT id, s + 1 / 2 AS v FROM t ORDER BY id",
    "SELECT id, s + n / m AS v FROM t ORDER BY id",
    "SELECT id, s - 3 * 2 / 4 AS v FROM t ORDER BY id",
    "SELECT id, upper(s) + 1 / 2 AS v FROM t ORDER BY id",
    "SELECT id, s / 2 * 3 / 4 AS v FROM t ORDER BY id",
    "SELECT id, s * 2 / 4 % 3 AS v FROM t ORDER BY id",
    "SELECT id, ifnull(n, 2.5) * 2 / 4 AS v FROM t ORDER BY id",
    "SELECT id, ifnull(n, 2.5) / 2 * 3 / 4 AS v FROM t ORDER BY id",
    "SELECT id, ifnull(n, 2.5) * m / 2 AS v FROM t ORDER BY id",
    "SELECT id, -s * 2 / 4 AS v FROM t ORDER BY id",
    "SELECT id, -upper(s) * 2 / 4 AS v FROM t ORDER BY id",
    "SELECT id, -(s || 'x') * 2 % 4 AS v FROM t ORDER BY id",
    "SELECT id, 4.5 + s * 2 AS v FROM t ORDER BY id",
])
def test_mid_chain_text_operands(spark, tmp_path, stmt):
    # int-vs-float rendering: SQLite types the int flavor INTEGER where
    # the engine's dispatch CASE is statically DOUBLE — compare values
    con = sqlite3.connect(":memory:")
    con.execute(_DDL4)
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", _ROWS4)
    expected = con.execute(stmt).fetchall()
    con.close()
    csv = _HDR4 + "\n" + "\n".join(
        ",".join(str(v) for v in r) for r in _ROWS4
    )
    (tmp_path / "t.csv").write_text(csv + "\n")
    eng = fs.open(str(tmp_path / "t.csv"), spark=spark)
    try:
        got = [tuple(r) for r in eng.query(stmt).collect()]
    finally:
        eng.close()

    def norm(rs):
        return [
            tuple(float(v) if isinstance(v, (int, float)) else v
                  for v in r)
            for r in rs
        ]
    assert norm(got) == norm(expected), (stmt, got, expected)


# ------- aggregate typing in comparisons (SILENT r17 find): sum(s)
# over TEXT classified 'text' in the static tracker, so a HAVING/WHERE
# comparison against it took the WRONG type-order constant (always
# true); SQLite aggregates return numbers. total(X) OVER needs the
# coalesce wrapped AROUND the windowed sum.

@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t GROUP BY id HAVING sum(s) > 10 ORDER BY id",
    "SELECT m, count(*) AS c FROM t GROUP BY m HAVING sum(s) > 5"
    " ORDER BY m",
    "SELECT id FROM t WHERE abs(s) > 4 ORDER BY id",
    "SELECT id FROM t WHERE ceil(s) >= 5 ORDER BY id",
    "SELECT id, sum(s) OVER (ORDER BY id) AS v FROM t ORDER BY id",
    "SELECT id, total(s) OVER (ORDER BY id) AS v FROM t ORDER BY id",
    "SELECT id, total(n) OVER (PARTITION BY m) AS v FROM t ORDER BY id",
    "SELECT id, total(s) AS v FROM t GROUP BY id ORDER BY id",
])
def test_aggregate_text_typing_and_total_over(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, _ROWS4, _DDL4, _HDR4)


def test_log10_text_operand_ulp_tolerance(spark, tmp_path):
    """log10/asinh differ from sqlite3 at the last ULP (SQLite derives
    them from ln; Java's are correctly rounded — a libm difference, not
    a semantics one). Pin NULL-ness exactly and values to 1e-12."""
    stmt = "SELECT id, log10(s) AS v FROM t ORDER BY id"
    con = sqlite3.connect(":memory:")
    con.execute(_DDL)
    con.executemany("INSERT INTO t VALUES (?,?,?)", _ROWS)
    expected = con.execute(stmt).fetchall()
    con.close()
    csv = _HDR + "\n" + "\n".join(
        ",".join(str(v) for v in r) for r in _ROWS
    )
    (tmp_path / "t.csv").write_text(csv + "\n")
    eng = fs.open(str(tmp_path / "t.csv"), spark=spark)
    try:
        got = [tuple(r) for r in eng.query(stmt).collect()]
    finally:
        eng.close()
    assert len(got) == len(expected)
    for (gi, gv), (ei, ev) in zip(got, expected):
        assert gi == ei
        if ev is None:
            assert gv is None, (gi, gv)
        else:
            assert gv == pytest.approx(ev, abs=1e-12), (gi, gv, ev)
