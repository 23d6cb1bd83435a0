"""Round-16 regression pins: the r15 ADVICE items (trailing-COLLATE
operand-continuation regression, NOT stop-words for ORDER BY
modifiers, bool-operand triggers for the range-affinity gate) plus
the collate-inert truthiness trim — differential vs stdlib sqlite3
through the engine front door where SQLite semantics apply."""

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


# ------- r15 advice (medium): COLLATE followed by a tighter operator
# must NOT be consumed by the comparison-affinity site — COLLATE binds
# tighter than || and arithmetic (`s = n COLLATE NOCASE || 'y'` is
# `s = ((n COLLATE NOCASE) || 'y')`). The site now declines (native
# path: loud analysis error on a numeric operand, never the silently
# spliced compare of the regression).

def test_collate_continuation_declines_to_native():
    from filesql_spark.dialect import rewrite

    ct = {"s": "text", "n": "int"}
    for op in ("|| 'y'", "+ 1", "* 2", "- 3", "% 2", "& 1", "<< 1"):
        out = rewrite(f"SELECT s = n COLLATE NOCASE {op} AS r FROM t", ct)
        # the spliced rowwise compare must not appear with the
        # operator glued onto its boolean result
        assert "TRY_CAST((s) AS DOUBLE)" not in out, (op, out)


def test_collate_trailing_still_consumed_when_operand_ends(
    spark, tmp_path
):
    # no continuation: the r15 consume path stays (numeric compare,
    # collation inert)
    rows = [(1, "5y", 5), (2, "5", 5)]
    _diff(
        spark, tmp_path,
        "SELECT id, s = n COLLATE NOCASE AS r FROM t ORDER BY id",
        rows, "CREATE TABLE t (id INTEGER, s TEXT, n INTEGER)", "id,s,n",
    )


# ------- r15 advice (low): ORDER BY modifiers end the bare-NOT operand

@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t ORDER BY NOT s DESC, id",
    "SELECT id FROM t ORDER BY NOT s ASC, id",
    "SELECT id FROM t ORDER BY NOT s NULLS LAST, id",
    "SELECT id FROM t ORDER BY NOT s COLLATE NOCASE, id",
])
def test_not_operand_stops_at_order_modifiers(spark, tmp_path, stmt):
    rows = [(1, "5y"), (2, "abc"), (3, "3"), (4, "0")]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, s TEXT)", "id,s")


# ------- collate-inert truthiness: COLLATE on a truthiness operand is
# trimmed (it never changes the value and breaks the prefix-parse's
# typeof() guard — Spark's typeof of a collated string is not 'string')

@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t WHERE s COLLATE NOCASE ORDER BY id",
    "SELECT id FROM t WHERE NOT s COLLATE NOCASE ORDER BY id",
    "SELECT id, CASE WHEN s COLLATE NOCASE THEN 1 ELSE 0 END AS c "
    "FROM t ORDER BY id",
    "SELECT id, CASE WHEN s COLLATE NOCASE AND id THEN 1 ELSE 0 END AS c "
    "FROM t ORDER BY id",
])
def test_truthiness_trims_inert_collate(spark, tmp_path, stmt):
    rows = [(1, "5y"), (2, "abc"), (3, "3"), (4, "0")]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, s TEXT)", "id,s")


# ------- r15 advice (low): bool operands reach the range-affinity pass
# even with no TEXT column / quote in the SQL (the compare-pass gate's
# r15 triggers, now shared via _affinity_triggers)

# ------- VERDICT r15 #4: EXISTS glued into arithmetic/bitwise/concat
# chains evaluates to INTEGER 0/1 (coerced via TRY_CAST AS INT before
# the truthiness/affinity passes)

@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t WHERE 1 + EXISTS(SELECT 1) = s ORDER BY id",
    "SELECT id FROM t WHERE s = 1 + EXISTS(SELECT 1) ORDER BY id",
    "SELECT id, 1 + EXISTS(SELECT 1) * n AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE n - EXISTS(SELECT 1 WHERE 0) = 2 "
    "ORDER BY id",
    "SELECT id FROM t WHERE EXISTS(SELECT 1) + 1 = n ORDER BY id",
    "SELECT id, EXISTS(SELECT 1) || 'x' AS v FROM t ORDER BY id",
    "SELECT id, -EXISTS(SELECT 1) AS v FROM t ORDER BY id",
    "SELECT id, ~EXISTS(SELECT 1) AS v FROM t ORDER BY id",
    "SELECT id, EXISTS(SELECT 1) << 2 AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE 1 + EXISTS(SELECT 1) ORDER BY id",
    "SELECT id FROM t WHERE n = EXISTS(SELECT 1) + EXISTS(SELECT 2) "
    "ORDER BY id",
    # predicate-position EXISTS stays native boolean
    "SELECT id FROM t WHERE EXISTS(SELECT 1) ORDER BY id",
    "SELECT id FROM t WHERE NOT EXISTS(SELECT 1) ORDER BY id",
])
def test_exists_in_arithmetic_chain(spark, tmp_path, stmt):
    rows = [(1, "2", 5), (2, "abc", 0), (3, "2x", 2), (4, "0", 1)]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, s TEXT, n INTEGER)", "id,s,n")


# ------- VERDICT r15 #5: value-context NOT inside function arguments
# yields SQLite's 0/1/NULL INTEGER (TRY_CAST of the boolean wrap)

@pytest.mark.parametrize("stmt", [
    "SELECT id, abs(NOT s) AS v FROM t ORDER BY id",
    "SELECT id, abs(NOT n) AS v FROM t ORDER BY id",
    "SELECT id, max(NOT s, 0) AS v FROM t ORDER BY id",
    "SELECT id, min(5, NOT s) AS v FROM t ORDER BY id",
    "SELECT id, coalesce(NOT s, 9) AS v FROM t ORDER BY id",
    "SELECT id, abs(NOT s = 1) AS v FROM t ORDER BY id",
    "SELECT id, iif(NOT s, 'a', 'b') AS v FROM t ORDER BY id",
    "SELECT id, length(NOT s) AS v FROM t ORDER BY id",
    "SELECT id, abs(NOT s COLLATE NOCASE) AS v FROM t ORDER BY id",
    "SELECT id, abs(NOT s + 1) AS v FROM t ORDER BY id",
    "SELECT id, nullif(NOT s, 0) AS v FROM t ORDER BY id",
    "SELECT id, abs(NOT NOT s) AS v FROM t ORDER BY id",
    "SELECT id, abs(NOT NULL) AS v FROM t ORDER BY id",
    "SELECT id, coalesce(NOT NULL, 3) AS v FROM t ORDER BY id",
    "SELECT id FROM t WHERE abs(NOT s) = 1 ORDER BY id",
    "SELECT id, iif(n, NOT s, 7) AS v FROM t ORDER BY id",
])
def test_not_in_function_arguments(spark, tmp_path, stmt):
    rows = [(1, "2", 5), (2, "abc", 0), (3, "2x", 2), (4, "0", 1)]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, s TEXT, n INTEGER)", "id,s,n")


# ------- SQLite postfix null tests: expr NOTNULL / ISNULL / NOT NULL

@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t WHERE s NOTNULL ORDER BY id",
    "SELECT id FROM t WHERE s ISNULL ORDER BY id",
    "SELECT id FROM t WHERE s NOT NULL ORDER BY id",
    "SELECT id FROM t WHERE (s) NOT NULL ORDER BY id",
    "SELECT id FROM t WHERE s IS NOT NULL ORDER BY id",
    "SELECT id FROM t WHERE s NOTNULL AND id NOT NULL ORDER BY id",
    "SELECT id, CASE WHEN s NOT NULL THEN 1 ELSE 0 END AS c "
    "FROM t ORDER BY id",
    "SELECT id FROM t WHERE coalesce(s, '1') NOT NULL ORDER BY id",
    # prefix NOT over the NULL literal is NOT the postfix test
    "SELECT id FROM t WHERE NOT NULL ORDER BY id",
])
def test_postfix_null_tests(spark, tmp_path, stmt):
    rows = [(1, "2"), (2, None), (3, "0")]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, s TEXT)", "id,s")


@pytest.mark.parametrize("stmt", [
    "SELECT id FROM t WHERE true IN (n, 2) ORDER BY id",
    "SELECT id FROM t WHERE false IN (n, 2) ORDER BY id",
    "SELECT id FROM t WHERE (n = 1) IN (0, 2) ORDER BY id",
    "SELECT id FROM t WHERE (n > 1) IN (1, 2) ORDER BY id",
    "SELECT id FROM t WHERE (n = 1) NOT IN (0, 2) ORDER BY id",
    "SELECT id FROM t WHERE (n = 1) IN (0, NULL) ORDER BY id",
    "SELECT id FROM t WHERE EXISTS(SELECT 1) IN (n, 9) ORDER BY id",
    "SELECT id FROM t WHERE true BETWEEN n AND 2 ORDER BY id",
    "SELECT id FROM t WHERE n BETWEEN false AND true ORDER BY id",
    "SELECT id FROM t WHERE (n > 1) BETWEEN 0 AND 0 ORDER BY id",
    "SELECT id FROM t WHERE EXISTS(SELECT 1) BETWEEN n AND 2 "
    "ORDER BY id",
])
def test_bool_operand_range_affinity(spark, tmp_path, stmt):
    rows = [(1, 5), (2, 0), (3, 2), (4, 1)]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, n INTEGER)", "id,n")
