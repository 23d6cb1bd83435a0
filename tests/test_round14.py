"""Round-14 regression pins: the r13 ADVICE items, differential vs
stdlib sqlite3 through the engine front door (same harness shape as
tests/test_fuzz_dialect.py's _differential)."""

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


ROWS = [(1, "x", 5), (2, "y", 9), (3, "x", 2)]
DDL = "CREATE TABLE t (a INTEGER, s TEXT, b INTEGER)"
HDR = "a,s,b"


@pytest.mark.parametrize("stmt", [
    # r13 advice (high): GROUP BY <ordinal> / <alias> must NOT trigger
    # the bare-minmax max_by rewrite on the grouping column
    "SELECT s, max(b) AS m FROM t GROUP BY 1 ORDER BY s",
    "SELECT s AS k, max(b) AS m FROM t GROUP BY k ORDER BY k",
    "SELECT s, max(b) AS m FROM t GROUP BY s ORDER BY s",
    # but a genuinely bare column still pairs via max_by/min_by
    "SELECT a, max(b) AS m FROM t",
    "SELECT a, min(b) AS m FROM t",
    # r13 advice (low): DISTINCT arg — no-op for min/max, stripped for
    # the max_by pairing instead of emitting unparseable SQL
    "SELECT a, max(DISTINCT b) AS m FROM t",
    "SELECT a, min(DISTINCT b) AS m FROM t",
])
def test_bare_minmax_group_by_forms(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, ROWS, DDL, HDR)


@pytest.mark.parametrize("stmt", [
    # r13 advice (medium): junk text coerces to 0 (false) under
    # truthiness, so WHERE NOT s KEEPS 'abc' rows; '12abc' stays truthy
    # (prefix parse); SQL NULL stays NULL (row dropped either way)
    "SELECT id FROM t WHERE NOT s ORDER BY id",
    "SELECT id FROM t WHERE s ORDER BY id",
    "SELECT id, CASE WHEN s THEN 'T' ELSE 'F' END AS f FROM t ORDER BY id",
    "SELECT id, CASE WHEN NOT s THEN 'T' ELSE 'F' END AS f "
    "FROM t ORDER BY id",
    "SELECT id FROM t WHERE s OR id = 3 ORDER BY id",
])
def test_truthiness_junk_text(spark, tmp_path, stmt):
    rows = [(1, "abc"), (2, "12abc"), (3, None), (4, "0"), (5, "3.5")]
    _diff(spark, tmp_path, stmt, rows,
          "CREATE TABLE t (id INTEGER, s TEXT)", "id,s")


@pytest.mark.parametrize("stmt", [
    # r13 advice (low): comma LIMIT with negative limit = no limit
    "SELECT a FROM t ORDER BY a LIMIT 1, -1",
    "SELECT a FROM t ORDER BY a LIMIT 0, -5",
    "SELECT a FROM t ORDER BY a LIMIT 1, 2",
])
def test_comma_limit_negative(spark, tmp_path, stmt):
    _diff(spark, tmp_path, stmt, ROWS, DDL, HDR)


def test_auto_modifier_julian_boundary(spark, tmp_path):
    # r13 advice (low): date.c uses r >= 0 && r < 5373484.5 — exactly
    # 5373484.5 is epoch seconds, just below is a julian day
    rows = [(1, 5373484.5), (2, 5373484.4999), (3, 2440587.5),
            (4, 1000000000.0)]
    _diff(
        spark, tmp_path,
        "SELECT id, datetime(v, 'auto') AS d FROM t ORDER BY id",
        rows, "CREATE TABLE t (id INTEGER, v REAL)", "id,v",
    )


# ---------------------------------------------- r14 stretch: Bloom prune


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def _exchange_keys(df):
    import re as _re

    return sorted(
        m.group(1)
        for m in _re.finditer(r"hashpartitioning\((\w+)", _formatted(df))
    )


def test_dup_spans_bloom_prune_same_results_and_mapside(spark):
    """VERDICT r13 #8: pass 3's flagged-position join prunes through the
    broadcast Bloom filter when ``bloom_n`` is given. Results must be
    IDENTICAL (the exact join discards Bloom false positives), and the
    prune must add NO data shuffle — the only new exchanges are the
    kilobyte word-table builds of the Bloom itself."""
    import random

    from filesql_spark.pipeline.text import dup_spans, dup_spans_bytes

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rng = random.Random(7)
    shared = " ".join(rng.choice(vocab) for _ in range(8))
    docs = []
    for i in range(10):
        words = [rng.choice(vocab) for _ in range(rng.randrange(6, 18))]
        if i % 3 == 0:
            pos = rng.randrange(0, len(words) + 1)
            words[pos:pos] = shared.split()
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # plan assertions FIRST, on un-executed frames: after an action AQE
    # finalizes the adaptive plan and the exchange shapes differ
    import re as _re

    plain = dup_spans(df, n=5)
    bloomed = dup_spans(df, n=5, bloom_n=64)
    plan = _formatted(bloomed)
    assert "shiftleft" in plan
    assert len(_re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2
    extra = list(_exchange_keys(bloomed))
    for k in _exchange_keys(plain):
        extra.remove(k)
    assert extra and all(k.startswith(("word", "__w")) for k in extra), extra

    plain_b = dup_spans_bytes(df, min_len=20)
    bloom_b = dup_spans_bytes(df, min_len=20, bloom_n=64)
    extra_b = list(_exchange_keys(bloom_b))
    for k in _exchange_keys(plain_b):
        extra_b.remove(k)
    assert extra_b and all(k.startswith(("word", "__w")) for k in extra_b)

    rows = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
    assert rows(plain) == rows(bloomed)
    assert len(rows(plain)) > 0  # the planted span is found
    assert rows(plain_b) == rows(bloom_b)
    assert len(rows(plain_b)) > 0
