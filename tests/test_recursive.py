"""WITH RECURSIVE emulation through the engine front door."""

from __future__ import annotations

import pytest

import filesql_spark as fs
from filesql_spark.errors import FilesqlError


@pytest.fixture
def eng(spark, tmp_path):
    (tmp_path / "emp.csv").write_text(
        "id,name,manager_id\n1,ceo,\n2,vp_a,1\n3,vp_b,1\n4,dir_a,2\n5,ic_a,4\n6,ic_b,4\n"
    )
    e = fs.open(str(tmp_path / "emp.csv"), spark=spark)
    yield e
    e.close()


def test_counter(eng):
    rows = eng.query(
        """
        WITH RECURSIVE cnt(x) AS (
            SELECT 1 UNION ALL SELECT x + 1 FROM cnt WHERE x < 5
        )
        SELECT x FROM cnt ORDER BY x
        """
    ).collect()
    assert [r.x for r in rows] == [1, 2, 3, 4, 5]


def test_org_hierarchy(eng):
    """Transitive closure over the manager graph — the canonical use."""
    rows = eng.query(
        """
        WITH RECURSIVE chain(id, name, depth) AS (
            SELECT id, name, 0 FROM emp WHERE manager_id IS NULL
            UNION ALL
            SELECT e.id, e.name, c.depth + 1
            FROM emp e JOIN chain c ON e.manager_id = c.id
        )
        SELECT name, depth FROM chain ORDER BY depth, name
        """
    ).collect()
    assert [(r.name, r.depth) for r in rows] == [
        ("ceo", 0),
        ("vp_a", 1),
        ("vp_b", 1),
        ("dir_a", 2),
        ("ic_a", 3),
        ("ic_b", 3),
    ]


def test_union_distinct_fixpoint(eng):
    """UNION (distinct) terminates on its own when no new rows appear."""
    rows = eng.query(
        """
        WITH RECURSIVE r(x) AS (
            SELECT 1 UNION SELECT x FROM r
        )
        SELECT x FROM r
        """
    ).collect()
    assert [r.x for r in rows] == [1]


def test_runaway_capped(eng):
    with pytest.raises(FilesqlError, match="iterations"):
        eng.query(
            """
            WITH RECURSIVE r(x) AS (
                SELECT 1 UNION ALL SELECT x + 1 FROM r
            )
            SELECT COUNT(*) AS n FROM r
            """
        )


def test_trailing_nonrecursive_ctes(eng):
    """WITH RECURSIVE a AS (...), b AS (...) SELECT — extra CTEs re-wrap as
    a plain WITH over the main query and may reference the recursive name."""
    rows = eng.query(
        """
        WITH RECURSIVE cnt(x) AS (
            SELECT 1 UNION ALL SELECT x + 1 FROM cnt WHERE x < 4
        ), doubled AS (
            SELECT x * 2 AS y FROM cnt
        )
        SELECT y FROM doubled ORDER BY y
        """
    ).collect()
    assert [r.y for r in rows] == [2, 4, 6, 8]
