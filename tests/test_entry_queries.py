"""Differential test of every registry query against its DuckDB oracle.

This is a local mirror of the driver's t2 correctness gate: every entry in
``__spark_entry__.queries()`` must hash-match its ``oracle_sql()`` twin.
"""

from __future__ import annotations

import pytest

from filesql_spark.queries import all_oracles, all_queries
from tests.compare import compare

QUERIES = all_queries()
ORACLES = all_oracles()


def test_registry_nonempty():
    assert len(QUERIES) >= 10


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    problems = compare(df, duck, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
