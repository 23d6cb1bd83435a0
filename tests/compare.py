"""DuckDB-oracle differential harness — mimics the driver's t2 check.

For a (spark DataFrame, oracle SQL) pair: run both, sort columns by name,
sort rows, and compare row count + schema family + values. Mirrors the
driver's order-insensitive value-hash so local green ⇒ driver green.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from filesql_spark.queries import TABLES

_TYPE_FAMILY = {
    "int8": "int",
    "int16": "int",
    "int32": "int",
    "int64": "int",
    "uint64": "int",
    "Int32": "int",
    "Int64": "int",
    "float32": "float",
    "float64": "float",
    "bool": "bool",
    "boolean": "bool",
    "object": "str",
    "string": "str",
}


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _family(dtype: Any) -> str:
    name = str(dtype)
    if name.startswith("datetime64"):
        return "ts"
    return _TYPE_FAMILY.get(name, name)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _values_equal(a: Any, b: Any) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty ⇒ match)."""
    got = spark_df.toPandas()
    want = con.execute(oracle_sql).df()

    problems: list[str] = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns differ: spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} duckdb={len(want)}")
        return problems

    got, want = _canon(got), _canon(want)
    for c in got.columns:
        fg, fw = _family(got[c].dtype), _family(want[c].dtype)
        if fg != fw:
            problems.append(f"column {c}: dtype family differs spark={fg} duckdb={fw}")

    for c in got.columns:
        ga, wa = got[c].tolist(), want[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {c}: {len(bad)}/{len(ga)} values differ; first at row {i}: "
                f"spark={x!r} duckdb={y!r}"
            )
    return problems
