"""Query registry backing ``__spark_entry__.py``.

Every operator claimed in SURVEY.md §2 gets one named entry here: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus an ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. The driver hash-compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- every floating aggregate is rounded (sum-order across partitions differs
  between engines at the last ulp; rounding makes the hash stable);
- every LIMIT/top-k query carries a total order (unique tie-break key);
- integer SUMs are cast to BIGINT on the DuckDB side (DuckDB widens to
  HUGEINT, Spark to LongType).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _pin_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on, set defensively because the
    driver may hand us a session it built itself.

    - UTC session TZ: deterministic timestamp functions + DuckDB-oracle parity.
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS) which Spark's
      vectorized reader rejects outright; reading the raw int64 and converting
      keeps the scan columnar and JVM-side.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table (typed, columnar scan)."""
    from pyspark.sql import functions as F

    _pin_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → microsecond timestamp (floor), matching DuckDB's truncation
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@dataclass(frozen=True)
class QuerySpec:
    """One judged operator: Spark implementation + DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs a weaker rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator adding a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import the query modules (side effect: registry population)."""
    global _LOADED
    if _LOADED:
        return
    from filesql_spark.queries import pipeline_queries, relational  # noqa: F401

    _LOADED = True
