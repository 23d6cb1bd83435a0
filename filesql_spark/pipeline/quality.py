"""Data-quality expectation suite — Deequ/Great-Expectations-style
constraint checking as a DataFrame computation.

A suite is a list of named checks over one table (plus optional
referential checks against a dimension). The runner turns every
row-level check into a conditional COUNT inside ONE aggregation pass,
so a 50-check suite over 100 TB costs a single map-side-combining scan;
uniqueness checks (COUNT ≠ COUNT DISTINCT) run in a second aggregation
kept SEPARATE from the plain counts — mixing distinct and plain
aggregates forces Catalyst's Expand rewrite over every row (the
profiler lesson, BASELINE.md r7: 3.2 s → 1.7 s split) — and
referential checks are broadcast anti-join counts against the (small)
key side. All observations are exact BIGINT violation counts, so the
driver hash is trivially stable.

Output: one row per check — (check, observed, passed) where observed
is the violation count (or the row count for `min_rows`) and passed is
0/1.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind``:

    - "min_rows":   observed = COUNT(*), passed = observed >= threshold
    - "violations": observed = COUNT of rows failing ``cond`` (cond is
                    the PASS predicate), passed = observed == 0
    - "unique":     observed = COUNT(col) - COUNT(DISTINCT col),
                    passed = observed == 0
    """

    name: str
    kind: str
    cond: Column | None = None
    col: str | None = None
    threshold: int = 1


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate a suite in one pass (plus one distinct-agg pass if any
    uniqueness checks are present). Returns (check, observed, passed)."""
    plain = [c for c in checks if c.kind in ("min_rows", "violations")]
    uniq = [c for c in checks if c.kind == "unique"]
    if not checks:
        raise ValueError("run_checks requires at least one Check")

    aggs = []
    for c in plain:
        if c.kind == "min_rows":
            aggs.append(F.count(F.lit(1)).alias(c.name))
        else:
            # CASE WHEN cond THEN 0 ELSE 1: a NULL predicate result (e.g.
            # a range check over a NULL value) counts as a VIOLATION, the
            # documented semantics and the oracle's phrasing. The earlier
            # F.when(~cond, 1).otherwise(0) silently passed NULLs
            # (ADVICE r7 #1).
            aggs.append(
                F.sum(F.when(c.cond, 0).otherwise(1)).cast("long").alias(c.name)
            )
    uaggs = [
        (F.count(c.col) - F.count_distinct(F.col(c.col))).alias(c.name)
        for c in uniq
    ]
    if plain:
        out = df.agg(*aggs)
        if uniq:
            # separate aggregation: COUNT DISTINCT would force the Expand
            # rewrite over the plain counts if mixed into the same agg
            out = out.crossJoin(F.broadcast(df.agg(*uaggs)))
    else:
        # all-unique suite: df.agg() with zero expressions raises
        # (ADVICE r7 #2) — the distinct agg stands alone
        out = df.agg(*uaggs)

    rows = []
    for c in checks:
        observed = F.col(c.name).cast("long")
        passed = (
            (observed >= c.threshold) if c.kind == "min_rows" else (observed == 0)
        )
        rows.append(
            F.struct(
                F.lit(c.name).alias("check"),
                observed.alias("observed"),
                passed.cast("int").alias("passed"),
            )
        )
    return out.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.check", "r.observed", "r.passed"
    )


def referential_check(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Orphaned-foreign-key count as a (check, observed, passed) row.

    The dimension's key column broadcasts; the fact side never shuffles
    (left_anti against a broadcast is map-side at any fact size).

    NULL fact keys count as orphans (a NULL never equi-matches), which
    matches the NOT EXISTS phrasing; SQL FOREIGN KEY semantics treat
    NULL as vacuously valid — pair with a not-null check when that
    distinction matters."""
    orphans = fact.join(
        F.broadcast(dim.select(F.col(dim_key).alias(fact_key))),
        fact_key,
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).cast("long").alias("observed"),
        (F.count(F.lit(1)) == 0).cast("int").alias("passed"),
    )
