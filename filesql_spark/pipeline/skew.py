"""Skew-mitigation operators: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one viral document, one bot user) can
hold an entire stage hostage: every row of the hot key lands on one
reducer. Spark's AQE skew-join splits oversized sort-merge partitions
automatically, but only for joins it plans as sort-merge and only at
partition granularity. Salting is the deterministic, plan-independent
fallback: spread each hot key over ``n_salt`` sub-keys, replicate the
other side per sub-key, and the hottest reducer shrinks by n_salt×.

Results are provably identical to the unsalted plan (the salt is a join-
/group-key refinement that the final merge removes), so the DuckDB
oracles are the plain join/aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, possibly skewed) side salted.

    Each left row gets a deterministic salt in [0, n_salt) hashed from
    its full row content (xxhash64 — any spray yields the same join
    result; content-hashing keeps re-runs bit-identical). The right side
    is replicated n_salt times via a map-side ``explode(sequence(...))``
    — use this when the right side is too big to broadcast but small
    enough that n_salt copies are cheaper than a stuck reducer. The join
    key becomes (key, salt), so a hot left key spreads over n_salt
    reducers.

    Output: the joined frame without the salt column — column-for-column
    what ``left.join(right, left_key == right_key, how)`` returns.
    """
    if how != "inner":
        raise ValueError("salted_join supports inner joins (skew pattern)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    salted_l = left.withColumn("__fsql_salt", salt)
    # generators can't be nested in expressions (no .cast around explode);
    # long-typed sequence bounds make the salt types match directly
    rep_r = right.withColumn(
        "__fsql_salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long"))
        ),
    )
    cond = (F.col(f"l.{left_key}") == F.col(f"r.{right_key}")) & (
        F.col("l.__fsql_salt") == F.col("r.__fsql_salt")
    )
    return (
        salted_l.alias("l")
        .join(rep_r.alias("r"), cond, "inner")
        .drop("__fsql_salt")
    )


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column] | None = None,
    n_salt: int = 32,
) -> DataFrame:
    """Count + sums per key via an explicit two-phase (salted) aggregation.

    Phase 1 aggregates on (keys, salt) — a hot key's rows split across
    n_salt groups on n_salt reducers; phase 2 merges the n_salt partials
    per key (tiny input: n_salt × |keys| rows). For plain count/sum
    Spark's partial HashAggregate usually makes this unnecessary; the
    explicit form is for aggregation pipelines where the partial can't
    combine enough (e.g. high-cardinality intermediate maps) or where a
    deterministic two-stage shape is wanted for checkpointing. All sums
    here must be decomposable (count/sum/min/max).

    Output: keys + ``n`` + one column per ``sum_cols`` entry. Exact
    integer sums merge associatively, so the result is bit-identical to
    the one-shot groupBy — the oracle runs the plain GROUP BY.
    """
    sum_cols = sum_cols or {}
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    phase1 = (
        df.withColumn("__fsql_salt", salt)
        .groupBy(*keys, "__fsql_salt")
        .agg(
            F.count("*").alias("__n"),
            *[F.sum(c).alias(f"__s_{name}") for name, c in sum_cols.items()],
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__s_{name}").alias(name) for name in sum_cols],
    )


def key_skew_report(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Shuffle-key skew diagnostic: the ``top`` heaviest values of
    ``key_col`` with count, integer-ppm share of all rows, and the
    cumulative share of the top-k so far — the report you run BEFORE
    choosing a join/aggregation key at 100 TB, to decide whether the key
    needs salting (``salted_join``) or AQE skew handling. A top key
    holding >~5% of rows (50 000 ppm) is a stuck-reducer risk.

    100-TB design: one map-side-combined groupBy produces the per-key
    counts; the grand total is an aggregate OF those counts (cardinality
    ≈ distinct keys, not rows) broadcast back; the top-k is a
    TakeOrderedAndProject, never a global sort; and the cumulative sum
    runs over only the k surviving rows (a single tiny task by
    construction — k rows, not a data-sized window). Shares are exact
    integer ppm (c·10⁶ div total) so ranking and hashing are
    engine-stable; ties break on the key value.
    """
    from pyspark.sql import Window

    # persisted: both the grand total and the top-k read this relation —
    # uncached, each branch would re-scan and re-aggregate the raw table
    # (2× the only data-sized work in the operator)
    from filesql_spark.pipeline._persist import swap_persist

    counts = swap_persist(
        "skew.counts", df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = counts.agg(F.sum("n_rows").alias("__total"))
    topk = (
        counts.join(F.broadcast(total))
        .select(
            key_col,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.expr("(n_rows * 1000000) div __total").alias("share_ppm"),
        )
        .orderBy(F.col("n_rows").desc(), key_col)
        .limit(top)
    )
    w = Window.orderBy(F.col("n_rows").desc(), key_col)
    return topk.select(
        F.row_number().over(w).cast("int").alias("rank"),
        key_col,
        "n_rows",
        "share_ppm",
        F.sum("share_ppm").over(w).cast("long").alias("cum_ppm"),
    )
