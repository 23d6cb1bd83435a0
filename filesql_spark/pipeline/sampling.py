"""Deterministic corpus splitting & sampling — pure column expressions.

Training-data pipelines need reproducible held-out splits and per-stratum
downsampling that survive re-runs, repartitioning, and cluster-size
changes. Random sampling (``df.sample``) gives none of that; hashing the
stable document key gives all of it:

    bucket(doc) = first-8-hex(md5(key)) mod 10_000

is a uniform, engine-portable value (the same md5-derived int the dedup
operators use), so split assignment is a property of the ROW, not of the
run. Zero shuffles, zero UDFs — everything stays in whole-stage codegen
and runs at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    """Uniform deterministic bucket in [0, SPLIT_BUCKETS): first 8 md5 hex
    chars of the key's string form, mod 10_000 — bit-identical in DuckDB
    (same construction as dedup's _hash32)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return h % SPLIT_BUCKETS


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
) -> DataFrame:
    """Assign each row a reproducible 'train' / 'val' / 'test' label.

    Fractions are expressed in integer bucket widths (exact: val gets
    buckets [0, val_frac·10⁴), test the next band, train the rest), so
    the split is stable under any row order or partitioning and two runs
    can never disagree. Returns the input plus (bucket, split).
    """
    val_hi = int(round(val_frac * SPLIT_BUCKETS))
    test_hi = val_hi + int(round(test_frac * SPLIT_BUCKETS))
    b = _bucket(F.col(key_col))
    split = (
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("bucket", b).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls below its stratum's fraction (in exact integer bucket
    widths). The per-language rebalancing step of a corpus pipeline —
    e.g. keep 10% of English, all of the tail languages.

    Unlike ``df.sampleBy``, re-runs and cluster changes keep the exact
    same rows, and the filter is a scan-level predicate (no shuffle, no
    RNG state).
    """
    b = _bucket(F.col(key_col))
    thresh = F.lit(int(round(default_frac * SPLIT_BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, int(round(frac * SPLIT_BUCKETS))
        ).otherwise(thresh)
    return df.filter(b < thresh)
