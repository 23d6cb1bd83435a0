"""Composed cleaning pipeline — the operators working together, the way a
training-data pipeline actually runs them:

    length/quality gate → exact dedup → MinHash near-dedup → kept corpus

Each stage is one of the standalone operators; composition stays lazy, so
Catalyst plans the whole chain as one DAG (the quality gate pushes into
the scan that feeds shingling — filtered docs are never shingled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filesql_spark.pipeline.dedup import dedup_exact, minhash_lsh_pairs


def clean_corpus(
    df: DataFrame,
    min_tokens: int = 10,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Return the kept documents after the three-stage clean.

    Near-dup handling keeps the lower doc_id of each pair (drop doc_b),
    mirroring the exact-dedup keep-min convention.
    """
    gated = df.filter(F.size(F.split(F.col("text"), " ")) >= min_tokens)

    exact = dedup_exact(gated)
    exact_kept = gated.join(
        exact.filter(F.col("is_duplicate") == 0).select("doc_id"), "doc_id"
    )

    near_drop = (
        minhash_lsh_pairs(exact_kept, jaccard_threshold=jaccard_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return exact_kept.join(near_drop, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )
