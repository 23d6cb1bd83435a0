"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k — the correctness baseline. One
  broadcast of the (small) query set against a full scan of the corpus;
  per-query top-k via window row_number (TakeOrdered-style, no global sort).
- lsh_topk: random-hyperplane LSH — the scale path. 8 fixed hyperplanes
  → 256 buckets; candidates share the query's bucket, top-k within. At
  100 TB the bucket join replaces the full cross product with a 1/256
  selectivity equi-join; recall is tunable by bands/probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from filesql_spark.pipeline.constants import HYPERPLANES
from filesql_spark.pipeline.dedup import cosine, quantize

# integer hyperplanes (×10⁴): sign tests become exact int arithmetic
HYPERPLANES_INT = [[round(w * 10_000) for w in plane] for plane in HYPERPLANES]


def _bucket(vec: Column) -> Column:
    """Sign pattern against the fixed hyperplanes → bucket id [0, 256).

    Quantized vector × integer plane coefficients — the sign test is exact,
    so bucket assignment is bit-identical in the DuckDB oracle.
    """
    qv = quantize(vec)
    b = F.lit(0)
    for i, plane in enumerate(HYPERPLANES_INT):
        dot = F.aggregate(
            F.zip_with(
                qv,
                F.array(*[F.lit(w).cast("long") for w in plane]),
                lambda x, w: x * w,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        b = b + F.when(dot > 0, F.lit(2**i)).otherwise(F.lit(0))
    return b


def brute_force_topk(
    df: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` is small → broadcast; corpus side streams once. Ties broken
    by vec_id for determinism.
    """
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cos = cosine(F.col("q_vec"), F.col("embedding"))
    scored = (
        F.broadcast(q)
        .join(df, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


def lsh_topk(df: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Bucketed approximate top-k: candidates share the query's LSH bucket."""
    corpus = df.select("vec_id", "embedding", _bucket(F.col("embedding")).alias("bucket"))
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        _bucket(F.col("embedding")).alias("q_bucket"),
    )
    cos = cosine(F.col("q_vec"), F.col("embedding"))
    scored = (
        F.broadcast(q)
        .join(
            corpus,
            (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )
