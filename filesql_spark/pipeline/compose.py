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


def _gate(df: DataFrame, min_tokens: int) -> DataFrame:
    return df.filter(F.size(F.split(F.col("text"), " ")) >= min_tokens)


def _exact_kept(gated: DataFrame, base: DataFrame | None = None) -> DataFrame:
    # persist the KEEP-ID list, not the doc-sized joined frame (the r7
    # measurement in pipeline_curate_full applies here too): exact_kept is
    # consumed by both the near-dup shingle path and the final anti-join,
    # and without the cache each consumer re-ran the md5 fingerprint
    # window over the gated corpus. The id list is doc_id-only (small),
    # and re-filtering the scan per consumer stays cheap; plan-keyed
    # caching dedupes repeated pipeline invocations. A/B at sf0.1:
    # clean_corpus 4.47s -> 3.74s (r17).
    #
    # ``base``: the PRE-GATE frame to re-attach the keep list to. The keep
    # ids already encode every upstream filter (keep ⊆ gated by
    # construction and doc_id is unique), so the inner join against the
    # wider base is row-identical — but it lets the optimizer prune the
    # gate's tokenize out of every consumer, and prune the text COLUMN
    # out of the scan for consumers that only need metadata (r18,
    # guide §2.3/§6: the gate predicate references text, which kept the
    # text bytes in every downstream read even when nothing used them).
    from filesql_spark.pipeline._persist import swap_persist

    keep = swap_persist(
        "compose.exact_keep",
        dedup_exact(gated).filter(F.col("is_duplicate") == 0).select("doc_id"),
    )
    return (gated if base is None else base).join(keep, "doc_id")


def _near_final(
    exact_kept: DataFrame,
    jaccard_threshold: float,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup stage; with a standing ``pairs`` table (doc_a, doc_b,
    jaccard) it serves without re-deriving signatures.

    Restricting full-corpus pairs to those with BOTH endpoints in
    ``exact_kept`` is exactly ``minhash_lsh_pairs(exact_kept)``: band-
    bucket candidacy and exact-Jaccard verification are per-pair
    properties, independent of what else is in the corpus.  The standing
    table must have been built at a threshold ≤ ``jaccard_threshold``
    (the jaccard column re-filters here)."""
    if pairs is None:
        pairs = minhash_lsh_pairs(exact_kept, jaccard_threshold=jaccard_threshold)
    else:
        ids = exact_kept.select("doc_id")
        pairs = (
            pairs.filter(F.col("jaccard") >= jaccard_threshold)
            .join(ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
            .join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        )
    near_drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return exact_kept.join(near_drop, "doc_id", "left_anti")


def _stages(
    df: DataFrame, min_tokens: int, jaccard_threshold: float
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(gated, exact_kept, final) — the three lazy stage frames."""
    gated = _gate(df, min_tokens)
    exact_kept = _exact_kept(gated, base=df)
    return gated, exact_kept, _near_final(exact_kept, jaccard_threshold)


def clean_corpus(
    df: DataFrame,
    min_tokens: int = 10,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Return the kept documents after the three-stage clean.

    Near-dup handling keeps the lower doc_id of each pair (drop doc_b),
    mirroring the exact-dedup keep-min convention.
    """
    _gated, _exact_kept, final = _stages(df, min_tokens, jaccard_threshold)
    return final.select("doc_id", "lang", "source", "n_chars")


def clean_corpus_metrics(
    df: DataFrame,
    min_tokens: int = 10,
    jaccard_threshold: float = 0.5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-stage observability for the clean: one row per pipeline stage
    with (stage_idx, stage, n_in, n_kept, n_dropped) — as a DataFrame,
    not driver-side logs, so a 100-TB run can write its funnel next to
    its output and join/alert on it downstream.

    Shape: three single-row count aggregates cross-joined (1×1×1 rows —
    the joins are trivial broadcasts), then exploded into the per-stage
    funnel. The total and gate counts come from ONE aggregation over the
    base scan (a conditional SUM of the gate predicate — counting the
    filtered frame separately would re-scan the source, VERDICT r7 #6);
    ``exact_kept`` is persisted because the remaining counts read it
    (directly or through the near-dup stage); the minhash signatures
    persist inside their own operator. Nothing collects to the driver.
    """
    from filesql_spark.pipeline._persist import swap_persist

    gated = _gate(df, min_tokens)
    exact_kept = swap_persist(
        "compose.metrics_exact_kept", _exact_kept(gated, base=df)
    )
    final = _near_final(exact_kept, jaccard_threshold, pairs=pairs)
    gate_cond = F.size(F.split(F.col("text"), " ")) >= min_tokens
    counts = (
        df.agg(
            F.count("*").alias("n_total"),
            F.sum(gate_cond.cast("long")).alias("n_gate"),
        )
        .crossJoin(exact_kept.agg(F.count("*").alias("n_exact")))
        .crossJoin(final.agg(F.count("*").alias("n_final")))
    )
    stages = F.array(
        F.struct(
            F.lit(1).alias("stage_idx"),
            F.lit("quality_gate").alias("stage"),
            F.col("n_total").alias("n_in"),
            F.col("n_gate").alias("n_kept"),
        ),
        F.struct(
            F.lit(2).alias("stage_idx"),
            F.lit("exact_dedup").alias("stage"),
            F.col("n_gate").alias("n_in"),
            F.col("n_exact").alias("n_kept"),
        ),
        F.struct(
            F.lit(3).alias("stage_idx"),
            F.lit("near_dedup").alias("stage"),
            F.col("n_exact").alias("n_in"),
            F.col("n_final").alias("n_kept"),
        ),
    )
    return (
        counts.select(F.explode(stages).alias("s"))
        .select("s.*")
        .withColumn("n_dropped", F.col("n_in") - F.col("n_kept"))
    )
