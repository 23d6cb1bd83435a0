"""Benchmark decontamination: flag training documents that share any
exact word-n-gram with an evaluation/benchmark document set.

This is the contamination gate every serious training-data pipeline runs
before training (the published recipe — GPT-3 appendix C, PaLM, Llama —
uses exact 13-gram overlap; n=13 is the default here). Beyond-reference:
the reference engine (nao1215/filesql) has no corpus operators at all
(SURVEY §2.A); this belongs to the LLM-pipeline family next to
``incremental_dedup``, and has the same incoming-vs-base join shape.

100-TB design:
- The benchmark side is small by construction (benchmarks are ~10⁵ docs
  against a 100-TB corpus), so its distinct n-gram hash set — grams
  hashed to 60-bit ints, ~8 bytes each instead of ~100-char strings —
  is BROADCAST, and the corpus-side probe is a map-side broadcast-hash
  join: the 100-TB side never shuffles for the match; the only shuffle
  is the final per-doc hit aggregation, which the map-side partial
  aggregation collapses to one row per contaminated doc per partition.
- If the benchmark gram set ever outgrows the broadcast budget
  (``broadcast_bench=False``), the join degrades to a plain shuffled
  equi-join on the 60-bit hash — still never all-pairs — or the Bloom
  pre-filter from ``pipeline/sketch.py`` drops clean docs before the
  join, the same audit-vs-production split documented there.
- Documents shorter than n words produce no n-gram and cannot be
  flagged (matching the published recipe, which operates on n-gram
  overlap only); run the exact-dedup ledger alongside for short docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NGRAM_DEFAULT = 13  # the published decontamination window (GPT-3 App. C)


def _hash60(col: Column) -> Column:
    """Portable 60-bit gram hash: first 15 md5 hex chars → int64 (the
    DuckDB oracle applies the identical transform, so the engines agree
    bit-for-bit, collisions included — at 2⁻⁶⁰ they are negligible at
    10⁹ grams, unlike a 32-bit hash whose birthday bound is ~2¹⁶)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ngram_hashes(
    df: DataFrame, text_col: str = "text", n: int = NGRAM_DEFAULT
) -> DataFrame:
    """(doc_id, h): one row per DISTINCT word-n-gram of each document,
    hashed to 60 bits. Docs with fewer than n words yield no rows.

    Same evaluation-shape rules as ``dedup.add_shingles``: the token
    array is materialized once and indexed with ``t[i]`` (GetArrayItem),
    and the explode sits in the same projection as the gram transform so
    the generator keeps its one-shot pruned evaluation."""
    gram = "concat(" + ", ' ', ".join(f"__fsql_t[i+{j}]" for j in range(n)) + ")"
    grams = (
        f"array_distinct(transform(sequence(0, size(__fsql_t) - {n}), i -> {gram}))"
    )
    return (
        df.repartition("doc_id")
        .withColumn("__fsql_t", F.split(F.col(text_col), " "))
        .filter(F.size("__fsql_t") >= n)
        .select("doc_id", F.explode(F.expr(grams)).alias("__g"))
        .select("doc_id", _hash60(F.col("__g")).alias("h"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = NGRAM_DEFAULT,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per contaminated training doc: (doc_id, n_shared_ngrams,
    contaminated_by) — the count of distinct n-grams it shares with ANY
    benchmark document, and the smallest benchmark doc_id sharing one
    (deterministic evidence pointer). Clean docs are absent; the caller
    anti-joins this frame to drop contaminated docs:

        clean = train.join(decontaminate(train, bench), "doc_id", "left_anti")
    """
    bench = (
        ngram_hashes(benchmark, text_col, n)
        .groupBy("h")
        .agg(F.min("doc_id").alias("__bench_id"))
    )
    if broadcast_bench:
        bench = F.broadcast(bench)
    return (
        ngram_hashes(train, text_col, n)
        .join(bench, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shared_ngrams"),
            F.min("__bench_id").alias("contaminated_by"),
        )
    )


def semantic_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.35,
    n: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: flag training vectors whose
    cosine to ANY benchmark vector is ≥ ``threshold`` — the semantic
    sibling of the exact-13-gram gate above, catching paraphrased or
    reformatted benchmark leakage that shares no exact n-gram.

    Output: (vec_id, bench_id, cos) — one row per contaminated training
    vector with its highest-cosine benchmark match (ties broken toward
    the smallest bench_id). Clean vectors are absent; anti-join to drop.

    100-TB design — deliberately ASYMMETRIC, unlike ``embedding_dup_pairs``:
    - The benchmark side is small by construction, so its exact LSH band
      cells AND its quantized vectors are both BROADCAST; the corpus side
      never self-joins — train×train candidates (the quadratic term of
      symmetric dedup) are never generated.
    - The corpus side explodes its multi-probe cells map-side (Hamming-1
      flips recover near-miss sign splits, same recall argument as
      embedding_dup_pairs) and probes the broadcast bench cells: a
      map-side hash join with zero shuffle of the 100-TB side. Only the
      matched (train, bench) candidate pairs — bounded by bench cell
      population — pay the distinct + exact-cosine verify.
    - Band width follows the log-n knob from the CORPUS size (pass ``n``
      to avoid a count job on a derived frame), so bench cell population
      per cell stays bounded as the corpus grows.
    """
    from filesql_spark.pipeline.constants import (
        EMB_BANDS,
        EMB_BAND_STRIDE,
        emb_band_bits,
    )
    from filesql_spark.pipeline.dedup import _cosine_vec, with_quantized
    from filesql_spark.pipeline.similarity import _bucket

    bits = emb_band_bits(train.count() if n is None else n)
    from filesql_spark.pipeline._persist import swap_persist

    pre_t = swap_persist(
        "semantic_decon.pre_t",
        with_quantized(train.select("vec_id", "embedding"))
        .select("vec_id", "qv", "nrm")
        .withColumn("bucket", _bucket(F.col("qv"))),
    )
    pre_b = (
        with_quantized(bench.select("vec_id", "embedding"))
        .select("vec_id", "qv", "nrm")
        .withColumn("bucket", _bucket(F.col("qv")))
    )
    # Cell generation as ONE higher-order-function expression per side
    # rather than bands×(bits+1) unrolled Column objects: the unrolled
    # form cost ~2000 py4j round-trips (~1.2 s of driver time PER
    # INVOCATION, measured r9) while the HOF form is a handful of calls
    # and produces the bit-identical cell set (j = -1 is the unflipped
    # probe, j ≥ 0 the Hamming-1 flips).
    mask = (1 << bits) - 1
    cell = f"(shiftright(bucket, b * {EMB_BAND_STRIDE}) & {mask})"
    bench_cells = pre_b.select(
        "vec_id",
        F.expr(
            f"explode(transform(sequence(0, {EMB_BANDS - 1}), "
            f"b -> struct(b AS band, {cell} AS cell)))"
        ).alias("e"),
    ).select(F.col("vec_id").alias("bench_id"), "e.band", "e.cell")
    probed = pre_t.select(
        "vec_id",
        F.expr(
            f"""explode(flatten(transform(sequence(0, {EMB_BANDS - 1}), b ->
            transform(sequence(-1, {bits - 1}), j ->
              struct(b AS band,
                CASE WHEN j < 0 THEN {cell}
                     ELSE {cell} ^ shiftleft(1, j) END AS cell)))))"""
        ).alias("e"),
    ).select("vec_id", "e.band", "e.cell")
    cand = (
        probed.join(F.broadcast(bench_cells), ["band", "cell"])
        .select("vec_id", "bench_id")
        .distinct()
    )
    vt = pre_t.select("vec_id", F.col("qv").alias("qa"), F.col("nrm").alias("na"))
    vb = pre_b.select(
        F.col("vec_id").alias("bench_id"),
        F.col("qv").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    cos = _cosine_vec(F.col("qa"), F.col("na"), F.col("qb"), F.col("nb"))
    scored = (
        cand.join(vt, "vec_id")
        .join(F.broadcast(vb), "bench_id")
        .select("vec_id", "bench_id", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("bench_id")).alias("nb"))).alias("__m")
    )
    return best.select(
        "vec_id",
        (-F.col("__m.nb")).cast("long").alias("bench_id"),
        F.col("__m.cos").alias("cos"),
    )
