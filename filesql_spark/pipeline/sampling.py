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

from pyspark.sql import Column, DataFrame, Window
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


ORDER_BUCKET_BITS = 8  # 256 range buckets for the distributed prefix sum


def hashed_prefix_sum(
    df: DataFrame, key_col: str, weight_col: str
) -> DataFrame:
    """(key, w, cw, total): exclusive-start cumulative weights along the
    md5-hash order of ``key_col`` — the distributed prefix sum shared by
    weighted sampling and sequence packing.

    Scale: a running sum over a global ORDER BY is one task. Here the
    top ORDER_BUCKET_BITS bits of the hash range-bucket the order
    (bucket order == hash order because it's a bit-prefix), the running
    sum runs per-bucket in parallel, and only the ≤256-row bucket-total
    table pays a single-task window before being broadcast back as
    offsets. Weights are clamped to ≥ 1 integers.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = F.greatest(F.col(weight_col).cast("long"), F.lit(1))
    # persisted: the intra-bucket window, the bucket totals and the grand
    # total all read this 4-numeric-column frame, and in the composed
    # pipelines ``df`` is the ENTIRE cleaned corpus — each uncached read
    # re-ran that whole upstream chain (r17; A/B on pipeline_train_prep at
    # sf0.1: 11.9 s -> 5.7 s median). The grand total derives from it too
    # (Σw over t == Σ greatest(w,1) over df, identical clamped values).
    from filesql_spark.pipeline._persist import swap_persist

    t = swap_persist("sampling.prefix_sum", df.select(
        F.col(key_col),
        w.alias("w"),
        h.alias("h"),
        F.shiftright(h, 60 - ORDER_BUCKET_BITS).alias("bkt"),
    ))
    total = t.agg(F.sum("w").alias("total"))
    intra = (
        Window.partitionBy("bkt")
        .orderBy("h", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("cw_in", F.sum("w").over(intra))
    totals = t.groupBy("bkt").agg(F.sum("w").alias("bw"))
    prior = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bkt", F.coalesce(F.sum("bw").over(prior), F.lit(0)).alias("off")
    )
    return (
        t.join(F.broadcast(offsets), "bkt")
        .crossJoin(F.broadcast(total))
        .selectExpr(key_col, "w", "off + cw_in AS cw", "total")
    )


def weighted_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, fully deterministic —
    systematic (fixed-stride) selection over a hashed order. The
    token-budgeted corpus subset pass: "give me k documents, long
    documents proportionally more likely, same k documents every run on
    any cluster". Yields exactly k rows whenever no single weight
    exceeds total/k (a row spanning multiple stride points is picked
    once, collapsing them).

    How: rows are ordered by the md5-hash of their key (uniform, so the
    order is independent of the weights), the integer weights are
    prefix-summed along that order, and the k sample points
    ``p_t = floor(t·total/k)+1`` pick the row whose cumulative interval
    contains them — selection is ``ceil(cw·k/total)`` strictly
    increasing across a row's interval, all integer arithmetic (`div`),
    so DuckDB's window-function formulation is the exact oracle.

    Scale: the distributed prefix sum is :func:`hashed_prefix_sum` (only
    a ≤256-row bucket-total table is single-task). Every weight ≥ 1
    guarantees exactly k selected rows.
    """
    return (
        hashed_prefix_sum(df, key_col, weight_col)
        .selectExpr(key_col, "w", "cw", "cw - w AS pw", "total")
        .selectExpr(
            key_col,
            "w AS weight",
            "cw AS cum_weight",
            f"(pw * {k} + total - 1) div total AS sample_idx",
            f"(cw * {k} + total - 1) div total AS c_now",
            f"(pw * {k} + total - 1) div total AS c_prev",
        )
        .where("c_now > c_prev")
        .drop("c_now", "c_prev")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    weight_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the training-prep step that
    turns a token-counted corpus into fixed-budget training sequences:
    documents are laid end-to-end along a deterministic hashed order and
    the concatenation is cut every ``budget`` tokens.

    Output per document: (key, n_tokens, start_offset, pack_id,
    end_pack_id) — the global token offset where the document starts,
    the pack that offset falls in (``start div budget``), and the pack
    its last token falls in (documents longer than the remaining room
    straddle packs; end_pack_id - pack_id = extra chunks the loader
    splits it into). Everything is exact integer arithmetic over
    :func:`hashed_prefix_sum`, so the single-window SQL formulation is
    the exact oracle, and the layout is identical on any cluster/run —
    resumable training needs that.
    """
    return hashed_prefix_sum(df, key_col, weight_col).selectExpr(
        key_col,
        "w AS n_tokens",
        "cw - w AS start_offset",
        f"(cw - w) div {budget} AS pack_id",
        f"(cw - 1) div {budget} AS end_pack_id",
    )


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, int],
    key_col: str = "doc_id",
) -> DataFrame:
    """Resample the corpus to a target stratum mixture — the domain/
    language-rebalancing step of a training-data recipe ("2 parts web :
    1 part books : 1 part code"). ``weights`` are integer mixture parts
    per stratum value; strata not listed are dropped.

    The scarcest stratum m (the one minimizing n_s/w_s) pins the
    feasible total — it is kept WHOLE (threshold exactly 10⁴, by
    integer arithmetic) — and every other stratum keeps
    floor(10⁴·n_m·w_s / (w_m·n_s)) of its 10⁴ hash buckets, the exact
    bucket count that matches the target mixture. Because the
    per-stratum keep-rate derives only from the observed counts and the
    integer weights through exact integer expressions, the kept SET is a
    deterministic property of the data — re-runs, repartitioning and
    cluster changes cannot change it, unlike ``sampleBy``.

    Scale shape: one count aggregate over the strata column (map-side
    combined to |strata| rows), a |strata|-row threshold table broadcast
    back, and a scan-level bucket filter — the corpus itself is never
    shuffled. At 100 TB that is a single pass, and the thresholds are
    bytes.
    """
    W = sum(weights.values())
    w_expr = F.lit(None).cast("long")
    for value, parts in sorted(weights.items()):
        w_expr = F.when(F.col(strata_col) == value, F.lit(parts)).otherwise(w_expr)
    counts = (
        df.withColumn("_w", w_expr)
        .filter(F.col("_w").isNotNull())
        .groupBy(strata_col, "_w")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # scarcest stratum (min n/w, ties by stratum value) pins the total;
    # thresholds are exact integer floor division — no float anywhere, so
    # the scarcest stratum's threshold is exactly 10^4 (kept whole)
    m = (
        counts.orderBy(
            (F.col("_n") * W / F.col("_w")).asc(), F.col(strata_col).asc()
        )
        .limit(1)
        .select(F.col("_n").alias("_n_m"), F.col("_w").alias("_w_m"))
    )
    thr = counts.crossJoin(F.broadcast(m)).select(
        F.col(strata_col),
        F.expr(f"({SPLIT_BUCKETS} * _n_m * _w) div (_w_m * _n)")
        .cast("long")
        .alias("_thresh"),
    )
    return (
        df.join(F.broadcast(thr), strata_col)
        .filter(_bucket(F.col(key_col)) < F.col("_thresh"))
        .drop("_thresh")
    )


def curriculum_order(
    df: DataFrame, stage_col: str = "stage", key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global training order WITHOUT a global sort: every
    row gets a 1-based ``global_pos`` that walks the stages in order
    (all of stage 0, then stage 1, …) and shuffles uniformly WITHIN each
    stage by the md5-hash of its key — the curriculum-learning data
    order ("easy examples first, shuffled within difficulty") that must
    be reproducible across re-runs and cluster sizes.

    Decomposition (same trick as :func:`hashed_prefix_sum`): the hash's
    top ORDER_BUCKET_BITS bits range-bucket the within-stage order, a
    row_number runs per (stage, bucket) partition in parallel, and only
    the ≤ stages×256-row bucket-count table pays single-task windows
    before broadcasting back as offsets. The invariant — global_pos ==
    ROW_NUMBER() over (stage, hash, key) — is what the DuckDB oracle
    checks, so the parallel decomposition is verified against the very
    global sort it avoids.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    # same persist rationale as hashed_prefix_sum (r17): the bucket-count
    # aggregate and the final position join both read this narrow frame
    from filesql_spark.pipeline._persist import swap_persist

    t = swap_persist("sampling.curriculum", df.select(
        F.col(key_col),
        F.col(stage_col).alias("__stage"),
        h.alias("__h"),
        F.shiftright(h, 60 - ORDER_BUCKET_BITS).alias("__bkt"),
    ))
    intra = Window.partitionBy("__stage", "__bkt").orderBy("__h", key_col)
    t = t.withColumn("__rk", F.row_number().over(intra))
    bkt_tot = t.groupBy("__stage", "__bkt").agg(F.count(F.lit(1)).alias("__bn"))
    prior_b = (
        Window.partitionBy("__stage")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bkt_off = bkt_tot.withColumn(
        "__boff", F.coalesce(F.sum("__bn").over(prior_b), F.lit(0))
    )
    stage_tot = bkt_tot.groupBy("__stage").agg(F.sum("__bn").alias("__sn"))
    prior_s = Window.orderBy("__stage").rowsBetween(Window.unboundedPreceding, -1)
    stage_off = stage_tot.withColumn(
        "__soff", F.coalesce(F.sum("__sn").over(prior_s), F.lit(0))
    )
    return (
        t.join(F.broadcast(bkt_off.select("__stage", "__bkt", "__boff")),
               ["__stage", "__bkt"])
        .join(F.broadcast(stage_off.select("__stage", "__soff")), "__stage")
        .select(
            F.col(key_col),
            F.col("__stage").cast("int").alias(stage_col),
            (F.col("__soff") + F.col("__boff") + F.col("__rk"))
            .cast("long")
            .alias("global_pos"),
        )
    )
