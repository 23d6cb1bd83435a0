"""Round-7c operators: PageRank, embedding whitening, kNN label vote,
token entropy, cumulative-distinct rewrite — behavioral invariants
beyond the oracle mirror (tests/test_entry_queries.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from filesql_spark.pipeline.graph import pagerank
from filesql_spark.pipeline.similarity import knn_label, standardize
from filesql_spark.pipeline.text import token_entropy


# ------------------------------------------------------------- pagerank


def test_pagerank_mass_conserved(spark):
    # ranks form a probability distribution: Σ rank = 1 every iteration
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    out = pagerank(edges, iterations=5).collect()
    assert len(out) == 3
    assert abs(sum(r.pagerank for r in out) - 1.0) < 1e-4


def test_pagerank_dangling_mass_redistributed(spark):
    # d is a sink (no out-edges); its mass must be redistributed, not
    # lost — total still sums to 1 and d's rank exceeds the (1-d)/N floor
    edges = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d"), ("a", "b"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    out = {r.node: r.pagerank for r in pagerank(edges, iterations=20).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-4
    assert out["d"] > (1 - 0.85) / 4  # sink accumulated real mass
    assert out["d"] == max(out.values())


def test_pagerank_star_ranks_hub_highest(spark):
    # every leaf points at the hub; hub must dominate
    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(5)] + [("hub", "leaf0")],
        "src string, dst string",
    )
    out = {r.node: r.pagerank for r in pagerank(edges, iterations=10).collect()}
    # hub collects all five leaves' mass; leaf0 in turn receives ALL of
    # the hub's (hub's only out-edge), so those two dominate the rest
    assert out["hub"] > 0.4
    assert out["leaf0"] > out["hub"] > out["leaf1"]
    for i in range(1, 5):
        assert out[f"leaf{i}"] == pytest.approx((1 - 0.85) / 6, abs=1e-6)


def test_pagerank_weighted_follows_weight(spark):
    # a sends 90% of its weight to b, 10% to c → b outranks c
    edges = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    out = {r.node: r.pagerank for r in pagerank(edges, iterations=15, weight="w").collect()}
    assert out["b"] > out["c"]


# ------------------------------------------------------- standardize


def test_standardize_moments(spark):
    # whitened columns have mean ~0 and variance ~1 (up to the ×1e4
    # quantization and the 6-decimal rounding)
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) * (j + 1) for j in range(4)], i % 2)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    z = standardize(df, dim=4).collect()
    for j in range(4):
        col = [r.zvec[j] for r in z]
        n = len(col)
        mean = sum(col) / n
        var = sum(v * v for v in col) / n - mean * mean
        assert abs(mean) < 1e-3
        assert abs(var - 1.0) < 1e-3


def test_standardize_constant_dim_zeroed(spark):
    df = spark.createDataFrame(
        [(i, [1.5, float(i)], 0) for i in range(10)],
        "vec_id long, embedding array<double>, label int",
    )
    z = standardize(df, dim=2).collect()
    assert all(r.zvec[0] == 0.0 for r in z)  # sd=0 dim → 0, not NaN
    assert any(r.zvec[1] != 0.0 for r in z)


# --------------------------------------------------------- knn label


def test_knn_label_planted_clusters(spark):
    # two tight clusters far apart: every query's vote must be unanimous
    # for its own cluster's label
    rows = []
    for i in range(20):
        base = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [base + 0.01 * i, base], i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = knn_label(df, df.filter(F.col("vec_id") < 4), k=5).collect()
    assert len(out) == 4
    for r in out:
        assert r.predicted_label == r.true_label
        assert r.votes == 5  # unanimous within the planted cluster


# ----------------------------------------------------- token entropy


def test_token_entropy_extremes(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(df).collect()}
    assert out[1].token_entropy == 0.0  # single repeated token
    assert out[1].simpson_diversity == pytest.approx(0.0)
    assert out[2].token_entropy == pytest.approx(3.0)  # 8 uniform tokens
    assert out[2].simpson_diversity == pytest.approx(1 - 8 / 64)
    assert out[2].pass_entropy == 1 and out[1].pass_entropy == 0
    assert out[3].n_tokens == 0 and out[3].token_entropy == 0.0


def test_token_entropy_matches_math(spark):
    # 2 of one token + 6 distinct: H = log2(8) - (2*log2(2))/8
    df = spark.createDataFrame(
        [(1, "a a b c d e f g")], "doc_id long, text string"
    )
    r = token_entropy(df).collect()[0]
    expect = math.log2(8) - (2 * math.log2(2)) / 8
    assert r.token_entropy == pytest.approx(expect, abs=1e-6)
    assert r.n_distinct == 7


# ------------------------------------------- cumulative distinct users


def test_cumulative_distinct_final_equals_total(spark, sf_dir):
    from filesql_spark.queries import load_table
    from filesql_spark.queries.relational import events_cumulative_distinct

    out = events_cumulative_distinct(spark, sf_dir).orderBy("d").collect()
    total = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert out[-1].cum_users == total  # curve ends at the distinct total
    assert all(a.cum_users < b.cum_users or b.new_users == 0
               for a, b in zip(out, out[1:]))  # monotone
    assert out[0].cum_users == out[0].new_users


# ------------------------------------------------- co-occurrence / decay


def test_cooccur_pairs_canonical_and_lift(spark):
    # order 1: {A,B,C}; order 2: {A,B}; order 3: {A}
    rows = [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 10), (1, 10)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        from filesql_spark.queries.pipeline_queries import orders_cooccur_parts

        out = {(r.p1, r.p2): r for r in orders_cooccur_parts(spark, d).collect()}
    assert out[(10, 20)].support == 2  # duplicate line in order 1 deduped
    assert out[(10, 30)].support == 1
    assert all(p1 < p2 for p1, p2 in out)  # canonical pair order
    # lift(10,20) = support*n / (c10*c20) = 2*3/(3*2) = 1.0
    assert out[(10, 20)].lift == pytest.approx(1.0)


def test_decayed_engagement_halflife(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import events_decayed_engagement

    out = events_decayed_engagement(spark, sf_dir).collect()
    for r in out:
        # decay weights are in (0, 1]: decayed ≤ raw, and positive raw
        # with any recent activity keeps a positive decayed score
        assert r.decayed_value <= r.raw_value + 1e-9
        assert r.n_events > 0


# ------------------------------------------------- expectation suite


def test_quality_checks_planted_violations(spark):
    from filesql_spark.pipeline.quality import Check, referential_check, run_checks

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 20.0), (None, 30.0), (5, None)],
        "k int, v double",
    )
    out = {r.check: r for r in run_checks(df, [
        Check("rows_min", "min_rows", threshold=10),
        Check("k_not_null", "violations", cond=F.col("k").isNotNull()),
        Check("v_positive", "violations", cond=F.col("v") > 0),
        Check("k_unique", "unique", col="k"),
    ]).collect()}
    assert out["rows_min"].observed == 5 and out["rows_min"].passed == 0
    assert out["k_not_null"].observed == 1 and out["k_not_null"].passed == 0
    # v=-5 fails the range check AND the NULL v counts as a violation
    # (CASE WHEN cond THEN 0 ELSE 1 — ADVICE r7 #1)
    assert out["v_positive"].observed == 2
    # k=2 appears twice; NULLs don't count toward uniqueness
    assert out["k_unique"].observed == 1 and out["k_unique"].passed == 0

    # all-unique suite: df.agg() with zero plain expressions used to raise
    uniq_only = {r.check: r for r in run_checks(df, [
        Check("k_unique", "unique", col="k"),
    ]).collect()}
    assert uniq_only["k_unique"].observed == 1

    dim = spark.createDataFrame([(1,), (3,)], "k int")
    ref = referential_check(df, "k", dim, "k", "k_refs").collect()[0]
    # k=2 twice orphaned + k=5 + the NULL key (NULL never equi-matches —
    # the documented NOT-EXISTS semantics; SQL-FK vacuous-NULL needs a
    # paired not-null check)
    assert ref.observed == 4
    assert ref.passed == 0


def test_quality_checks_all_green_at_sf(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import quality_expectations_orders

    out = quality_expectations_orders(spark, sf_dir).collect()
    assert len(out) == 7
    assert all(r.passed == 1 for r in out)  # driver data satisfies the suite


# -------------------------------------------- partitioning invariance


def test_pagerank_partition_invariant(spark):
    # ranks (rounded to 6) must not depend on input partitioning — the
    # exactness contract the oracle hash relies on
    import random

    rng = random.Random(11)
    rows = [
        (f"n{rng.randrange(12)}", f"n{rng.randrange(12)}", float(rng.randrange(1, 5)))
        for _ in range(60)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, w double")
    a = {r.node: r.pagerank
         for r in pagerank(edges.repartition(1), iterations=8, weight="w").collect()}
    b = {r.node: r.pagerank
         for r in pagerank(edges.repartition(13), iterations=8, weight="w").collect()}
    assert a == b


def test_decayed_engagement_partition_invariant(spark, sf_dir):
    # exact-integer ppm sums ⇒ bit-identical across partitionings
    from filesql_spark.queries.pipeline_queries import events_decayed_engagement

    base = {r.user_id: (r.decayed_value, r.raw_value)
            for r in events_decayed_engagement(spark, sf_dir).collect()}
    n0 = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {r.user_id: (r.decayed_value, r.raw_value)
                 for r in events_decayed_engagement(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", n0)
    assert base == again


# ----------------------------------------------------------- tf-idf


def test_tfidf_ranks_distinctive_terms(spark):
    from filesql_spark.pipeline.text import tfidf_topk

    # "zebra" appears only in doc 1; "common" appears everywhere —
    # zebra must outrank common for doc 1 despite equal tf
    df = spark.createDataFrame(
        [
            (1, "common zebra common zebra"),
            (2, "common boring common boring"),
            (3, "common plain common plain"),
        ],
        "doc_id long, text string",
    )
    out = [r for r in tfidf_topk(df, k=2).collect() if r.doc_id == 1]
    assert [r.term for r in sorted(out, key=lambda r: r.rank)] == ["zebra", "common"]
    z = next(r for r in out if r.term == "zebra")
    # rational RSJ idf: tf * (N - df + .5)/(df + .5) = 2 * (3-1+.5)/1.5
    assert z.score == pytest.approx(2 * 2.5 / 1.5)


# --------------------------------------- outliers / conversion latency


def test_centroid_outliers_planted(spark):
    from filesql_spark.pipeline.similarity import centroid_outliers

    # label 0: tight cluster at (1,1) + one far point → vec 9 must rank 1
    rows = [(i, [1.0 + 0.001 * i, 1.0], 0) for i in range(9)]
    rows.append((9, [50.0, 50.0], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = centroid_outliers(df, k=2, dim=2).collect()
    top = next(r for r in out if r.rank == 1)
    assert top.vec_id == 9
    assert top.dist2 > 1e6  # quantized units (×10⁴ per axis, squared)


def test_conversion_latency_exact(spark):
    import datetime as dt
    import os, tempfile

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 100, "view", 1.0, "{}"),
        (2, base + dt.timedelta(seconds=30), 100, "purchase", 1.0, "{}"),
        (3, base + dt.timedelta(seconds=40), 100, "view", 1.0, "{}"),
        (4, base + dt.timedelta(seconds=100), 100, "purchase", 1.0, "{}"),
        (5, base, 200, "purchase", 1.0, "{}"),  # no prior view → excluded
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        from filesql_spark.queries.pipeline_queries import events_conversion_latency

        r = events_conversion_latency(spark, d).collect()[0]
    assert r.n_conversions == 2  # latencies 30s and 60s
    assert r.mean_latency_sec == pytest.approx(45.0)
    assert r.median_latency_sec == pytest.approx(45.0)


# ------------------------------------------------------- hll rollup


def test_hll_rollup_merge_equals_direct(spark):
    # MAX-merging fine-grain registers must equal computing the sketch
    # at the coarse grain directly — the property the oracle hashes
    from filesql_spark.pipeline.sketch import (
        hll_estimate_from_registers,
        hll_registers,
        hll_rollup,
    )

    rows = [(d, d // 7, f"u{v}") for d in range(28) for v in range(d * 3 + 1)]
    df = spark.createDataFrame(rows, "day int, wk int, user string")
    merged = {
        r.wk: (r.nonzero_registers, r.sum_scaled, r.hll_estimate)
        for r in hll_rollup(
            df, F.col("day"), F.col("wk"), "user", "day", "wk"
        ).collect()
    }
    direct = {
        r.wk: (r.nonzero_registers, r.sum_scaled, r.hll_estimate)
        for r in hll_estimate_from_registers(
            hll_registers(df.select("wk", "user"), ["wk"], "user"), ["wk"]
        ).collect()
    }
    assert merged == direct
    assert len(merged) == 4


# ---------------------------------------------- changepoint / forecast


def test_cusum_finds_planted_level_shift(spark):
    import datetime as dt
    import os, tempfile

    # 10 days at 100/day then 10 days at 500/day → changepoint at the
    # last low day (|CUSUM| peaks where the prefix deviates most)
    rows = []
    eid = 0
    for day in range(20):
        val = 100.0 if day < 10 else 500.0
        rows.append(
            (eid, dt.datetime(2024, 1, 1 + day), 1, "shift", val, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        from filesql_spark.queries.pipeline_queries import events_changepoint_cusum

        r = events_changepoint_cusum(spark, d).collect()[0]
    assert r.changepoint_day == dt.datetime(2024, 1, 10)  # day 10 (last low)
    # prefix mean 100 vs global 300: cusum_value = 10 days × −200
    assert r.cusum_value == pytest.approx(-2000.0)


def test_forecast_is_hourly_mean(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import events_forecast_seasonal

    out = events_forecast_seasonal(spark, sf_dir).collect()
    assert all(r.forecast == r.observed_total / r.n_days for r in out)
    assert len({(r.event_type, r.hr) for r in out}) == len(out)
    assert all(0 <= r.hr <= 23 for r in out)


def test_association_rules_directional_confidence(spark):
    import os, tempfile

    # {A,B} in 2 of 3 orders; A in 3, B in 2 → conf(A→B)=2/3, conf(B→A)=1
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        from filesql_spark.queries.pipeline_queries import orders_association_rules

        out = {(r.antecedent, r.consequent): r
               for r in orders_association_rules(spark, d).collect()}
    assert out[(20, 10)].confidence == pytest.approx(1.0)
    assert out[(10, 20)].confidence == pytest.approx(2 / 3)
    assert out[(10, 20)].lift == out[(20, 10)].lift  # lift is symmetric


# ------------------------------------------------------ lm perplexity


def test_lm_perplexity_ranks_shredded_text_higher(spark):
    from filesql_spark.pipeline.text import lm_perplexity

    # corpus with a strong "the cat sat" pattern; doc 4 shreds it —
    # its bigrams are rare under the corpus LM → higher perplexity
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the rug"),
            (3, "the cat sat on the bed"),
            (4, "mat the on sat bed cat"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_perplexity(df).collect()}
    assert out[4].perplexity > max(out[i].perplexity for i in (1, 2, 3))
    for r in out.values():
        assert r.n_bigrams == 5
        assert r.avg_nll > 0  # probabilities < 1 → positive NLL


def test_lm_perplexity_partition_invariant(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import text_lm_perplexity

    base = {r.doc_id: r.sum_lp_micro for r in text_lm_perplexity(spark, sf_dir).collect()}
    n0 = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        again = {r.doc_id: r.sum_lp_micro for r in text_lm_perplexity(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", n0)
    assert base == again  # micro-nat integer sums: exact at any partitioning


# ------------------------------------------------ ab test / sliding wau


def test_ab_lift_zero_between_identical_arms(spark):
    import datetime as dt
    import os, tempfile

    # perfectly symmetric arms → lift 0, z-stat 0
    rows = []
    eid = 0
    for u in range(20):
        for k in range(2 + (u // 2) % 3):  # same profile for u and u+1
            rows.append((eid, dt.datetime(2024, 1, 1 + k), u, "purchase", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        from filesql_spark.queries.pipeline_queries import events_ab_test_lift

        r = events_ab_test_lift(spark, d).collect()[0]
    assert r.n_a == 10 and r.n_b == 10
    assert r.abs_lift == 0.0 and r.z_stat == 0.0


def test_sliding_wau_bounds(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import sketch_hll_sliding_wau
    from filesql_spark.queries.relational import events_cumulative_distinct

    wau = {r.d: r for r in sketch_hll_sliding_wau(spark, sf_dir).collect()}
    # WAU(d) >= DAU(d) is implied by construction; check the estimate
    # lands within the usual raw-HLL envelope of exact, and that the
    # trailing window grows over the first week (windows only add days)
    for r in wau.values():
        assert r.wau_estimate > 0.5 * r.wau_exact
        assert r.wau_estimate < 2.0 * r.wau_exact
    days = sorted(wau)
    for a, b in zip(days[:6], days[1:7]):
        assert wau[b].wau_exact >= wau[a].wau_exact


def test_tokenizer_coverage_ppm_exact(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import text_tokenizer_coverage

    out = text_tokenizer_coverage(spark, sf_dir).collect()
    for r in out:
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens
        assert 0 <= r.n_oov <= r.n_tokens


def test_near_dup_eval_planted_duplicates(spark):
    import os, tempfile
    from filesql_spark.pipeline.dedup import near_dup_eval

    # docs 0/5/10 identical (all in the %5 sample) → truth pairs = 3;
    # detector must find them all (identical docs share every band)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base if i in (0, 5, 10) else f"{i} unique words " + " ".join(
        f"w{i}{j}" for j in range(10))) for i in range(0, 25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = near_dup_eval(df).collect()[0]
    assert r.n_truth_pairs == 3
    assert r.true_positives == 3
    assert r.recall_ppm == 1_000_000
    assert r.precision_ppm == 1_000_000


def test_session_funnel_attribution(spark):
    import datetime as dt
    import os, tempfile

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # session 1 of user 1: view then purchase → converts
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=5), 1, "purchase", 1.0, "{}"),
        # user 2: view, then purchase in a LATER session → no conversion
        (3, base, 2, "view", 1.0, "{}"),
        (4, base + dt.timedelta(hours=2), 2, "purchase", 1.0, "{}"),
        # user 3: purchase BEFORE view in one session → no conversion
        (5, base, 3, "purchase", 1.0, "{}"),
        (6, base + dt.timedelta(minutes=1), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        from filesql_spark.queries.pipeline_queries import events_session_funnel

        r = events_session_funnel(spark, d).collect()[0]
    assert r.n_sessions == 4  # users 1 and 3 one each, user 2 two
    assert r.n_with_view == 3  # user 2's purchase-only session has none
    assert r.n_converted == 1  # only user 1's session
    assert r.conversion_ppm == 1_000_000 // 3


def test_ltv_cohort_monotone_and_bounded(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import events_ltv_cohort

    rows = events_ltv_cohort(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for series in by_cohort.values():
        series.sort(key=lambda r: r.week_n)
        ltv = [r.cum_ltv_per_user for r in series]
        assert all(a <= b + 1e-9 for a, b in zip(ltv, ltv[1:]))  # cumulative
        for r in series:
            assert 0 <= r.active_buyers <= r.cohort_size
            assert r.week_n >= 0
