"""Round-7 operators: k-means, random projection, snapshot diff,
mixture resample, datacard (plus their plan-shape gates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filesql_spark.pipeline.clustering import (
    assign_clusters,
    kmeans_fit,
    random_projection,
    srp_signs,
)
from filesql_spark.pipeline.dedup import with_quantized
from filesql_spark.pipeline.sampling import mixture_resample
from filesql_spark.pipeline.snapshot import snapshot_diff


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from filesql_spark.queries import load_table

    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from filesql_spark.queries import load_table

    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------- k-means


def test_kmeans_assignment_complete_and_deterministic(emb):
    cents1, a1 = kmeans_fit(emb, k=4, iters=2)
    cents2, a2 = kmeans_fit(emb, k=4, iters=2)
    assert cents1 == cents2
    rows1 = sorted((r.vec_id, r.cluster, r.dist) for r in a1.collect())
    rows2 = sorted((r.vec_id, r.cluster, r.dist) for r in a2.collect())
    assert rows1 == rows2
    n = emb.count()
    assert len(rows1) == n
    assert all(0 <= c < 4 for _, c, _ in rows1)
    assert all(d >= 0 for _, _, d in rows1)


def test_kmeans_iterations_do_not_increase_inertia(emb):
    """Lloyd's guarantee holds for the exact-int variant too (rounding the
    centroid to the int grid perturbs by <1 quantum per dim; assert the
    inertia trend with a tolerance for that)."""
    q = with_quantized(emb)
    seed = [list(r.qv) for r in q.orderBy("vec_id").limit(4).select("qv").collect()]
    init_inertia = assign_clusters(q, seed).agg(F.sum("dist")).collect()[0][0]
    cents, assigned = kmeans_fit(emb, k=4, iters=2)
    final_inertia = assigned.agg(F.sum("dist")).collect()[0][0]
    assert final_inertia <= init_inertia


def test_kmeans_assignment_is_nearest_centroid(emb):
    """Cross-check one row's assignment against a brute-force python dist."""
    cents, assigned = kmeans_fit(emb, k=4, iters=1)
    row = assigned.orderBy("vec_id").limit(1).collect()[0]
    dists = [
        sum((x - c) * (x - c) for x, c in zip(row.qv, cent)) for cent in cents
    ]
    best = min(range(len(dists)), key=lambda j: (dists[j], j))
    assert row.cluster == best and row.dist == dists[best]


def test_kmeans_assign_is_shuffle_free(emb):
    q = with_quantized(emb)
    seed = [list(r.qv) for r in q.orderBy("vec_id").limit(4).select("qv").collect()]
    plan = assign_clusters(q, seed)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------------- random projection


def test_srp_signs_deterministic_and_pm1():
    s1 = srp_signs(64, 16)
    s2 = srp_signs(64, 16)
    assert s1 == s2
    assert all(v in (-1, 1) for row in s1 for v in row)
    # not degenerate: both signs appear in every output column
    for j in range(16):
        col = [s1[i][j] for i in range(64)]
        assert -1 in col and 1 in col


def test_random_projection_matches_manual(emb):
    out = random_projection(emb, out_dims=4).orderBy("vec_id").limit(2).collect()
    signs = srp_signs(64, 4)
    src = (
        with_quantized(emb).orderBy("vec_id").limit(2).select("vec_id", "qv").collect()
    )
    for o, s in zip(out, src):
        assert o.vec_id == s.vec_id
        for j in range(4):
            assert o[f"p{j}"] == sum(q * signs[i][j] for i, q in enumerate(s.qv))


def test_random_projection_is_shuffle_free(emb):
    plan = (
        random_projection(emb, out_dims=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# --------------------------------------------------------- snapshot diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, payload string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id long, payload string"
    )
    got = {
        r.id: r.status
        for r in snapshot_diff(old, new, "id", ["payload"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_multicol_fingerprint(spark):
    old = spark.createDataFrame([(1, "a", 10)], "id long, s string, v long")
    new = spark.createDataFrame([(1, "a", 11)], "id long, s string, v long")
    rows = snapshot_diff(old, new, "id", ["s", "v"]).collect()
    assert len(rows) == 1 and rows[0].status == "changed"


def test_snapshot_diff_unchanged_dropped(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, payload string")
    assert snapshot_diff(df, df, "id", ["payload"]).count() == 0


# ------------------------------------------------------ mixture resample


def test_mixture_resample_hits_target_ratio(docs):
    kept = mixture_resample(docs, "lang", {"en": 2, "de": 1, "es": 1, "fr": 1, "zh": 1})
    counts = {r.lang: r.cnt for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(counts) <= {"en", "de", "es", "fr", "zh"}
    # en should get ~2x the weight-1 strata; hash sampling is approximate,
    # so assert direction + the scarcest stratum being kept (near-)whole
    others = [counts[k] for k in counts if k != "en"]
    assert counts["en"] > max(others)
    orig = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    W, weights = 6, {"en": 2, "de": 1, "es": 1, "fr": 1, "zh": 1}
    scarcest = min(weights, key=lambda s: (orig[s] * W / weights[s], s))
    # exact-integer thresholds keep the scarcest stratum exactly whole
    assert counts[scarcest] == orig[scarcest]


def test_mixture_resample_deterministic_and_subset(docs):
    w = {"en": 1, "de": 1}
    a = sorted(r.doc_id for r in mixture_resample(docs, "lang", w).collect())
    b = sorted(r.doc_id for r in mixture_resample(docs, "lang", w).collect())
    assert a == b
    langs = {
        r.lang for r in mixture_resample(docs, "lang", w).select("lang").distinct().collect()
    }
    assert langs <= {"en", "de"}


def test_mixture_resample_broadcasts_thresholds(docs):
    plan = (
        mixture_resample(docs, "lang", {"en": 1, "de": 1})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------- datacard


def test_datacard_rollup_total(spark, sf_dir):
    from filesql_spark.queries import all_queries

    df = all_queries()["corpus_datacard"](spark, sf_dir)
    rows = {(r.lang, r.source): r for r in df.collect()}
    total = rows[("ALL", "ALL")]
    n_docs_sum = sum(
        r.n_docs for (lang, src), r in rows.items() if lang != "ALL" and src != "ALL"
    )
    assert total.n_docs == n_docs_sum
    assert total.n_dup_docs >= 0 and total.n_ws_tokens > 0


# ------------------------------------------------- banded interval join


def test_interval_join_banded_matches_theta(spark, sf_dir):
    from filesql_spark.queries import all_queries
    from filesql_spark.queries import load_table

    banded = all_queries()["interval_join_banded"](spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    v = e.filter("event_type = 'view'").selectExpr(
        "event_id AS view_id", "user_id", "unix_micros(ts) AS v_us"
    )
    p = e.filter("event_type = 'purchase'").selectExpr(
        "event_id AS purchase_id", "user_id AS p_user", "unix_micros(ts) AS p_us"
    )
    theta = (
        v.join(p, (v.user_id == p.p_user))
        .filter("p_us - v_us BETWEEN 0 AND 600000000")
        .selectExpr("view_id", "purchase_id", "CAST(p_us - v_us AS LONG) AS dt_us")
    )
    got = sorted(map(tuple, banded.collect()))
    want = sorted(map(tuple, theta.collect()))
    assert got == want and len(got) > 0


def test_interval_join_banded_no_nested_loop(spark, sf_dir):
    from filesql_spark.queries import all_queries

    plan = (
        all_queries()["interval_join_banded"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ merge apply


def test_merge_apply_semantics(spark):
    from filesql_spark.pipeline.snapshot import merge_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, payload string"
    )
    changes = spark.createDataFrame(
        [(2, "delete", None), (3, "upsert", "C2"), (4, "upsert", "d")],
        "id long, op string, payload string",
    )
    got = {r.id: r.payload for r in merge_apply(base, changes, "id").collect()}
    assert got == {1: "a", 3: "C2", 4: "d"}


def test_merge_apply_base_not_shuffled(spark):
    from filesql_spark.pipeline.snapshot import merge_apply

    base = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS payload")
    changes = spark.createDataFrame(
        [(1, "delete", None)], "id long, op string, payload string"
    )
    plan = (
        merge_apply(base, changes, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# -------------------------------------------------------- per-source cap


def test_per_source_cap(spark, sf_dir):
    from filesql_spark.queries import all_queries

    df = all_queries()["pipeline_per_source_cap"](spark, sf_dir)
    counts = df.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in counts)
    a = sorted(r.doc_id for r in df.collect())
    b = sorted(
        r.doc_id for r in all_queries()["pipeline_per_source_cap"](spark, sf_dir).collect()
    )
    assert a == b


# ----------------------------------------------------- streaming CDC apply


def test_cdc_apply_stream_exactly_once(spark, sf_dir, tmp_path):
    """Re-running against the same checkpoint must be a no-op: no new
    version committed, same final state."""
    from filesql_spark.streaming import cdc_apply_stream

    out, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    first = cdc_apply_stream(spark, sf_dir, out, ckpt)
    rows1 = sorted(map(tuple, first.collect()))
    import os

    versions1 = sorted(p for p in os.listdir(out) if p.startswith("version="))
    second = cdc_apply_stream(spark, sf_dir, out, ckpt)
    rows2 = sorted(map(tuple, second.collect()))
    versions2 = sorted(p for p in os.listdir(out) if p.startswith("version="))
    assert rows1 == rows2
    assert versions1 == versions2  # replay committed nothing new


def test_cdc_apply_stream_matches_batch_merge(spark, sf_dir, tmp_path):
    from filesql_spark.queries import all_queries

    streamed = sorted(
        map(tuple, all_queries()["streaming_cdc_apply"](spark, sf_dir).collect())
    )
    batch = sorted(
        map(
            tuple,
            all_queries()["cdc_merge_apply"](spark, sf_dir).collect(),
        )
    )
    assert streamed == batch


# --------------------------------------------------------------- dup spans


def test_dup_spans_planted(spark):
    """Plant one shared 6-word phrase in two docs; the span must cover
    exactly that phrase (n=5 grams -> two gram positions merge into one
    6-token island), and unique docs must yield nothing."""
    from filesql_spark.pipeline.text import dup_spans

    shared = "the quick brown fox jumps high"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four"),
            (3, "entirely unique words only here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.span_start, r.span_tokens) for r in dup_spans(docs).collect()}
    assert rows[1] == (2, 6)  # phrase starts after 2 lead words
    assert rows[2] == (3, 6)
    assert 3 not in rows


def test_dup_spans_merges_adjacent_grams(spark):
    """A 7-word shared run = three overlapping 5-grams = ONE span of 7."""
    from filesql_spark.pipeline.text import dup_spans

    run = "a b c d e f g"
    docs = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"p q {run}")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.span_start, r.span_tokens) for r in dup_spans(docs).collect()}
    assert rows[1] == (1, 7) and rows[2] == (2, 7)


def test_dup_spans_within_doc_repeat_not_flagged(spark):
    """A phrase repeated within ONE doc (but in no other doc) is not a
    cross-document duplicate."""
    from filesql_spark.pipeline.text import dup_spans

    docs = spark.createDataFrame(
        [
            (1, "r s t u v w r s t u v w"),
            (2, "completely different content with no overlap whatsoever"),
        ],
        "doc_id long, text string",
    )
    assert dup_spans(docs).count() == 0


# --------------------------------------------------------------- gap fill


def test_gap_fill_grid_complete_and_filled(spark, sf_dir):
    """Every user's grid is contiguous hourly, gaps carry the previous
    hour's value forward, and observed hours keep their own totals."""
    from filesql_spark.queries import all_queries

    rows = all_queries()["events_gap_fill"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    import datetime

    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.h)
        # contiguous hourly grid
        for a, b in zip(rs, rs[1:]):
            assert (b.h - a.h) == datetime.timedelta(hours=1), (uid, a.h, b.h)
        # first row is an observed hour (grid starts at first activity)
        assert rs[0].n_events > 0
        # forward fill: a zero-event hour repeats the previous filled value
        for a, b in zip(rs, rs[1:]):
            if b.n_events == 0:
                assert b.filled_value == a.filled_value


# ------------------------------------------------------------ robust stats


def test_robust_stats_clipping_bounds(spark, sf_dir):
    """Winsorized mean sits inside the raw value range, ~10% of rows are
    clipped (5% each tail at bin resolution), and clipping only ever
    pulls the mean toward the middle."""
    from filesql_spark.queries import all_queries, load_table
    from pyspark.sql import functions as F

    rows = all_queries()["events_robust_stats"](spark, sf_dir).collect()
    assert rows
    raw = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.avg("value").alias("mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        base = raw[r.event_type]
        assert base.lo <= r.winsor_mean <= base.hi
        assert r.n == base.n
        clipped_frac = (r.n_clipped_lo + r.n_clipped_hi) / r.n
        assert clipped_frac <= 0.12  # ≤ ~5% per tail + bin-resolution slack
