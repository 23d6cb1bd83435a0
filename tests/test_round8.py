"""Round-8 operator unit tests — semantics on small crafted inputs
(the oracle mirror covers the registry entries; these pin the engine
pieces' behavior on known answers)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ KMV/theta


def test_kmv_exact_when_small(spark):
    """n < k: the sketch is exhaustive and the estimate is EXACTLY n."""
    from filesql_spark.pipeline.sketch import kmv_sketch, kmv_theta_estimates

    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, "g string, v int")
    sk = kmv_sketch(df, "g", "v", k=64)
    out = {r.set_name: r for r in kmv_theta_estimates(sk, "a", "b", k=64).collect()}
    assert out["a"].estimate == 10.0
    assert out["b"].estimate == 10.0
    assert out["union"].estimate == 15.0
    assert out["intersection"].estimate == 5.0


def test_kmv_estimate_accuracy(spark):
    """n >> k: estimate within 30% of truth (k=64 → ~12.5% stderr)."""
    from filesql_spark.pipeline.sketch import kmv_sketch, kmv_theta_estimates

    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(1500, 4500)]
    df = spark.createDataFrame(rows, "g string, v int")
    sk = kmv_sketch(df, "g", "v", k=64)
    out = {r.set_name: r for r in kmv_theta_estimates(sk, "a", "b", k=64).collect()}
    for name, truth in [("a", 3000), ("b", 3000), ("union", 4500)]:
        assert abs(out[name].estimate - truth) / truth < 0.30, (name, out[name])
    # intersection (truth 1500) has higher variance; sanity-bound only
    assert 0 < out["intersection"].estimate < 4500


def test_kmv_sketch_bounded(spark):
    from filesql_spark.pipeline.sketch import kmv_sketch

    rows = [("a", i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v int")
    assert kmv_sketch(df, "g", "v", k=16).count() == 16


# ------------------------------------------------------------ triangles


def test_triangle_stats_known_graph(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: 1 triangle, 4 nodes,
    4 edges, wedges = 1+1+3 = 5, closure = 3*1e6*1/5."""
    from filesql_spark.pipeline.graph import triangle_stats

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long"
    )
    r = triangle_stats(edges).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 4, 5, 1)
    assert r.closure_ppm == 600000


def test_triangle_stats_direction_and_dup_invariant(spark):
    """Reversed/duplicate edges collapse to the same canonical census."""
    from filesql_spark.pipeline.graph import triangle_stats

    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (3, 1), (4, 3)], "doc_a long, doc_b long"
    )
    r = triangle_stats(edges).collect()[0]
    assert (r.n_edges, r.n_triangles) == (4, 1)


# ------------------------------------------------------------ streaks


def test_user_streaks_islands(spark, sf_dir, tmp_path):
    import os

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: days 0,1,2 then 5,6 → longest 3, n_streaks 2, active 5
    for d in [0, 1, 2, 5, 6]:
        rows.append((len(rows), base + dt.timedelta(days=d), 1, "view", 1.0, "{}"))
    # user 2: two events same day → 1 streak of 1
    rows.append((len(rows), base, 2, "view", 1.0, "{}"))
    rows.append((len(rows), base + dt.timedelta(hours=3), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from filesql_spark.queries.relational import events_user_streaks

    out = {r.user_id: r for r in events_user_streaks(spark, d).collect()}
    assert (out[1].n_active_days, out[1].longest_streak, out[1].n_streaks) == (5, 3, 2)
    assert (out[2].n_active_days, out[2].longest_streak, out[2].n_streaks) == (1, 1, 1)


# ------------------------------------------------------------ bot detection


def test_bot_detection_burst_user(spark, tmp_path):
    import os

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: 25 events in 50 seconds → max_per_min >= 20 → bot
    for i in range(25):
        rows.append((len(rows), base + dt.timedelta(seconds=2 * i), 1, "view", 1.0, "{}"))
    # user 2: 5 events a day apart → human
    for i in range(5):
        rows.append((len(rows), base + dt.timedelta(days=i), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from filesql_spark.queries.pipeline_queries import events_bot_detection

    out = {r.user_id: r for r in events_bot_detection(spark, d).collect()}
    assert out[1].is_bot == 1 and out[1].max_per_min >= 20
    assert out[2].is_bot == 0 and out[2].max_per_min == 1


# ------------------------------------------------------------ hazard curve


def test_hazard_curve_arithmetic(spark, tmp_path):
    """3 signups; u1 converts day 0, u2 day 2, u3 censored.
    day 0: at_risk 3, conv 1 → hazard 333333 ppm
    day 2: at_risk 2, conv 1 → hazard 500000 ppm"""
    import os

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, base, 1, "signup", 0.0, "{}"),
        (1, base + dt.timedelta(hours=1), 1, "purchase", 1.0, "{}"),
        (2, base, 2, "signup", 0.0, "{}"),
        (3, base + dt.timedelta(days=2, hours=3), 2, "purchase", 1.0, "{}"),
        (4, base, 3, "signup", 0.0, "{}"),
        (5, base + dt.timedelta(days=9), 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from filesql_spark.queries.pipeline_queries import events_hazard_curve

    out = {r.day: r for r in events_hazard_curve(spark, d).collect()}
    assert out[0].n_at_risk == 3 and out[0].n_converted == 1
    assert out[0].hazard_ppm == 333333
    assert out[2].n_at_risk == 2 and out[2].hazard_ppm == 500000


# ------------------------------------------------------------ pareto


def test_pareto_prefix_exact_cut(spark, tmp_path):
    """Revenues 50, 30, 20 (total 100): the 80% prefix is the first two
    parts (50+30 = 80), the 20-part is excluded (cum_before 80 ≥ 80)."""
    import os

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 101, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", base),
        (2, 102, 1, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", base),
        (3, 103, 1, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", base),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "lineitem.parquet"))
    from filesql_spark.queries.relational import lineitem_pareto_share

    out = lineitem_pareto_share(spark, d).collect()
    assert [r.l_partkey for r in out] == [101, 102]
    assert out[-1].cum_share == pytest.approx(0.8)


def test_kmv_merge_lossless(spark):
    """The streaming twin's correctness claim: k smallest of
    (sketch(A) ∪ sketch(B)) == k smallest of (A ∪ B) — KMV merge is
    lossless for any batching, so the streamed sketch equals batch."""
    from pyspark.sql import Window
    from filesql_spark.pipeline.sketch import kmv_sketch

    k = 16
    a = spark.createDataFrame([("g", i) for i in range(0, 400, 2)], "g string, v int")
    b = spark.createDataFrame([("g", i) for i in range(1, 401, 2)], "g string, v int")
    full = spark.createDataFrame([("g", i) for i in range(400)], "g string, v int")
    w = Window.partitionBy("g").orderBy("h")
    merged = (
        kmv_sketch(a, "g", "v", k=k).select("g", "h")
        .unionByName(kmv_sketch(b, "g", "v", k=k).select("g", "h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    want = sorted(r.h for r in kmv_sketch(full, "g", "v", k=k).collect())
    got = sorted(r.h for r in merged.collect())
    assert got == want


def test_remove_dup_spans_semantics(spark):
    """Two docs share the same 5-token header; the shared span is excised
    from both, unique tails survive, fully-unique docs untouched."""
    import hashlib
    from filesql_spark.pipeline.text import remove_dup_spans

    header = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, header + " unique one tail"),
            (2, header + " second different ending"),
            (3, "completely different text here now"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(docs).collect()}
    assert out[1].n_removed == 5
    assert out[1].cleaned_hash == hashlib.md5(b"unique one tail").hexdigest()
    assert out[2].n_removed == 5
    assert out[3].n_removed == 0
    assert out[3].cleaned_hash == hashlib.md5(
        b"completely different text here now"
    ).hexdigest()


def test_remove_dup_spans_full_removal(spark):
    """Identical docs lose everything; the cleaned hash is md5('')."""
    import hashlib
    from filesql_spark.pipeline.text import remove_dup_spans

    docs = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(docs).collect()}
    assert out[1].n_removed == 6 and out[2].n_removed == 6
    assert out[1].cleaned_hash == hashlib.md5(b"").hexdigest()


def test_ann_recall_report_bounds(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import ann_recall_report

    r = ann_recall_report(spark, sf_dir).collect()[0]
    assert r.n_truth == r.n_queries * 5
    assert 0 <= r.n_hits <= r.n_truth
    # the pytest IVF gate is >= 0.8; keep the in-engine floor aligned
    assert r.recall_ppm >= 800_000


def test_lsh_tuning_report_consistency(spark, sf_dir):
    from filesql_spark.queries.pipeline_queries import dedup_lsh_tuning_report
    from filesql_spark.pipeline.constants import LSH_BANDS

    rows = dedup_lsh_tuning_report(spark, sf_dir).collect()
    assert len(rows) == LSH_BANDS
    r0 = rows[0]
    # distinct candidates cannot exceed the per-band pair mass total,
    # and verified pairs cannot exceed candidates
    assert r0.n_distinct_cand <= sum(r.n_cand_pairs for r in rows)
    assert r0.n_verified <= r0.n_distinct_cand
    assert 0 <= r0.precision_ppm <= 1_000_000


def test_triangle_stats_matches_bruteforce_random(spark):
    """Exact census equality vs a driver-side brute force on seeded
    random graphs (several densities)."""
    import itertools
    import random

    from filesql_spark.pipeline.graph import triangle_stats

    for seed, n_nodes, n_edges in [(3, 12, 20), (7, 20, 60), (11, 30, 120)]:
        rng = random.Random(seed)
        edges = set()
        while len(edges) < n_edges:
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
        tris = sum(
            1
            for a, b, c in itertools.combinations(sorted(adj), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        df = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
        r = triangle_stats(df).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
            len(adj), len(edges), wedges, tris,
        ), (seed, r)


def test_kmv_stream_multibatch_equals_batch(spark, tmp_path):
    """REAL batch boundaries: a 3-file source under maxFilesPerTrigger=1
    splits into several micro-batches; the merged standing sketch must
    equal the single-pass batch sketch (KMV merge losslessness), and a
    full replay with the same checkpoint must commit nothing new."""
    import os

    from filesql_spark.pipeline.sketch import kmv_sketch, kmv_theta_estimates
    from filesql_spark.streaming import kmv_sketch_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), i % 400,
         "view" if i % 3 else "purchase", 1.0, "{}")
        for i in range(900)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.repartition(3).write.parquet(os.path.join(sf, "events.parquet"))

    work = str(tmp_path / "work")
    out = kmv_sketch_stream(
        spark, sf, out_dir=f"{work}/sketch", checkpoint_dir=f"{work}/ckpt",
        k=16, max_files_per_trigger=1,
    )
    versions = sorted(
        p for p in os.listdir(f"{work}/sketch") if p.startswith("version=")
    )
    assert len(versions) >= 3  # v0 seed + at least 2 real batches

    batch = kmv_theta_estimates(
        kmv_sketch(
            df.filter(F.col("event_type").isin("view", "purchase")),
            "event_type", "user_id", k=16,
        ),
        "view", "purchase", k=16,
    )
    want = sorted(map(tuple, batch.collect()))
    got = sorted(map(tuple, out.collect()))
    assert got == want

    # replay: same dirs, checkpoint already drained -> no new versions
    out2 = kmv_sketch_stream(
        spark, sf, out_dir=f"{work}/sketch", checkpoint_dir=f"{work}/ckpt",
        k=16, max_files_per_trigger=1,
    )
    assert sorted(map(tuple, out2.collect())) == want
    assert sorted(
        p for p in os.listdir(f"{work}/sketch") if p.startswith("version=")
    ) == versions


def test_asof_tolerance_semantics(spark, tmp_path):
    """Fresh match within 7 days joins; stale order nulls out; no order
    at all nulls out — all events keep a row (LEFT as-of)."""
    import os

    base = dt.datetime(2024, 6, 1)
    events = spark.createDataFrame(
        [
            (1, base, 10, "view", 1.0, "{}"),            # order 3 days old -> match
            (2, base, 20, "view", 1.0, "{}"),            # order 30 days old -> stale
            (3, base, 30, "view", 1.0, "{}"),            # no order
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orders = spark.createDataFrame(
        [
            (100, 10, "O", 50.0, base - dt.timedelta(days=3), "1-URGENT"),
            (200, 20, "O", 60.0, base - dt.timedelta(days=30), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    events.write.parquet(os.path.join(d, "events.parquet"))
    orders.write.parquet(os.path.join(d, "orders.parquet"))
    from filesql_spark.queries.relational import asof_join_tolerance

    out = {r.event_id: r for r in asof_join_tolerance(spark, d).collect()}
    assert len(out) == 3
    assert out[1].matched == 1 and out[1].last_orderkey == 100
    assert out[1].staleness_days == 3
    assert out[2].matched == 0 and out[2].last_orderkey is None
    assert out[3].matched == 0 and out[3].last_orderkey is None


def test_open_interval_sweep_known(spark, tmp_path):
    """Orders [d0,d2] and [d1,d3]: counts 1,2 then decrements after each
    end+1 day."""
    import os

    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 1.0, d0, "1"),
            (2, 20, "O", 1.0, d0 + dt.timedelta(days=1), "1"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0 + dt.timedelta(days=2)),
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0 + dt.timedelta(days=3)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    orders.write.parquet(os.path.join(d, "orders.parquet"))
    li.write.parquet(os.path.join(d, "lineitem.parquet"))
    from filesql_spark.queries.relational import orders_open_interval_count

    rows = {r.day.date(): r.n_open for r in orders_open_interval_count(spark, d).collect()}
    assert rows[dt.date(2024, 1, 1)] == 1   # order 1 opens
    assert rows[dt.date(2024, 1, 2)] == 2   # order 2 opens
    assert rows[dt.date(2024, 1, 4)] == 1   # order 1 closed after d2
    assert rows[dt.date(2024, 1, 5)] == 0   # order 2 closed after d3


def test_kmv_partition_invariant(spark):
    """Sketch contents must not depend on input partitioning — the
    exactness contract the oracle hash and the streaming merge rely on."""
    from filesql_spark.pipeline.sketch import kmv_sketch

    rows = [("g", i * 37 % 1009) for i in range(800)]
    a = spark.createDataFrame(rows, "g string, v int").repartition(1)
    b = spark.createDataFrame(rows, "g string, v int").repartition(13, "v")
    ha = sorted(r.h for r in kmv_sketch(a, "g", "v", k=32).collect())
    hb = sorted(r.h for r in kmv_sketch(b, "g", "v", k=32).collect())
    assert ha == hb


def test_triangle_census_partition_invariant(spark):
    import random

    from filesql_spark.pipeline.graph import triangle_stats

    rng = random.Random(5)
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(25), rng.randrange(25)) for _ in range(120))
                  if a != b})
    a = spark.createDataFrame(edges, "doc_a long, doc_b long").repartition(1)
    b = spark.createDataFrame(edges, "doc_a long, doc_b long").repartition(7, "doc_a")
    ra = triangle_stats(a).collect()[0]
    rb = triangle_stats(b).collect()[0]
    assert tuple(ra) == tuple(rb)


def test_kmv_empty_set_still_reports(spark):
    """A set with zero members must still yield its row — (name, 0,
    NULL theta, NULL estimate) — not silently vanish from the report;
    NULL values never enter a sketch."""
    from filesql_spark.pipeline.sketch import kmv_sketch, kmv_theta_estimates

    rows = [("a", i) for i in range(10)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v int")
    sk = kmv_sketch(df, "g", "v", k=8)
    assert sk.count() == 8  # NULL excluded
    out = {r.set_name: r for r in kmv_theta_estimates(sk, "a", "b", k=8).collect()}
    assert set(out) == {"a", "b", "union", "intersection"}
    assert out["b"].n_kept == 0 and out["b"].theta is None
    assert out["b"].estimate is None
    assert out["intersection"].n_kept == 0
