"""Round-9 regression tests: ADVICE r8 fixes and new surface."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _tiny_events_sf(spark, tmp_path) -> str:
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), i % 40,
         "view" if i % 3 else "purchase", 1.0, "{}")
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.repartition(3).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_kmv_stream_rejects_mismatched_out_dir(spark, tmp_path):
    """A fresh checkpoint pointed at an out_dir holding prior versions must
    fail loudly, not silently skip every batch (ADVICE r8)."""
    from filesql_spark.streaming import kmv_sketch_stream

    sf = _tiny_events_sf(spark, tmp_path)
    work = str(tmp_path / "work")
    kmv_sketch_stream(
        spark, sf, out_dir=f"{work}/sketch", checkpoint_dir=f"{work}/ckpt",
        k=16, max_files_per_trigger=1,
    )
    versions = [
        p for p in os.listdir(f"{work}/sketch") if p.startswith("version=")
    ]
    assert len(versions) >= 3
    # same out_dir, FRESH checkpoint: batch_id restarts at 0 while the
    # out_dir sits at a later version — the guard must raise, and the
    # out_dir must gain no new version
    with pytest.raises(Exception) as exc:
        kmv_sketch_stream(
            spark, sf, out_dir=f"{work}/sketch",
            checkpoint_dir=f"{work}/ckpt_fresh", k=16,
            max_files_per_trigger=1,
        )
    assert "does not pair" in str(exc.value)
    after = [
        p for p in os.listdir(f"{work}/sketch") if p.startswith("version=")
    ]
    assert sorted(after) == sorted(versions)


def test_lsh_tuning_report_threshold_param(spark):
    """jaccard_threshold threads through to exact verification: a looser
    bar verifies at least as many candidates (ADVICE r8)."""
    from filesql_spark.pipeline.dedup import lsh_tuning_report

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        "completely different content about spark shuffles and parquet",
        "completely different material about flink state and arrow",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    strict = lsh_tuning_report(df, jaccard_threshold=0.9).collect()
    loose = lsh_tuning_report(df, jaccard_threshold=0.1).collect()
    assert loose[0].n_verified >= strict[0].n_verified
    # candidate generation is threshold-independent
    assert loose[0].n_distinct_cand == strict[0].n_distinct_cand


def test_stage_metrics_pairs_serve_equivalence(spark):
    """clean_corpus_metrics served from a standing full-corpus pair table
    equals the fresh per-call derivation (the semi-join restriction
    argument in compose._near_final)."""
    from filesql_spark.pipeline.compose import clean_corpus_metrics
    from filesql_spark.pipeline.dedup import minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog and then naps "
        "under the old oak tree near the river bend every afternoon"
    )
    texts = [base, base + " x", "short doc", base.replace("fox", "cat")] + [
        f"unique document number {i} with its own words entirely " * 3
        for i in range(6)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    fresh = clean_corpus_metrics(df, min_tokens=5).collect()
    served = clean_corpus_metrics(
        df, min_tokens=5, pairs=minhash_lsh_pairs(df)
    ).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, fresh))


def test_groups_frame_semantics_fixture(spark):
    """Pin GROUPS-frame semantics against a hand-computed example (both
    the query and its oracle reduce GROUPS to dense_rank+RANGE, so one
    literal fixture anchors the semantics itself)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (3, 40), (3, 50), (3, 60), (5, 70)],
        "q int, v int",
    )
    ranked = df.withColumn(
        "grp", F.dense_rank().over(Window.orderBy("q"))
    )
    w = Window.orderBy("grp").rangeBetween(-1, 1)
    got = {
        (r.q, r.v): r.s
        for r in ranked.select("q", "v", F.sum("v").over(w).alias("s")).collect()
    }
    # GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING: whole adjacent tie-sets
    assert got[(1, 10)] == got[(1, 20)] == 60       # {1s} + {2}
    assert got[(2, 30)] == 210                       # {1s} + {2} + {3s}
    assert got[(3, 40)] == got[(3, 60)] == 250       # {2} + {3s} + {5}
    assert got[(5, 70)] == 220                       # {3s} + {5}


def test_groups_frame_sql_clear_error(spark, tmp_path):
    """A GROUPS frame through the SQL front door fails with guidance (the
    dense_rank+RANGE reduction), not Spark's opaque parse error; the
    word 'groups' as an identifier still parses."""
    import filesql_spark as fs
    from filesql_spark.errors import FilesqlError

    (tmp_path / "t.csv").write_text("id,v\n1,10\n2,20\n")
    with fs.open(str(tmp_path), spark=spark) as eng:
        with pytest.raises(FilesqlError, match="GROUPS window frames"):
            eng.query(
                "SELECT SUM(v) OVER (ORDER BY id "
                "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM t"
            )
        # 'groups' as plain identifier is untouched
        assert (
            eng.query("SELECT COUNT(*) AS groups FROM t").collect()[0].groups == 2
        )


def test_cdc_stream_rejects_mismatched_out_dir(spark, tmp_path):
    """Same pairing guard as the KMV sketch stream: a fresh checkpoint
    against an out_dir more than one version ahead must raise, not skip.
    (Batch 0 against version<=1 is indistinguishable from a legitimate
    replay and correctly skips — the detectable case needs >=2 real
    batches, hence the 3-file source under maxFilesPerTrigger=1.)"""
    import os

    from filesql_spark.streaming import cdc_apply_stream

    docs = spark.createDataFrame(
        [(i, f"text number {i}", "en", "s", 10) for i in range(60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.repartition(3).write.parquet(os.path.join(sf, "documents.parquet"))
    work = str(tmp_path / "work")
    cdc_apply_stream(
        spark, sf, f"{work}/snap", f"{work}/ckpt", max_files_per_trigger=1
    )
    versions = sorted(
        p for p in os.listdir(f"{work}/snap") if p.startswith("version=")
    )
    assert len(versions) >= 3  # seed + >=2 committed batches
    with pytest.raises(Exception) as exc:
        cdc_apply_stream(
            spark, sf, f"{work}/snap", f"{work}/ckpt_fresh",
            max_files_per_trigger=1,
        )
    assert "does not pair" in str(exc.value)
    after = sorted(
        p for p in os.listdir(f"{work}/snap") if p.startswith("version=")
    )
    assert after == versions


def test_hourly_sink_rejects_foreign_out_dir(spark, tmp_path):
    """A committed batch dir beyond the current batch id means the
    out_dir belongs to another checkpoint — the sink must raise rather
    than let the stale top snapshot win the read-back."""
    import os

    from filesql_spark.streaming import events_hourly_to_parquet

    sf = _tiny_events_sf(spark, tmp_path)
    work = str(tmp_path / "work")
    out = f"{work}/sink"
    # forge a foreign committed batch dir ahead of any real batch
    os.makedirs(f"{out}/batch_id=7")
    spark.createDataFrame(
        [], "window_start timestamp, event_type string, n long, total_value double"
    ).write.mode("overwrite").parquet(f"{out}/batch_id=7")
    with pytest.raises(Exception) as exc:
        events_hourly_to_parquet(spark, sf, out, f"{work}/ckpt")
    assert "mismatched out_dir" in str(exc.value)
