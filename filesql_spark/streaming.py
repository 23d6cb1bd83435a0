"""Structured Streaming operators.

The reference has NO streaming surface (SURVEY §2.10 — its "streaming" is
chunked batch ingestion), so this module is pure beyond-reference capability:
the same tumbling-window aggregate the batch path exposes, run under the
streaming engine with a watermark for late data.

Pattern: readStream → withWatermark → window agg → writeStream with
``availableNow`` (process everything present, then stop) into a memory
sink. On a cluster the sink becomes kafka/delta and the trigger a real
micro-batch cadence; the plan is identical.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesql_spark.queries import load_table


def _file_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    stream_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over one driver parquet table.

    Declares the RAW file schema (events.ts is int64 nanos under
    nanosAsLong) and normalizes the timestamp inside the stream like the
    batch path. FileStreamSource requires a directory; the single file is
    exposed through a symlinked temp dir. Pass a stable ``stream_dir``
    when the query uses a durable checkpoint — the checkpoint pins the
    source path, so a fresh random dir would break resume."""
    from filesql_spark.queries import _pin_session_confs

    _pin_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
    if stream_dir is None:
        stream_dir = tempfile.mkdtemp(prefix="filesql_stream_")
    else:
        os.makedirs(stream_dir, exist_ok=True)
    target = os.path.abspath(f"{sf_dir}/{table}.parquet")
    if os.path.isdir(target):
        # directory-shaped table (multi-part parquet): symlink each data
        # file individually — FileStreamSource lists plain files, and
        # per-file links give maxFilesPerTrigger real batch boundaries
        links = {
            f"{stream_dir}/{table}_{f}": os.path.join(target, f)
            for f in sorted(os.listdir(target))
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        }
    else:
        links = {f"{stream_dir}/{table}.parquet": target}
    for link, tgt in links.items():
        if os.path.lexists(link):
            # A stable stream_dir is reused across runs because the
            # checkpoint pins the source path. Reusing it against a
            # DIFFERENT dataset would silently stream the old data —
            # fail loudly instead.
            existing = os.readlink(link)
            if existing != tgt:
                raise ValueError(
                    f"stream dir {stream_dir!r} already streams {existing!r}; "
                    f"refusing to reuse it for {tgt!r} — use a fresh "
                    "stream_dir/checkpoint per dataset"
                )
        else:
            os.symlink(tgt, link)
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        # availableNow honors this as a per-batch cap, so a multi-file
        # source splits into several micro-batches — the multi-batch
        # merge tests use it to exercise real batch boundaries
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(stream_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # otherwise); identity cast under the pinned UTC session timezone.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(agg: DataFrame, prefix: str, mode: str = "complete") -> str:
    """Start an availableNow writeStream into a memory sink; returns the
    sink table name after the run completes."""
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    return sink


def _await_or_raise(q, timeout: int) -> None:
    """awaitTermination returns False when the query is STILL RUNNING at
    the timeout; proceeding then would read a partial result. Stop the
    query and fail loudly instead."""
    if not q.awaitTermination(timeout=timeout):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish within "
            f"{timeout}s; stopped it rather than return a partial result"
        )


def events_hourly_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly per-type event counts/sums as a streaming query; returns the
    materialized result DataFrame after the availableNow run completes."""
    from filesql_spark.queries.relational import cents

    stream = _file_stream(spark, sf_dir, "events")

    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    return spark.table(_run_to_memory(agg, "events_hourly"))


def events_session_stream(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows under the streaming engine — stateful
    session aggregation (merging windows) rather than a fixed tumbling
    grid; returns the materialized result after the availableNow run.

    Same plan as the batch twin (events_sessionize): complete-mode output
    over a finite source equals the batch gaps-and-islands result row for
    row (asserted in tests/test_pipeline.py). On a cluster the trigger
    becomes a micro-batch cadence and the sink kafka/delta; the watermark
    bounds session state so late events merge or drop deterministically.
    """
    from filesql_spark.queries.relational import cents

    stream = _file_stream(spark, sf_dir, "events")

    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
            (
                F.unix_micros(F.col("last_ts").cast("timestamp"))
                - F.unix_micros(F.col("w.start").cast("timestamp"))
            ).alias("session_us"),
        )
    )
    return spark.table(_run_to_memory(agg, "events_sessions"))


def events_user_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running totals (count, exact cents sum, first/last event time)
    maintained in explicit GroupState — the API for stateful logic the
    built-in window aggregates can't express.

    Determinism contract: the availableNow trigger over the single-file
    source runs exactly ONE micro-batch, so each user's state sees all its
    rows once and the emitted row equals the batch GROUP BY — which is the
    oracle. Sums are integer cents (order-independent), min/max are
    order-free, so partition order inside the batch cannot change the
    output. On a cluster the same operator runs continuously with a
    timeout-based emission policy.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    stream = _file_stream(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_cents", LongType()),
            StructField("first_ts", TimestampType()),
            StructField("last_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("cents", LongType()),
            StructField("first_us", LongType()),
            StructField("last_us", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, cents, first_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            # normalize to epoch micros regardless of the pandas unit
            # (Arrow may deliver datetime64[ns] or [us])
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, cents, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "first_ts": pd.Series([first_us], dtype="int64").astype(
                    "datetime64[us]"
                ),
                "last_ts": pd.Series([last_us], dtype="int64").astype(
                    "datetime64[us]"
                ),
            }
        )

    result = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    sink = _run_to_memory(result, "events_user_state", mode="update")
    return spark.table(sink).select(
        "user_id",
        "n_events",
        (F.col("total_cents") / 100.0).alias("total_value"),
        "first_ts",
        "last_ts",
    )


def documents_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over the documents table: group by content
    hash, emit the canonical representative (lowest doc_id) and the copy
    count — the dedup ledger a continuously-ingesting corpus pipeline
    maintains.

    Deterministic by construction (min/count are arrival-order-free,
    complete mode over an availableNow run), so the batch GROUP BY is the
    exact oracle. Content state here is unbounded like any global-key
    streaming agg; a production deployment bounds it with
    ``dropDuplicatesWithinWatermark`` (dedup only within the late-data
    horizon) or ages state out by retention policy — the grouping shape
    is unchanged.
    """
    stream = _file_stream(spark, sf_dir, "documents")
    agg = (
        stream.select(F.md5(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )
    return spark.table(_run_to_memory(agg, "documents_dedup"))


def events_enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined to the
    customer→nation dimension (static side), aggregated per (nation,
    event_type) — the canonical streaming-ETL enrichment shape.

    The static side is a batch DataFrame joined into every micro-batch;
    dimension tables are broadcast (plan-wise identical to the batch
    path's broadcast-hash join), so the stream never shuffles for the
    join — only the final aggregate shuffles on the tiny group key. At
    scale the dimension refreshes by re-reading per micro-batch; no
    stream-stream state is involved. Exact integer-cents money sum.
    """
    stream = _file_stream(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = F.broadcast(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
            F.col("c_custkey").alias("user_id"), "n_name"
        )
    )
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        stream.join(dim, "user_id")
        .groupBy("n_name", "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents) / 100.0).alias("total_value"),
        )
    )
    return spark.table(_run_to_memory(agg, "events_enriched"))


def events_sliding_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Sliding (hopping) 1-hour/15-minute window aggregate under
    Structured Streaming — the streaming twin of the batch
    ``events_sliding_window`` query, sharing its oracle.

    Each event fans into 4 overlapping windows map-side (generator); the
    fan-out collapses in the partial aggregation exactly as in batch, so
    only per-(window, type) group rows hit the state store. The watermark
    bounds state: windows older than (watermark + window length) are
    finalized and evicted — without it, a hopping window's state grows
    forever.
    """
    from filesql_spark.queries.relational import cents

    stream = _file_stream(spark, sf_dir, "events")
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    return spark.table(_run_to_memory(agg, "events_sliding"))


def events_interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each ``click`` joined to the same
    user's ``purchase`` events landing within ``max_gap`` after it — the
    conversion-funnel join every event pipeline needs (beyond-reference;
    the reference has no streaming surface, SURVEY §2.10).

    This is Spark's watermarked stream-stream inner join: BOTH sides carry
    a watermark and the join condition bounds purchase_ts to a finite
    window after click_ts, so the state store can evict a buffered click
    once the purchase-side watermark passes click_ts + max_gap (and vice
    versa) — without the time bound, both sides would buffer forever.
    State is partitioned by the equi-key (user_id), so at cluster scale
    each task holds only its users' in-flight window; the availableNow
    run here produces exactly the batch join's rows (arrival-order-free),
    which is why a plain SQL self-join is the exact oracle.
    """
    clicks = (
        _file_stream(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        _file_stream(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("gap_us"),
    )
    return spark.table(_run_to_memory(joined, "events_funnel", mode="append"))


def events_dedup_keys_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming key dedup via ``dropDuplicatesWithinWatermark``: emit
    each (user_id, event_type) pair once. Unlike plain dropDuplicates
    (whose key state grows forever), the within-watermark variant evicts
    a key's state once the watermark passes its event time — the only
    sane config for an unbounded stream at cluster scale.

    Determinism: which physical row survives depends on arrival order,
    so the operator projects to the KEY COLUMNS (+ts for the watermark)
    and returns keys only — the emitted set equals DISTINCT keys, the
    exact oracle."""
    stream = _file_stream(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return spark.table(_run_to_memory(deduped, "events_key_dedup", mode="append"))


def events_hourly_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Hourly aggregate streamed into parquet through ``foreachBatch``
    with an idempotent, exactly-once write: each micro-batch lands in a
    ``batch_id=N`` subdirectory and a batch that already exists is
    skipped, so a retried/restarted batch (Spark replays the last
    uncommitted batch after failure) cannot double-write. Paired with
    the checkpoint, a re-run of the whole query is a no-op — asserted in
    tests by running twice against the same checkpoint.

    Complete-mode semantics: EVERY micro-batch emits the FULL aggregate
    (a snapshot, not a delta), so when the source grows and a later run
    processes batch N+1, the older batch dirs are superseded — readers
    must see exactly one snapshot. The read-back therefore returns ONLY
    the highest committed ``batch_id`` dir; unioning all batch dirs
    would double-count every group (asserted in tests by streaming a
    grown source through the same checkpoint). Keeping the superseded
    dirs on disk (rather than delete-and-swap) keeps the commit
    append-only and the replay check trivial; a janitor or table format
    (delta/iceberg) handles retention at scale.

    This is the cluster sink shape: at scale ``out_dir`` is a table
    location (delta/iceberg make the commit transactional; plain parquet
    here makes the idempotency explicit), and foreachBatch is also where
    batch-only operations (MERGE, JDBC upserts) run.

    Returns the read-back result (the latest snapshot) for verification.
    """
    import os as _os

    from filesql_spark.queries.relational import cents

    # stable source dir derived from the checkpoint: the checkpoint pins
    # the FileStreamSource path, so re-runs must see the same directory
    stream = _file_stream(
        spark, sf_dir, "events", stream_dir=checkpoint_dir + "_src"
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # pairing guard (family of the ADVICE r8 cdc/kmv finding): a
        # legitimate run never sees a COMMITTED batch dir beyond its own
        # id (a crash-replay re-runs only the last uncommitted batch), so
        # higher committed ids mean a foreign out_dir whose stale top
        # snapshot would win the read-back below — fail loudly instead
        ahead = [
            d
            for d in (_os.listdir(out_dir) if _os.path.isdir(out_dir) else [])
            if d.startswith("batch_id=")
            and int(d.split("=", 1)[1]) > batch_id
            and _os.path.exists(_os.path.join(out_dir, d, "_SUCCESS"))
        ]
        if ahead:
            raise RuntimeError(
                f"events_hourly_to_parquet: out_dir holds committed "
                f"{sorted(ahead)} beyond stream batch {batch_id} — "
                "mismatched out_dir/checkpoint pairing; use a fresh "
                "out_dir with a fresh checkpoint"
            )
        target = _os.path.join(out_dir, f"batch_id={batch_id}")
        if _os.path.exists(_os.path.join(target, "_SUCCESS")):
            return  # replayed batch: already committed, skip
        batch_df.write.mode("overwrite").parquet(target)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    # complete mode: each batch dir is a full snapshot — read ONLY the
    # latest committed one (highest batch_id with a _SUCCESS marker)
    committed = sorted(
        int(d.split("=", 1)[1])
        for d in (_os.listdir(out_dir) if _os.path.isdir(out_dir) else [])
        if d.startswith("batch_id=")
        and _os.path.exists(_os.path.join(out_dir, d, "_SUCCESS"))
    )
    if not committed:
        # a re-run over a committed checkpoint processes zero batches
        return spark.createDataFrame(
            [], "window_start timestamp, event_type string, n long, total_value double"
        )
    return spark.read.parquet(
        _os.path.join(out_dir, f"batch_id={committed[-1]}")
    )


def cdc_apply_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming CDC apply: a change feed (delete/upsert ops on the
    documents table) is merged into a standing snapshot via
    ``foreachBatch`` + ``pipeline.snapshot.merge_apply`` — the streaming
    twin of the batch ``cdc_merge_apply`` entry, and the composition the
    README's incremental-pipeline story ends in: dedup, diff, and apply
    all delta-incremental.

    Exactly-once shape (same discipline as events_hourly_to_parquet):
    snapshots are versioned append-only dirs ``version=N`` — version 0
    seeds the standing base, each micro-batch B reads the latest
    committed snapshot, merge-applies its changes (one broadcast anti
    join; the base is never shuffled), and commits ``version=B+1``; a
    replayed batch sees its version dir already committed and skips. At
    scale the version dir becomes a delta/iceberg table version and
    foreachBatch runs MERGE INTO — the plan is identical.

    Each key's changes must arrive within one micro-batch for the final
    state to be order-independent (true here: the feed is one parquet
    file; in production the feed is keyed/log-compacted upstream).

    Returns the latest snapshot as (doc_id, content_hash).
    """
    import os as _os

    from filesql_spark.pipeline.snapshot import merge_apply

    def _latest(d: str) -> int | None:
        if not _os.path.isdir(d):
            return None
        vs = [
            int(p.split("=", 1)[1])
            for p in _os.listdir(d)
            if p.startswith("version=")
            and _os.path.exists(_os.path.join(d, p, "_SUCCESS"))
        ]
        return max(vs) if vs else None

    # seed the standing base (version=0): all documents, unchanged
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if _latest(out_dir) is None:
        base.write.mode("overwrite").parquet(_os.path.join(out_dir, "version=0"))

    # the change feed: doc_id % 5 == 0 rows carry an op (delete / upsert)
    stream = _file_stream(
        spark,
        sf_dir,
        "documents",
        stream_dir=checkpoint_dir + "_src",
        max_files_per_trigger=max_files_per_trigger,
    )
    changes = stream.filter(F.expr("doc_id % 5 = 0")).select(
        "doc_id",
        F.when(F.expr("doc_id % 10 = 0"), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.when(F.expr("doc_id % 10 = 5"), F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = _os.path.join(out_dir, f"version={batch_id + 1}")
        cur = _latest(out_dir)
        # out_dir/checkpoint pairing guard (same as kmv_sketch_stream,
        # ADVICE r8): a legitimate replay of batch N finds version N
        # (uncommitted) or N+1 (committed, checkpoint not advanced); a
        # fresh checkpoint against a stale out_dir would otherwise
        # silently skip batches — or worse, apply batch 0's changes on
        # top of a later snapshot
        if cur not in (batch_id, batch_id + 1):
            raise RuntimeError(
                f"cdc_apply_stream: out_dir at version={cur} does not pair "
                f"with stream batch {batch_id} (expected version {batch_id} "
                f"or {batch_id + 1}); use a fresh out_dir with a fresh "
                "checkpoint"
            )
        if _os.path.exists(_os.path.join(target, "_SUCCESS")):
            return  # replayed batch: already committed
        snapshot = spark.read.parquet(_os.path.join(out_dir, f"version={cur}"))
        merged = merge_apply(snapshot, batch_df.select("doc_id", "op", "text"), "doc_id")
        merged.write.mode("overwrite").parquet(target)

    q = (
        changes.writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    latest = _latest(out_dir)
    snap = spark.read.parquet(_os.path.join(out_dir, f"version={latest}"))
    return snap.select("doc_id", F.md5("text").alias("content_hash"))


def documents_cms_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch over the document token stream: the
    running (r, bucket) counter table maintained as a streaming
    aggregation — the frequency monitor an ingest pipeline keeps to
    watch token distributions WITHOUT unbounded state.

    This inverts the usual streaming-aggregation state problem: a plain
    per-token count's state grows with vocabulary (unbounded on an open
    stream), while the CMS counters are capped at depth×width rows BY
    CONSTRUCTION (pipeline/sketch.py cms_counters) — the hash projection
    bounds the state, no watermark needed. Counter sums are
    arrival-order-free integers, so the batch sketch is the exact
    oracle, and the complete-mode sink re-emits the merged sketch each
    micro-batch (kilobytes).
    """
    from filesql_spark.pipeline.sketch import cms_counters
    from filesql_spark.pipeline.text import tokens

    stream = _file_stream(spark, sf_dir, "documents")
    counted = stream.select(
        F.explode(tokens(F.col("text"))).alias("tok"), F.lit(1).alias("c")
    )
    counters = cms_counters(counted, "tok", "c")
    return spark.table(_run_to_memory(counters, "documents_cms"))


def kmv_sketch_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 64,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming KMV/theta distinct-sketch maintenance: the standing
    per-group k-minimum-hash table is merged with each micro-batch's
    sketch via ``foreachBatch`` — the streaming twin of the batch
    ``sketch_kmv_theta`` entry.

    Why this is exactly-once AND exactly-right: KMV merge is
    **idempotent, commutative, and lossless** — the k smallest of
    (standing ∪ batch-k-smallest) is EXACTLY the k smallest of all
    values ever seen, for any batch boundaries and any replay order. So
    the streamed sketch equals the batch sketch bit-for-bit and the two
    entries share one oracle — a stronger statement than watermark-
    bounded approximations can make. State is ≤ k rows per group BY
    CONSTRUCTION (like the CMS twin), no watermark needed on an open
    stream.

    Versioned-commit discipline is cdc_apply_stream's: each batch reads
    the latest committed ``version=N`` sketch, merges, commits
    ``version=N+1``; a replayed batch sees its version already
    committed and skips. At scale the version dir is a delta/iceberg
    table and the merge is a k-row MERGE — kilobytes per commit.

    Returns the final 4-row theta estimate table (view/purchase/
    union/intersection).
    """
    import os as _os

    from pyspark.sql import Window

    from filesql_spark.pipeline.sketch import kmv_sketch, kmv_theta_estimates

    def _latest(d: str) -> int | None:
        if not _os.path.isdir(d):
            return None
        vs = [
            int(p.split("=", 1)[1])
            for p in _os.listdir(d)
            if p.startswith("version=")
            and _os.path.exists(_os.path.join(d, p, "_SUCCESS"))
        ]
        return max(vs) if vs else None

    if _latest(out_dir) is None:
        spark.createDataFrame([], "g string, h long, rn int").write.mode(
            "overwrite"
        ).parquet(_os.path.join(out_dir, "version=0"))

    stream = _file_stream(
        spark,
        sf_dir,
        "events",
        stream_dir=checkpoint_dir + "_src",
        max_files_per_trigger=max_files_per_trigger,
    ).filter(F.col("event_type").isin("view", "purchase"))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = _os.path.join(out_dir, f"version={batch_id + 1}")
        cur = _latest(out_dir)
        # Fail loudly on out_dir/checkpoint mismatch (mirrors the
        # _file_stream stream_dir guard): a legitimate replay of batch N
        # finds the out_dir at version N (uncommitted) or N+1 (committed,
        # checkpoint not yet advanced).  Anything else — e.g. a fresh
        # checkpoint (batch_id restarts at 0) pointed at an out_dir
        # holding prior versions — would silently skip every new batch.
        if cur not in (batch_id, batch_id + 1):
            raise RuntimeError(
                f"kmv_sketch_stream: out_dir at version={cur} does not pair "
                f"with stream batch {batch_id} (expected version {batch_id} "
                f"or {batch_id + 1}); refusing to merge into a mismatched "
                "out_dir — use a fresh out_dir with a fresh checkpoint"
            )
        if _os.path.exists(_os.path.join(target, "_SUCCESS")):
            return  # replayed batch: already committed
        standing = spark.read.parquet(_os.path.join(out_dir, f"version={cur}"))
        batch_sk = kmv_sketch(batch_df, "event_type", "user_id", k=k)
        w = Window.partitionBy("g").orderBy("h")
        merged = (
            standing.select("g", "h")
            .unionByName(batch_sk.select("g", "h"))
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
        )
        merged.write.mode("overwrite").parquet(target)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    latest = _latest(out_dir)
    sk = spark.read.parquet(_os.path.join(out_dir, f"version={latest}"))
    return kmv_theta_estimates(sk, "view", "purchase", k=k)
