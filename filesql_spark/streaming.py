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


def events_hourly_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly per-type event counts/sums as a streaming query; returns the
    materialized result DataFrame after the availableNow run completes."""
    from filesql_spark.queries import _pin_session_confs
    from filesql_spark.queries.relational import cents

    # declare the RAW file schema (ts is int64 nanos under nanosAsLong);
    # the timestamp conversion happens inside the stream, like the batch path
    _pin_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # FileStreamSource requires a directory; expose the single file through one
    stream_dir = tempfile.mkdtemp(prefix="filesql_stream_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), f"{stream_dir}/events.parquet")
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir)
    # the driver table stores ns-timestamps read as long; normalize like batch
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

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

    sink = f"events_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return spark.table(sink)


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
    from filesql_spark.queries import _pin_session_confs
    from filesql_spark.queries.relational import cents

    _pin_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream_dir = tempfile.mkdtemp(prefix="filesql_stream_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"), f"{stream_dir}/events.parquet"
    )
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

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
            (F.unix_micros("last_ts") - F.unix_micros(F.col("w.start"))).alias(
                "session_us"
            ),
        )
    )

    sink = f"events_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return spark.table(sink)
