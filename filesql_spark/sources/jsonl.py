"""JSONL / NDJSON source — beyond-reference (nao1215/filesql has no JSON
support; SURVEY §2.A stops at 5 formats), added because line-delimited
JSON is the de-facto interchange format for LLM training corpora and the
engine's pipeline operators are corpus-first.

Design:
- ``spark.read.json`` with line mode: the scan, schema inference, and
  parsing are all DISTRIBUTED (Spark samples the data cluster-side) —
  no driver-side row materialization at any size.
- Types: Spark's native JSON inference is kept (long/double/boolean/
  string, arrays and structs for nested values) — same stance as the
  Parquet path (loader.py): typed beats the reference's
  stringify-everything, and JSON *is* typed. Nested objects surface as
  Spark structs, queryable with dot paths — strictly more capable than
  flattening.
- ``mode=FAILFAST``: a malformed line is a load error, matching the
  reference's strict ingest validators (file.go parse errors), not a
  silently-NULL row.
- Codec matrix identical to CSV: gz/bz2 decompress inside the
  distributed scan (Hadoop codecs); xz/zst spill through Python like
  every other text source (compression.py scale note applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from filesql_spark.errors import EmptyFileError, FilesqlError
from filesql_spark.sources.compression import (
    SPARK_NATIVE_READ,
    decompress_to_temp,
)
from filesql_spark.sources.detect import Compression


def read_jsonl(
    spark: SparkSession, path: str, compression: Compression
) -> tuple[DataFrame, str | None]:
    """Read one JSONL file → (typed DataFrame, optional temp-file path)."""
    src, tmp = path, None
    if compression not in SPARK_NATIVE_READ:
        src = decompress_to_temp(path, compression, ".jsonl")
        tmp = src
    try:
        df = spark.read.option("mode", "FAILFAST").json(src)
    except Exception as exc:  # Spark wraps parse errors in analysis errors
        raise FilesqlError(f"failed to parse JSONL {path}: {exc}") from exc
    if not df.columns:
        # zero parsed keys: empty file or only blank lines
        raise EmptyFileError(f"empty JSONL file: {path}")
    return df, tmp
