"""Ingestion layer: format detection, path walking, per-format readers.

Mirrors the reference's Tier-A surface (SURVEY.md §2.A): CSV/TSV/LTSV/
Parquet/XLSX, each optionally gz/bz2/xz/zst-compressed, one table per file
(one per Excel sheet), with sample-bounded type inference.
"""

from filesql_spark.sources.detect import Compression, FileFormat, detect_file_type
from filesql_spark.sources.walker import collect_files_from_paths

__all__ = ["FileFormat", "Compression", "detect_file_type", "collect_files_from_paths"]
