"""File format × compression detection (reference: file.go:354-443).

The reference's 25 variants (5 formats × {none, gz, bz2, xz, zst}),
plus beyond-reference JSONL (``.jsonl`` / ``.ndjson``) — the de-facto
LLM-training-corpus interchange format — and ORC (Spark-native typed
columnar, the parquet twin in Hive-flavored lakes), both under the same
codec matrix. Detection is purely extension-based, like the reference.
"""

from __future__ import annotations

import enum
import os

from filesql_spark.errors import UnsupportedFormatError


class FileFormat(enum.Enum):
    CSV = "csv"
    TSV = "tsv"
    LTSV = "ltsv"
    PARQUET = "parquet"
    XLSX = "xlsx"
    JSONL = "jsonl"
    ORC = "orc"


class Compression(enum.Enum):
    NONE = ""
    GZ = ".gz"
    BZ2 = ".bz2"
    XZ = ".xz"
    ZSTD = ".zst"


FORMAT_EXTENSIONS = {
    ".csv": FileFormat.CSV,
    ".tsv": FileFormat.TSV,
    ".ltsv": FileFormat.LTSV,
    ".parquet": FileFormat.PARQUET,
    ".xlsx": FileFormat.XLSX,
    ".jsonl": FileFormat.JSONL,
    ".ndjson": FileFormat.JSONL,
    ".orc": FileFormat.ORC,
}

COMPRESSION_EXTENSIONS = {
    ".gz": Compression.GZ,
    ".bz2": Compression.BZ2,
    ".xz": Compression.XZ,
    ".zst": Compression.ZSTD,
}

# every accepted filename suffix, e.g. ".csv", ".csv.gz", … (25 total)
SUPPORTED_SUFFIXES = [
    fmt + comp
    for fmt in FORMAT_EXTENSIONS
    for comp in ["", *COMPRESSION_EXTENSIONS.keys()]
]


def detect_file_type(path: str) -> tuple[FileFormat, Compression]:
    """Map a path to (format, compression); raise on unsupported extensions.

    Reference: detectFileType, file.go:354-443.
    """
    name = os.path.basename(path).lower()
    base, ext = os.path.splitext(name)
    compression = Compression.NONE
    if ext in COMPRESSION_EXTENSIONS:
        compression = COMPRESSION_EXTENSIONS[ext]
        base, ext = os.path.splitext(base)
    fmt = FORMAT_EXTENSIONS.get(ext)
    if fmt is None:
        raise UnsupportedFormatError(
            f"unsupported file type: {path} (supported: "
            f"{', '.join(sorted(FORMAT_EXTENSIONS))} × "
            f"{{none, .gz, .bz2, .xz, .zst}})"
        )
    return fmt, compression


def is_supported(path: str) -> bool:
    try:
        detect_file_type(path)
        return True
    except UnsupportedFormatError:
        return False
