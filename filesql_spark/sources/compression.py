"""Compression codecs (reference: compression.go).

Read side: gzip / bzip2 / xz / zstd (compression.go:33-70).
Write side: gzip / xz / zstd; bzip2 write is an explicit error, matching the
reference (compression.go:82-84).

Spark's CSV reader decompresses ``.gz``/``.bz2`` natively (Hadoop codecs);
``.xz``/``.zst`` have no JVM codec in this deployment, so those are
decompressed through Python to a spill file before the Spark read. zstd
rides pyarrow's bundled codec (no zstandard wheel needed).

Scale note: Python-side decompression is a single-node step, as in the
reference (whole-stream reads, compression.go:150-176). On a cluster you'd
pre-decompress to object storage or install the Hadoop zstd native codec;
gz/bz2 stay fully distributed here.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import os
import shutil
import tempfile
from typing import BinaryIO

from filesql_spark.errors import FilesqlError
from filesql_spark.sources.detect import Compression

# Codecs Spark/Hadoop handles natively inside spark.read.csv/text
SPARK_NATIVE_READ = {Compression.NONE, Compression.GZ, Compression.BZ2}


def open_reader(path: str, compression: Compression) -> BinaryIO:
    """Binary stream of decompressed content (compression.go:33-70)."""
    if compression == Compression.NONE:
        return open(path, "rb")
    if compression == Compression.GZ:
        return gzip.open(path, "rb")  # type: ignore[return-value]
    if compression == Compression.BZ2:
        return bz2.open(path, "rb")  # type: ignore[return-value]
    if compression == Compression.XZ:
        return lzma.open(path, "rb")  # type: ignore[return-value]
    if compression == Compression.ZSTD:
        return _ZstdReader(path)  # type: ignore[return-value]
    raise FilesqlError(f"unknown compression: {compression}")


def _ZstdReader(path: str):
    """Streaming zstd decompression via pyarrow (no zstandard wheel here)."""
    import pyarrow as pa

    return pa.input_stream(path, compression="zstd")


def decompress_to_temp(path: str, compression: Compression, suffix: str) -> str:
    """Spill a decompressed copy for formats Spark must read from a plain
    file. Caller owns deletion."""
    fd, tmp = tempfile.mkstemp(suffix=suffix, prefix="filesql_spark_")
    try:
        with os.fdopen(fd, "wb") as out, open_reader(path, compression) as src:
            shutil.copyfileobj(src, out, length=1 << 20)
    except BaseException:
        os.unlink(tmp)
        raise
    return tmp


def compress_bytes(data: bytes, compression: Compression) -> bytes:
    """Write-side codec (compression.go:73-103)."""
    if compression == Compression.NONE:
        return data
    if compression == Compression.GZ:
        return gzip.compress(data)
    if compression == Compression.BZ2:
        # Parity: the reference refuses bzip2 output (compression.go:82-84)
        raise FilesqlError("bzip2 compression is not supported for writing")
    if compression == Compression.XZ:
        return lzma.compress(data)
    if compression == Compression.ZSTD:
        import pyarrow as pa

        return pa.Codec("zstd").compress(data, asbytes=True)
    raise FilesqlError(f"unknown compression: {compression}")
