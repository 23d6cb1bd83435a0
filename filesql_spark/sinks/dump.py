"""DumpDatabase equivalent (reference: filesql.go:179-427, 709-962).

Every table → one single file ``{dir}/{table}.{ext}[.codec]``. The reference
writes single files from a single process; Spark writes directories of part
files — so CSV/TSV/LTSV go through ``coalesce(1)`` (one writer task streams
the whole table; no driver materialization) and the part file is renamed.
Parquet export keeps Spark's typed writer. XLSX is driver-side by nature
(ZIP container) — bounded exactly like the reference's excelize path
(README.md:385-386).

Codec matrix: gzip JVM-native for text formats; xz/zst re-compressed through
Python (same plumbing as the read side); bz2 write errors, matching
compression.go:82-84. Parquet rejects external compression, matching
filesql.go:716-719.

NULL → "" on text formats (filesql.go:370-375, 413-415).

Scale path: ``dump(..., single_file=False)`` skips coalesce(1) and writes a
standard partitioned directory per table — the cluster-sized export the
reference cannot do.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filesql_spark.errors import FilesqlError
from filesql_spark.sinks.xlsx_writer import write_xlsx
from filesql_spark.sources.detect import Compression, detect_file_type

_TEXT_FORMATS = {"csv", "tsv", "ltsv", "jsonl"}
_CODECS = {None: Compression.NONE, "gz": Compression.GZ, "bz2": Compression.BZ2,
           "xz": Compression.XZ, "zst": Compression.ZSTD}


def dump_database(
    engine,
    output_dir: str,
    format: str = "csv",  # noqa: A002
    compression: str | None = None,
    single_file: bool = True,
) -> list[str]:
    """Write every table; returns the created paths."""
    fmt = format.lower()
    if fmt not in (*_TEXT_FORMATS, "parquet", "orc", "xlsx"):
        raise FilesqlError(f"unsupported dump format: {format}")
    codec = _CODECS.get(compression if compression != "" else None)
    if codec is None:
        raise FilesqlError(f"unsupported dump compression: {compression}")
    if codec == Compression.BZ2:
        raise FilesqlError("bzip2 compression is not supported for writing")
    if fmt in ("parquet", "orc") and codec != Compression.NONE:
        raise FilesqlError(f"{fmt} does not support external compression")
    if fmt == "xlsx" and codec != Compression.NONE and codec != Compression.GZ:
        # reference compresses xlsx via generic writer path; keep gz only
        pass

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for name in engine.table_names():
        df = engine.table(name)
        ext = fmt + (codec.value if codec else "")
        out_path = os.path.join(output_dir, f"{name}.{ext}")
        _write_table(df, out_path, fmt, codec, single_file)
        written.append(out_path)
    return written


def dump_table_to_path(df: DataFrame, original_path: str) -> None:
    """Auto-save overwrite mode (save.go:386-399): rewrite the original file
    in its original format+codec."""
    fmt, codec = detect_file_type(original_path)
    _write_table(df, original_path, fmt.value, codec, single_file=True)


def _write_table(
    df: DataFrame, out_path: str, fmt: str, codec: Compression, single_file: bool
) -> None:
    if fmt == "xlsx":
        _write_xlsx_table(df, out_path)
        return

    src = df.coalesce(1) if single_file else df

    if fmt in ("parquet", "orc"):
        _finish_spark_write(src.write.format(fmt), out_path, single_file)
        return

    if fmt == "jsonl":
        # line-delimited JSON via Spark's native json writer (one object
        # per line, typed values preserved — beyond-reference, see
        # sources/jsonl.py). ignoreNullFields=false keeps explicit
        # ``"col": null`` entries so an all-null column survives the
        # round trip with its name (values round-trip losslessly; an
        # *empty* table still re-reads as EmptyFileError since zero JSON
        # lines carry no schema).
        _finish_spark_write(
            src.write.format("json")
            .option("ignoreNullFields", "false")
            .option("compression", "gzip" if codec == Compression.GZ else "none"),
            out_path,
            single_file,
        )
        _recompress_output(out_path, codec, single_file)
        return

    if fmt in ("csv", "tsv"):
        delimiter = "\t" if fmt == "tsv" else ","
        writer = (
            _stringified(src)
            .write.format("csv")
            .option("header", True)
            .option("delimiter", delimiter)
            .option("nullValue", "")
            .option("emptyValue", "")
            # RFC-4180 output: escape a quote by doubling it, like the
            # reference's encoding/csv writer — Spark's default backslash
            # escaping would not round-trip through RFC readers
            .option("escape", '"')
        )
    else:  # ltsv: k:v pairs joined by tabs, one line per record (filesql.go:396-427)
        cols = [
            F.concat(F.lit(f"{c}:"), F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in src.columns
        ]
        writer = src.select(F.concat_ws("\t", *cols).alias("value")).write.format("text")

    if codec == Compression.GZ:
        writer = writer.option("compression", "gzip")

    _finish_spark_write(writer, out_path, single_file)

    _recompress_output(out_path, codec, single_file)


def _stringified(df: DataFrame) -> DataFrame:
    # reference stringifies every value with %v on export (filesql.go:326-334)
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def _finish_spark_write(writer, out_path: str, single_file: bool) -> None:
    """Write to a temp dir, then promote the single part file to out_path.

    The one writer task streams the table — never a driver-side collect.
    """
    if not single_file:
        writer.mode("overwrite").save(out_path + ".d")
        return
    tmpdir = tempfile.mkdtemp(prefix="filesql_dump_")
    try:
        target = os.path.join(tmpdir, "out")
        writer.mode("overwrite").save(target)
        parts = sorted(
            p
            for p in glob.glob(os.path.join(target, "part-*"))
            if not p.endswith(".crc")
        )
        if len(parts) == 1:
            shutil.move(parts[0], out_path)
        else:
            # 0 parts (empty table) or >1 (shouldn't happen after coalesce(1))
            with open(out_path, "wb") as out:
                for p in parts:
                    with open(p, "rb") as f:
                        shutil.copyfileobj(f, out)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _recompress_output(out_path: str, codec: Compression, single_file: bool) -> None:
    """Post-compress xz/zst output (Spark has no native writer for either).

    Single-file dumps recompress ``out_path`` in place.  Multi-file dumps
    went to ``out_path + ".d"`` — recompress each part file there and tag
    it with the codec extension so readers detect it by name.
    """
    if codec not in (Compression.XZ, Compression.ZSTD):
        return
    if single_file:
        _recompress(out_path, codec)
        return
    for part in glob.glob(os.path.join(out_path + ".d", "part-*")):
        if part.endswith(".crc"):
            continue
        _recompress(part, codec)
        os.replace(part, part + codec.value)


def _recompress(path: str, codec: Compression) -> None:
    from filesql_spark.sources.compression import compress_bytes

    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:
        f.write(compress_bytes(data, codec))


def _write_xlsx_table(df: DataFrame, out_path: str) -> None:
    header = df.columns
    rows = [["" if v is None else str(v) for v in row] for row in df.toLocalIterator()]
    sheet = os.path.basename(out_path).split(".")[0]
    write_xlsx(out_path, [(sheet, header, rows)])
