"""Table naming + format detection + walker rules (reference parity)."""

from __future__ import annotations

import os

import pytest

from filesql_spark.errors import UnsupportedFormatError, ValidationError
from filesql_spark.naming import sanitize_name, table_name_from_path, xlsx_table_name
from filesql_spark.sources.detect import Compression, FileFormat, detect_file_type
from filesql_spark.sources.walker import (
    collect_files_from_paths,
    deduplicate_compressed_files,
)


@pytest.mark.parametrize(
    "path,expected",
    [
        ("users.csv", "users"),
        ("/a/b/data.tsv.gz", "data"),
        ("logs.ltsv.xz", "logs"),
        ("t.parquet.zst", "t"),
        ("sample.xlsx", "sample"),
        ("日本語.csv", "日本語"),  # unicode kept (quoted identifiers)
        ("my table.csv", "my table"),  # spaces kept for non-xlsx
    ],
)
def test_table_name_from_path(path, expected):
    assert table_name_from_path(path) == expected


@pytest.mark.parametrize(
    "name,prefix,expected",
    [
        ("Sheet 1", "sheet", "Sheet_1"),
        ("2024data", "sheet", "sheet_2024data"),
        ("名前", "sheet", "sheet"),  # non-ascii stripped → fallback
        ("a-b.c", "table", "a_b_c"),
        ("", "table", "table"),
    ],
)
def test_sanitize_name(name, prefix, expected):
    assert sanitize_name(name, prefix) == expected


def test_xlsx_table_name():
    assert xlsx_table_name("/x/sample.xlsx", "Sheet1") == "sample_Sheet1"


@pytest.mark.parametrize(
    "path,fmt,comp",
    [
        ("a.csv", FileFormat.CSV, Compression.NONE),
        ("a.tsv.gz", FileFormat.TSV, Compression.GZ),
        ("a.ltsv.bz2", FileFormat.LTSV, Compression.BZ2),
        ("a.parquet.xz", FileFormat.PARQUET, Compression.XZ),
        ("a.xlsx.zst", FileFormat.XLSX, Compression.ZSTD),
        ("A.CSV", FileFormat.CSV, Compression.NONE),  # case-insensitive
    ],
)
def test_detect(path, fmt, comp):
    assert detect_file_type(path) == (fmt, comp)


@pytest.mark.parametrize("path", ["a.txt", "a.json", "a.csv.rar", "a"])
def test_detect_unsupported(path):
    with pytest.raises(UnsupportedFormatError):
        detect_file_type(path)


def test_compressed_dedup():
    paths = ["/d/users.csv", "/d/users.csv.gz", "/d/other.csv.gz"]
    assert deduplicate_compressed_files(paths) == ["/d/users.csv", "/d/other.csv.gz"]


def test_walker(tmp_path):
    (tmp_path / "a.csv").write_text("id\n1\n")
    (tmp_path / "b.tsv").write_text("id\n1\n")
    (tmp_path / "skip.txt").write_text("x")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.csv").write_text("id\n2\n")
    files = collect_files_from_paths([str(tmp_path)])
    names = sorted(os.path.basename(f) for f in files)
    assert names == ["a.csv", "b.tsv", "c.csv"]

    with pytest.raises(ValidationError):
        collect_files_from_paths(["/does/not/exist.csv"])
