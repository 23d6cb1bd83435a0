"""Table-name derivation and sanitization.

Reference semantics:
- ``tableFromFilePath`` (table.go:72-83): basename, strip ONE compression
  extension, then ONE format extension — ``users.csv`` → ``users``,
  ``data.tsv.gz`` → ``data``. The raw (possibly unicode) name is kept for
  non-XLSX tables; identifiers are always quoted in generated SQL
  (stream_processor.go:198-205), so reserved words and unicode work.
- ``sanitizeTableName`` (builder.go:572-599, types.go:78-109): XLSX table
  names are sanitized ASCII (spaces/``-``/``.`` → ``_``, other
  non-alphanumerics stripped, digit-leading names prefixed).
- XLSX: one table per sheet named ``{file}_{sheet}`` (builder.go:531-546).
"""

from __future__ import annotations

import os

from filesql_spark.sources.detect import COMPRESSION_EXTENSIONS


def table_name_from_path(path: str) -> str:
    """Derive a table name from a file path (reference table.go:72-83)."""
    name = os.path.basename(path)
    for ext in COMPRESSION_EXTENSIONS:
        if name.lower().endswith(ext):
            name = name[: -len(ext)]
            break
    root, _ext = os.path.splitext(name)
    return root


def sanitize_name(name: str, prefix: str = "table") -> str:
    """ASCII-sanitize an identifier (reference builder.go:572-599).

    ``prefix`` is prepended when the result starts with a digit and used as
    the fallback for an empty result ("table" for files, "sheet" for Excel
    sheets — the reference uses both spellings).
    """
    s = name.replace(" ", "_").replace("-", "_").replace(".", "_")
    s = "".join(ch for ch in s if ch.isascii() and (ch.isalnum() or ch == "_"))
    if s and s[0].isdigit():
        s = f"{prefix}_{s}"
    return s or prefix


def xlsx_table_name(file_path: str, sheet_name: str) -> str:
    """``{file}_{sheet}`` with both parts sanitized (builder.go:531-546)."""
    base = sanitize_name(table_name_from_path(file_path), prefix="table")
    sheet = sanitize_name(sheet_name, prefix="sheet")
    return f"{base}_{sheet}"
