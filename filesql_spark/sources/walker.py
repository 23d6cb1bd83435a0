"""Input path collection (reference: file_processor.go).

- files must exist and carry a supported extension;
- directories are walked recursively, collecting every supported file
  (file_processor.go:28-112);
- absolute-path dedup;
- compressed duplicates: ``x.csv.gz`` is dropped when ``x.csv`` is also
  present (file_processor.go:217-246).
"""

from __future__ import annotations

import os

from filesql_spark.errors import UnsupportedFormatError, ValidationError
from filesql_spark.sources.detect import Compression, detect_file_type, is_supported


def collect_files_from_paths(paths: list[str]) -> list[str]:
    """Expand files + recursive directories into a validated file list."""
    collected: list[str] = []
    seen: set[str] = set()
    for p in paths:
        if not os.path.exists(p):
            raise ValidationError(f"path does not exist: {p}")
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for fname in sorted(files):
                    full = os.path.join(root, fname)
                    if is_supported(full):
                        ap = os.path.abspath(full)
                        if ap not in seen:
                            seen.add(ap)
                            collected.append(ap)
        else:
            if not is_supported(p):
                raise UnsupportedFormatError(f"unsupported file type: {p}")
            ap = os.path.abspath(p)
            if ap not in seen:
                seen.add(ap)
                collected.append(ap)
    return deduplicate_compressed_files(collected)


def deduplicate_compressed_files(paths: list[str]) -> list[str]:
    """Prefer the uncompressed variant when both exist
    (file_processor.go:217-246)."""
    uncompressed_stems = set()
    for p in paths:
        _fmt, comp = detect_file_type(p)
        if comp == Compression.NONE:
            uncompressed_stems.add(p)
    result = []
    for p in paths:
        _fmt, comp = detect_file_type(p)
        if comp != Compression.NONE:
            stem = p
            for ext in (".gz", ".bz2", ".xz", ".zst"):
                if stem.lower().endswith(ext):
                    stem = stem[: -len(ext)]
                    break
            if stem in uncompressed_stems:
                continue
        result.append(p)
    return result
