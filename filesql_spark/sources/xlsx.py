"""XLSX reader on the stdlib (zipfile + ElementTree) — no openpyxl here.

Reference behavior (stream_processor.go:326-417, file.go:564-656):
- one table per sheet, named ``{file}_{sheet}`` (sanitized);
- first row of each sheet is the header;
- short rows padded (reference pads ``""``; we yield NULL);
- whole file resident in memory (inherent to ZIP; README.md:385-386).

XLSX is a driver-side, non-splittable format in any engine; rows land in a
``spark.createDataFrame`` (Arrow path) and everything downstream is
distributed. Cell handling: shared strings, inline strings, booleans
(→ ``true``/``false`` text, §1.3: booleans are not a type), and general
numbers (integer-valued floats render without the trailing ``.0`` the way
spreadsheet UIs show them).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from typing import BinaryIO

from filesql_spark.errors import EmptyFileError

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, … 'AA'→26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "s":  # shared string
        v = c.find(f"{_NS}v")
        return shared[int(v.text)] if v is not None and v.text else ""
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(t_el.text or "" for t_el in is_el.iter(f"{_NS}t")) if is_el is not None else ""
    v = c.find(f"{_NS}v")
    raw = v.text if v is not None and v.text is not None else ""
    if t == "b":
        return "true" if raw == "1" else "false"
    if t in ("str", "e"):
        return raw
    # numeric: strip float artifacts for integer values (15.0 → 15)
    if raw and "." in raw:
        try:
            f = float(raw)
            if f.is_integer() and abs(f) < 2**53:
                return str(int(f))
        except ValueError:
            pass
    return raw


def read_xlsx_sheets(source: str | BinaryIO) -> list[tuple[str, list[str], list[list[str | None]]]]:
    """Parse an XLSX into [(sheet_name, header, rows)], sheet order preserved."""
    with zipfile.ZipFile(source) as zf:
        names = set(zf.namelist())

        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_map = {
            r.get("Id"): r.get("Target")
            for r in rels.iter("{http://schemas.openxmlformats.org/package/2006/relationships}Relationship")
        }

        sheets: list[tuple[str, list[str], list[list[str | None]]]] = []
        for sheet_el in wb.iter(f"{_NS}sheet"):
            sheet_name = sheet_el.get("name", "Sheet")
            target = rel_map.get(sheet_el.get(f"{_NS_REL}id"), "")
            target = target.lstrip("/")
            member = target if target.startswith("xl/") else f"xl/{target}"
            if member not in names:
                continue

            rows: list[list[str | None]] = []
            width = 0
            root = ET.fromstring(zf.read(member))
            for row_el in root.iter(f"{_NS}row"):
                cells: dict[int, str] = {}
                next_idx = 0
                for c in row_el.iter(f"{_NS}c"):
                    ref = c.get("r")
                    idx = next_idx
                    if ref:
                        m = _CELL_REF.match(ref)
                        if m:
                            idx = _col_index(m.group(1))
                    cells[idx] = _cell_text(c, shared)
                    next_idx = idx + 1
                if cells:
                    row = [cells.get(i, "") for i in range(max(cells) + 1)]
                    rows.append(row)  # type: ignore[arg-type]
                    width = max(width, len(row))
                else:
                    rows.append([])

            # drop trailing fully-empty rows
            while rows and not any(v for v in rows[-1]):
                rows.pop()
            if not rows:
                continue

            header = [str(v).strip() for v in rows[0]]
            header += [""] * (width - len(header))
            header = [h or f"column{i + 1}" for i, h in enumerate(header)]
            body = [
                [*(r + [None] * (width - len(r)))] for r in rows[1:]
            ]  # short rows padded with NULL
            sheets.append((sheet_name, header, body))

        if not sheets:
            raise EmptyFileError("XLSX contains no non-empty sheets")
        return sheets
