"""Sample-bounded type inference with the reference's exact thresholds.

Reference: types.go:327-672. We reproduce the observable semantics —
classification order (datetime → integer → real → text), sampling caps,
and the confidence thresholds — because they are visible in query results
(a column that infers TEXT vs INTEGER filters differently).

Constants (types.go:384-400):
- MAX_SAMPLE_SIZE = 1000 values per column
- MIN_CONFIDENCE = 0.8 (datetime / integer acceptance)
- EARLY_TEXT = 0.5 (running share of text values that short-circuits to TEXT)
- MIN_REAL = 0.1 (share of reals that promotes mixed numerics to REAL)
- stratified begin/middle/end sampling when > 3000 values

Divergences from the reference, both deliberate:
- DATETIME columns stay StringType in the cast (the reference also stores
  them as TEXT in SQLite — ISO strings compare lexicographically; casting to
  TimestampType would change non-ISO comparisons; SURVEY §7.4).
- Values that fail the winning type's cast become NULL (SQLite would keep
  the raw string in a typed column; Spark columns are homogeneous).
"""

from __future__ import annotations

import enum
import re
from datetime import datetime

MAX_SAMPLE_SIZE = 1000
MIN_CONFIDENCE = 0.8
EARLY_TEXT = 0.5
MIN_REAL = 0.1
MIN_DT_LEN, MAX_DT_LEN = 4, 35
STRATIFICATION_FACTOR = 3


class ColumnType(enum.Enum):
    TEXT = "TEXT"
    INTEGER = "INTEGER"
    REAL = "REAL"
    DATETIME = "DATETIME"

    @property
    def spark_type(self) -> str:
        # DATETIME stays string for SQLite-parity ordering (module docstring)
        return {"TEXT": "string", "INTEGER": "long", "REAL": "double", "DATETIME": "string"}[
            self.value
        ]


# The ten datetime pattern families (types.go:334-382): regex gate, then a
# strict parse confirmation.
_DT_PATTERNS: list[tuple[re.Pattern[str], list[str]]] = [
    (
        re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"),
        ["%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%S.%f%z"],
    ),
    (
        re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?$"),
        ["%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M:%S.%f"],
    ),
    (
        re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?$"),
        ["%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M:%S.%f"],
    ),
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), ["%Y-%m-%d"]),
    (
        re.compile(r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}:\d{2}( (AM|PM))?$"),
        ["%m/%d/%Y %H:%M:%S", "%m/%d/%Y %I:%M:%S %p"],
    ),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4}$"), ["%m/%d/%Y"]),
    (
        re.compile(r"^\d{1,2}\.\d{1,2}\.\d{4} \d{1,2}:\d{2}:\d{2}$"),
        ["%d.%m.%Y %H:%M:%S"],
    ),
    (re.compile(r"^\d{1,2}\.\d{1,2}\.\d{4}$"), ["%d.%m.%Y"]),
    (
        re.compile(r"^\d{1,2}:\d{2}:\d{2}(\.\d+)?$"),
        ["%H:%M:%S", "%H:%M:%S.%f"],
    ),
    (re.compile(r"^\d{1,2}:\d{2}$"), ["%H:%M"]),
]

_INT_RE = re.compile(r"^[+-]?\d+$")
_DT_SEPARATORS = set("-/.:T ")


def is_datetime(value: str) -> bool:
    """Length + charset pre-filter, then regex gate + parse confirm
    (types.go:402-445)."""
    value = value.strip()
    if not (MIN_DT_LEN <= len(value) <= MAX_DT_LEN):
        return False
    if not any(c.isdigit() for c in value) or not any(c in _DT_SEPARATORS for c in value):
        return False
    for pattern, formats in _DT_PATTERNS:
        if pattern.match(value):
            for fmt in formats:
                try:
                    # %z does not accept ':' pre-3.7 style; Python ≥3.7 does.
                    datetime.strptime(value.replace("Z", "+00:00") if fmt.endswith("%z") else value, fmt)
                    return True
                except ValueError:
                    continue
    return False


def _is_integer(value: str) -> bool:
    if not _INT_RE.match(value):
        return False
    # 64-bit bound, like strconv.ParseInt(v, 10, 64) (types.go:611)
    try:
        return -(2**63) <= int(value) < 2**63
    except ValueError:
        return False


def _is_float(value: str) -> bool:
    if not any(c.isdigit() for c in value):
        return False
    # Go's ParseFloat accepts inf/nan; so does Python's float().
    try:
        float(value)
        return True
    except ValueError:
        return False


def classify_value(value: str) -> ColumnType:
    """datetime → integer → real → text (types.go:581-598)."""
    if is_datetime(value):
        return ColumnType.DATETIME
    if _is_integer(value):
        return ColumnType.INTEGER
    if _is_float(value):
        return ColumnType.REAL
    return ColumnType.TEXT


def get_sample_values(values: list[str]) -> list[str]:
    """Stratified begin/middle/end sampling above 3000 values
    (types.go:492-578)."""
    n = len(values)
    if n <= MAX_SAMPLE_SIZE:
        return values
    if n < MAX_SAMPLE_SIZE * STRATIFICATION_FACTOR:
        step = max(1, n // MAX_SAMPLE_SIZE)
        return values[::step][:MAX_SAMPLE_SIZE]
    section = n // STRATIFICATION_FACTOR
    per = MAX_SAMPLE_SIZE // STRATIFICATION_FACTOR
    samples: list[str] = []
    for s in range(STRATIFICATION_FACTOR):
        start = s * section
        end = start + section if s < STRATIFICATION_FACTOR - 1 else n
        take = per if s < STRATIFICATION_FACTOR - 1 else MAX_SAMPLE_SIZE - len(samples)
        step = max(1, (end - start) // max(take, 1))
        samples.extend(values[start:end:step][:take])
    return samples[:MAX_SAMPLE_SIZE]


def infer_column_type(values: list[str | None]) -> ColumnType:
    """Thresholded vote over a bounded sample (types.go:447-490, 633-672)."""
    if not values:
        return ColumnType.TEXT
    sample = get_sample_values([v for v in values if v is not None])
    counts = dict.fromkeys(ColumnType, 0)
    non_empty = 0
    for raw in sample:
        v = raw.strip()
        if not v:
            continue  # empties never vote (types.go:468-472)
        non_empty += 1
        counts[classify_value(v)] += 1
        if counts[ColumnType.TEXT] > 0 and counts[ColumnType.TEXT] / non_empty > EARLY_TEXT:
            return ColumnType.TEXT
    if non_empty == 0:
        return ColumnType.TEXT
    return _select_column_type(counts, non_empty)


def _select_column_type(counts: dict[ColumnType, int], total: int) -> ColumnType:
    """Confidence cascade (types.go:633-672)."""
    if counts[ColumnType.TEXT] > 0:
        return ColumnType.TEXT
    dt = counts[ColumnType.DATETIME] / total
    real = counts[ColumnType.REAL] / total
    integer = counts[ColumnType.INTEGER] / total
    if dt >= MIN_CONFIDENCE:
        return ColumnType.DATETIME
    if real >= MIN_REAL and (real + integer) >= MIN_CONFIDENCE:
        return ColumnType.REAL
    if integer >= MIN_CONFIDENCE:
        return ColumnType.INTEGER
    if real > 0:
        return ColumnType.REAL
    if integer > 0:
        return ColumnType.INTEGER
    if dt > 0:
        return ColumnType.DATETIME
    return ColumnType.TEXT


def infer_schema(header: list[str], rows: list[list[str | None]]) -> list[tuple[str, ColumnType]]:
    """Infer every column's type from sampled rows (column-major vote)."""
    result = []
    for i, name in enumerate(header):
        col = [row[i] if i < len(row) else None for row in rows]
        result.append((name, infer_column_type(col)))
    return result
