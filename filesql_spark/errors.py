"""Engine error types.

Mirrors the reference's error taxonomy (errors.go) where observable:
duplicate table names across inputs (stream_processor.go:109-121),
duplicate column names within a file (types.go:202-214), empty files
(stream_processor.go:62-67), unsupported extensions (file.go:354-443).
"""


class FilesqlError(Exception):
    """Base class for all engine errors."""


class UnsupportedFormatError(FilesqlError):
    """Path has no supported format extension (reference: errors.go, file.go:354-443)."""


class DuplicateTableError(FilesqlError):
    """Two inputs map to the same table name (reference: stream_processor.go:109-121)."""


class DuplicateColumnError(FilesqlError):
    """A file declares the same column name twice (reference: types.go:202-214)."""


class EmptyFileError(FilesqlError):
    """Input file has no content at all (reference: stream_processor.go:62-67)."""


class ValidationError(FilesqlError):
    """Builder/input validation failure (reference: validator.go:21-146)."""


class TransactionError(FilesqlError):
    """Invalid transaction state transition (begin/commit/rollback misuse)."""


class TriggerRaise(FilesqlError):
    """A trigger body evaluated RAISE(ABORT|FAIL|ROLLBACK, msg).

    ``str(e)`` is the user's message verbatim — the wording stdlib
    sqlite3 surfaces as IntegrityError. ``kind`` drives the statement/
    transaction unwind in dml's raise guard (ABORT undoes the triggering
    statement, ROLLBACK cancels the whole transaction, FAIL keeps the
    applied effects)."""

    def __init__(self, kind: str, message: str):
        super().__init__(message)
        self.kind = kind
