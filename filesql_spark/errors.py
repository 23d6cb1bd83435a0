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
