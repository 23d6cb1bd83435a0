"""filesql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nao1215/filesql.

Where the reference (a Go ``database/sql`` driver) ingests CSV/TSV/LTSV/
Parquet/XLSX files into in-memory SQLite3 and delegates all SQL to it
(reference: builder.go:353-361), this engine ingests the same formats into
Spark DataFrames registered as temp views and delegates all SQL to Spark
SQL / Catalyst — plus a SQLite-dialect compatibility shim so reference
queries run verbatim.

Public API (mirrors the reference's capability surface, not its Go API):

    import filesql_spark as fs

    eng = fs.open("users.csv", "orders.parquet")       # filesql.Open
    df  = eng.query("SELECT * FROM users WHERE age > 30")
    eng.dump("/tmp/out", format="parquet")             # filesql.DumpDatabase
    eng.close()

    fs.Builder().add_path("data/").enable_auto_save("/tmp/out").open()
"""

from filesql_spark.errors import (
    DuplicateColumnError,
    DuplicateTableError,
    EmptyFileError,
    FilesqlError,
    UnsupportedFormatError,
)
from filesql_spark.session import get_spark


def __getattr__(name):
    # Lazy imports keep `import filesql_spark` cheap and cycle-free.
    if name in ("Builder",):
        from filesql_spark.builder import Builder

        return Builder
    if name in ("Engine", "open"):
        import filesql_spark.engine as engine

        return getattr(engine, name)
    if name == "dump_database":
        from filesql_spark.sinks.dump import dump_database

        return dump_database
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "Builder",
    "Engine",
    "open",
    "get_spark",
    "dump_database",
    "FilesqlError",
    "DuplicateTableError",
    "DuplicateColumnError",
    "EmptyFileError",
    "UnsupportedFormatError",
]

__version__ = "0.1.0"
