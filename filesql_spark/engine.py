"""Engine: the Spark-native equivalent of the reference's in-memory SQLite DB.

Reference architecture (SURVEY §1.1): one `:memory:` SQLite holding N tables,
queried via database/sql, dumped via DumpDatabase, with auto-save hooks on
Close()/Commit() (save.go). Here: one SparkSession holding N temp views over
DataFrames, queried via spark.sql behind the SQLite-dialect shim, dumped via
the sinks package, with the same auto-save hooks.

State model: ``_tables`` maps name → DataFrame (the current committed-or-
working version). DML rewrites the DataFrame and re-registers the view —
a lazy plan mutation, no materialization. Transactions are snapshot/swap of
the registry dict (begin → shallow copy; rollback → restore; commit → drop
snapshot + optional auto-save), mirroring save.go:268-294, 340-361.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from filesql_spark import dialect
from filesql_spark.errors import DuplicateTableError, FilesqlError, TransactionError
from filesql_spark.session import get_spark
from filesql_spark.sources.loader import load_file
from filesql_spark.sources.walker import collect_files_from_paths


@dataclass
class AutoSaveConfig:
    """Reference: builder.go:196-241 (EnableAutoSave / EnableAutoSaveOnCommit).

    ``output_dir == ""`` means overwrite the original input files'
    directories (save.go:386-399).
    """

    output_dir: str
    on: str = "close"  # "close" | "commit"
    format: str | None = None  # None → keep each table's original format
    compression: str | None = None


class Engine:
    """A loaded database: named DataFrames + SQL front door + export."""

    def __init__(self, spark: SparkSession | None = None, auto_save: AutoSaveConfig | None = None):
        self.spark = spark or get_spark()
        from filesql_spark.json1 import register_udfs

        register_udfs(self.spark)  # json1 mutation + json_each (idempotent)
        self.auto_save = auto_save
        self._tables: dict[str, DataFrame] = {}
        self._views: dict[str, DataFrame] = {}
        # view name → defining SELECT text, in creation order. SQLite
        # views are DYNAMIC — they see base-table changes — but a Spark
        # DataFrame captures the base plan at spark.sql() time, so every
        # table mutation re-derives the registered views from these defs
        # (analysis-only cost; plans stay lazy). r11 fix: views were
        # frozen at CREATE VIEW time before this.
        self._view_defs: dict[str, str] = {}
        self._origins: dict[str, str] = {}  # table → original file path
        # declared PRIMARY KEY columns (from CREATE TABLE), the implicit
        # conflict target for INSERT OR REPLACE/IGNORE and bare ON CONFLICT
        self._primary_keys: dict[str, list[str]] = {}
        # registered triggers, keyed by lowercased name (triggers.py)
        self._triggers: dict[str, object] = {}
        self._snapshot: tuple[dict[str, DataFrame], dict[str, DataFrame]] | None = None
        # SAVEPOINT stack: (lowercased name, (tables, views), primary_keys,
        # origins, triggers).
        # A savepoint issued outside BEGIN starts an implicit transaction
        # (SQLite semantics: releasing the outermost savepoint commits it).
        self._savepoints: list[
            tuple[
                str,
                tuple[dict[str, DataFrame], dict[str, DataFrame]],
                dict,
                dict,
                dict,
            ]
        ] = []
        self._temp_files: list[str] = []
        self._closed = False
        # connection-state function counters (SQLite changes() /
        # total_changes()); updated on the execute() DML path
        self._changes = 0
        self._total_changes = 0
        # last_insert_rowid() bridge (r11): the rowid of the most recent
        # plain INSERT. Exact vs sqlite3 for (a) tables with a declared
        # single-column integer PRIMARY KEY — SQLite's rowid alias, we
        # report the max inserted key (== the last row's for single-row
        # and ascending multi-row inserts) — and (b) append-only
        # implicit-rowid histories, via a per-table row-count high-water
        # mark. Divergences (documented, not silent): a DELETE that frees
        # the max rowid invalidates the mark (SQLite would reuse the
        # freed id; next INSERT here re-counts), upsert paths leave the
        # counter untouched, and multi-row inserts with NON-ascending
        # explicit keys report the max, not the last.
        # Decision (r13, VERDICT r12 #6): the delete divergence stays.
        # A mark that SURVIVES deletes is exact only when the deleted
        # set excludes the current max rowid; it becomes wrong for
        # max-row deletes and delete-all (SQLite reuses the freed id:
        # 1..5, DELETE rowid 5, INSERT -> rowid 5 again), which the
        # re-count gets right. Neither policy dominates, and telling
        # them apart needs a per-row hidden rowid — a total ordering
        # over the table, which this engine deliberately avoids (no
        # scalable dense id in a distributed DataFrame). Re-count keeps
        # the suffix-delete/delete-all histories exact and the contract
        # simple; tests pin both the exact and the divergent cases.
        self._last_insert_rowid = 0
        self._rowid_hwm: dict[str, int] = {}
        self._views_dirty = False
        # view name → last re-derivation failure (see _flush_views)
        self._view_errors: dict[str, str] = {}

    # ------------------------------------------------------------------ load

    def load_paths(self, paths: list[str]) -> None:
        """Collect + load every input path (reference Build/Open flow,
        builder.go:255-344)."""
        for path in collect_files_from_paths(paths):
            result = load_file(self.spark, path)
            self._temp_files.extend(result.temp_files)
            for name, df in result.tables:
                if name in self._tables:
                    # hard error, like stream_processor.go:109-121
                    raise DuplicateTableError(
                        f"table {name!r} already exists (from {path})"
                    )
                self.register(name, df, origin=path)

    def register(self, name: str, df: DataFrame, origin: str | None = None) -> None:
        self._tables[name] = df
        if origin:
            self._origins[name] = origin
        df.createOrReplaceTempView(_view_ident(name))
        self._mark_views_dirty()
        self._refresh_catalog_views()

    def _reregister(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        df.createOrReplaceTempView(_view_ident(name))
        self._mark_views_dirty()
        self._refresh_catalog_views()

    def _mark_views_dirty(self) -> None:
        """A base table changed: registered views re-derive lazily on the
        next read (r12 ADVICE — eager per-mutation re-analysis was
        O(views × statements) across a trigger cascade)."""
        if self._view_defs:
            self._views_dirty = True

    def _flush_views(self) -> None:
        """Re-analyze every registered view from its defining SQL if a
        base table changed since the last read, so reads see current
        data (SQLite views are dynamic). A view whose re-derivation now
        fails (e.g. its base table was dropped) keeps its last-good
        DataFrame (documented divergence: SQLite errors at view-query
        time) — the failure is recorded in ``_view_errors`` instead of
        vanishing."""
        if not getattr(self, "_views_dirty", False):
            return
        self._views_dirty = False
        from filesql_spark import dialect

        for name, body in self._view_defs.items():
            try:
                df = self.spark.sql(dialect.rewrite(body, self._column_types()))
            except Exception as e:
                self._view_errors[name] = f"{type(e).__name__}: {e}"
                continue
            self._view_errors.pop(name, None)
            self._views[name] = df
            df.createOrReplaceTempView(name)

    # --------------------------------------------------------------- catalog

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            raise FilesqlError(f"no such table: {name}")
        return self._tables[name]

    def table_names(self) -> list[str]:
        return sorted(self._tables)

    def _column_types(self) -> dict[str, str]:
        """Lowercased column → SQLite affinity bucket ('int' | 'real' |
        'text') for the dialect's affinity passes; columns whose name is
        typed differently across tables drop out (ambiguous →
        untracked). 'text' (r13b) lets the dialect project
        mixed-affinity coalesce/ifnull to SQLite TEXT rendering and
        apply SQLite's numeric coercion inside avg/sum/total — every
        numeric consumer treats it exactly like untracked."""
        out: dict[str, str | None] = {}
        for df in list(self._tables.values()) + list(self._views.values()):
            for f in df.schema.fields:
                s = f.dataType.simpleString()
                if s in ("tinyint", "smallint", "int", "bigint"):
                    t = "int"
                elif s in ("float", "double") or s.startswith("decimal"):
                    t = "real"
                elif s == "string":
                    t = "text"
                else:
                    t = None
                key = f.name.lower()
                if key in out and out[key] != t:
                    out[key] = None
                else:
                    out[key] = t
        return {k: v for k, v in out.items() if v is not None}

    def _ddl_for(self, name: str) -> str:
        cols = ", ".join(
            f'"{f.name}" {_sqlite_type(f.dataType.simpleString())}'
            for f in self._tables[name].schema.fields
        )
        return f'CREATE TABLE "{name}" ({cols})'

    def _refresh_catalog_views(self) -> None:
        """Maintain the ``sqlite_master`` compat view (filesql.go:224-248;
        README.md:149 queries it verbatim)."""
        rows = [
            (
                kind,
                name,
                name,
                0,
                # SQLite stores each object's creating statement verbatim
                self._ddl_for(name) if kind == "table"
                else (
                    f'CREATE VIEW "{name}" AS {self._view_defs[name]}'
                    if name in self._view_defs else None
                ),
            )
            for kind, names in (("table", self._tables), ("view", self._views))
            for name in names
        ] + [
            ("trigger", t.name, t.table, 0, t.sql)
            for t in self._triggers.values()
        ]
        df = self.spark.createDataFrame(
            rows, schema="type string, name string, tbl_name string, rootpage int, sql string"
        )
        df.createOrReplaceTempView("sqlite_master")

    def pragma_table_info(self, name: str) -> DataFrame:
        """PRAGMA table_info(t) compat (filesql.go:275-301 uses it)."""
        fields = self.table(name).schema.fields
        pk = {c.lower(): i + 1 for i, c in enumerate(self._primary_keys.get(name, []))}
        rows = [
            (i, f.name, _sqlite_type(f.dataType.simpleString()), 0, None,
             pk.get(f.name.lower(), 0))
            for i, f in enumerate(fields)
        ]
        return self.spark.createDataFrame(
            rows,
            schema="cid int, name string, type string, notnull int, dflt_value string, pk int",
        )

    # ----------------------------------------------------------------- query

    def query(self, sql: str, params=None) -> DataFrame:
        """Run a SELECT-shaped statement (SQLite dialect) → DataFrame.

        ``params`` binds SQLite-style placeholders (``?``/``?N`` with a
        sequence, ``:name``/``@name``/``$name`` with a dict) exactly like
        the reference's database/sql surface (filesql.go: plain
        ``db.QueryContext(ctx, query, args...)``)."""
        self._flush_views()
        if params is not None:
            sql = dialect.bind_params(sql, params)
        sql = dialect.substitute_session_functions(
            sql, self._changes, self._total_changes,
            getattr(self, "_last_insert_rowid", 0),
        )
        stmt = _first_keyword(sql)
        if stmt == "PRAGMA":
            return self._pragma(sql)
        if stmt == "WITH":
            from filesql_spark.recursive import is_recursive, run_recursive

            if is_recursive(sql):
                # Spark SQL lacks WITH RECURSIVE; emulate by delta iteration
                ctypes = self._column_types()
                return run_recursive(
                    self.spark, sql, lambda s: dialect.rewrite(s, ctypes)
                )
        if stmt in ("SELECT", "WITH", "VALUES"):
            from pyspark.errors import AnalysisException

            try:
                return self.spark.sql(dialect.rewrite(sql, self._column_types()))
            except AnalysisException as e:
                translated = _sqlite_style_error(e)
                if translated is not None:
                    raise translated from e
                raise
        if stmt in ("INSERT", "REPLACE", "UPDATE", "DELETE"):
            # DML … RETURNING behaves as a row-producing statement
            # (SQLite 3.35+); dml raises if the clause is absent.
            # REPLACE is SQLite's alias for INSERT OR REPLACE.
            from filesql_spark import dml

            return dml.dml_returning(self, _strip_comments(sql).strip())
        if stmt == "EXPLAIN":
            # SQLite's EXPLAIN [QUERY PLAN] <select> — surfaced honestly
            # as Spark's plan. QUERY PLAN keeps SQLite's exact schema
            # (id, parent, notused, detail) with the parent tree derived
            # from the PHYSICAL plan's structure; bare EXPLAIN returns
            # the formatted explain text one line per row (SQLite's VDBE
            # opcode listing has no meaningful Spark equivalent, and its
            # docs tell applications not to depend on the format).
            m = re.match(r"(?is)^\s*EXPLAIN(\s+QUERY\s+PLAN)?\s+(.*)$", sql)
            qp, inner = m.group(1), m.group(2)
            qe = self.query(inner)._jdf.queryExecution()
            if qp:
                rows = []
                last_at_depth: dict[int, int] = {}
                for i, line in enumerate(
                    qe.executedPlan().toString().splitlines()
                ):
                    t = re.match(r"^([: ]*)(?:[+:]-\s)?(.*)$", line)
                    depth = (len(t.group(1)) // 3 + 1) if t.group(1) or line.lstrip().startswith(("+-", ":-")) else 0
                    last_at_depth[depth] = i
                    parent = last_at_depth.get(depth - 1, 0) if depth else 0
                    rows.append((i, parent, 0, t.group(2)))
                return self.spark.createDataFrame(
                    rows,
                    "id int, parent int, notused int, detail string",
                )
            plan = qe.explainString(
                self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            return self.spark.createDataFrame(
                [(line,) for line in plan.splitlines()], "detail string"
            )
        raise FilesqlError(
            f"query() handles SELECT statements; use execute() for {stmt}"
        )

    def execute(self, sql: str, params=None) -> int:
        """Run a DML/DDL/transaction statement; returns affected-row count
        (database/sql Exec semantics). ``params`` binds placeholders as in
        :meth:`query`."""
        from filesql_spark import dml

        self._flush_views()
        if params is not None:
            sql = dialect.bind_params(sql, params)
        sql = dialect.substitute_session_functions(
            sql, self._changes, self._total_changes,
            getattr(self, "_last_insert_rowid", 0),
        )

        stmt = _first_keyword(sql)
        if stmt == "BEGIN":
            self.begin()
            return 0
        if stmt == "COMMIT":
            self.commit()
            return 0
        if stmt == "ROLLBACK":
            name = _savepoint_target(sql)
            if name is not None:
                self.rollback_to(name)
            else:
                self.rollback()
            return 0
        if stmt == "SAVEPOINT":
            name = _savepoint_ident(sql, "SAVEPOINT")
            self.savepoint(name)
            return 0
        if stmt in ("VACUUM", "ANALYZE", "REINDEX"):
            # SQLite maintenance statements. All three are storage/stats
            # chores with no observable query effect here: Spark has no
            # freelist to VACUUM, Catalyst collects its own statistics
            # (ANALYZE), and CREATE INDEX is already a catalog no-op
            # (REINDEX). Accepted so scripts written for SQLite run
            # unchanged; VACUUM keeps SQLite's one observable rule —
            # it refuses inside a transaction.
            if stmt == "VACUUM" and (
                self._snapshot is not None or self._savepoints
            ):
                raise TransactionError("cannot VACUUM from within a transaction")
            return 0
        if stmt == "RELEASE":
            name = _savepoint_ident(sql, "RELEASE")
            self.release(name)
            return 0
        if stmt in ("INSERT", "REPLACE", "UPDATE", "DELETE", "CREATE", "DROP", "ALTER"):
            # comments are legal anywhere in SQLite DML; the dml regex
            # parsers anchor on the keyword, so blank comments first
            n = dml.execute(self, _strip_comments(sql).strip())
            if stmt in ("INSERT", "REPLACE", "UPDATE", "DELETE"):
                self._changes = n
                self._total_changes += n
            return n
        # SELECT via execute: run it, report row count
        return self.query(sql).count()

    def execute_script(self, script: str) -> int:
        """Run a semicolon-separated multi-statement script (DDL + DML +
        transaction control), like database/sql's Exec of a script — the
        reference's examples feed such scripts verbatim
        (example_test.go:295). Returns the total affected-row count.

        Statement splitting is quote-aware (semicolons inside string
        literals or quoted identifiers don't split) via the dialect
        tokenizer; ``--`` and ``/* */`` comments are allowed between
        statements.
        """
        total = 0
        for stmt in _split_statements(script):
            kw = _first_keyword(stmt)
            if not kw:
                continue  # comment-only fragment
            if kw in ("SELECT", "WITH", "VALUES", "PRAGMA"):
                self.query(stmt).count()
            else:
                total += self.execute(stmt)
        return total

    def prepare(self, sql: str) -> "Statement":
        """Prepared-statement handle (database/sql ``db.Prepare`` →
        ``Stmt.Query/Exec`` — the reference passes Prepare through its
        driver.Conn, save.go:296-299, and bulk-loads via PrepareContext,
        builder.go:692-704). Spark has no compile-once plan handle — every
        run re-analyzes — so this is a thin rebind-per-call wrapper; the
        statement keyword is validated eagerly like SQLite's prepare."""
        kw = _first_keyword(sql)
        if not kw:
            raise FilesqlError("cannot prepare an empty statement")
        return Statement(self, sql)

    def _pragma(self, sql: str) -> DataFrame:
        import re

        m = re.match(r"\s*PRAGMA\s+table_info\s*\(\s*[\"'`]?([^)\"'`]+)[\"'`]?\s*\)", sql, re.I)
        if m:
            return self.pragma_table_info(m.group(1).strip())
        m = re.match(r"\s*PRAGMA\s+index_list\s*\(\s*[\"'`]?([^)\"'`]+)[\"'`]?\s*\)", sql, re.I)
        if m:
            # CREATE INDEX is a catalog no-op here (Spark plans its own
            # access paths), so every table reports zero indexes — the
            # same shape SQLite returns for an unindexed table
            self.table(m.group(1).strip())  # raises on unknown table
            return self.spark.createDataFrame(
                [], schema="seq int, name string, `unique` int, origin string, partial int"
            )
        m = re.match(r"\s*PRAGMA\s+foreign_key_list\s*\(\s*[\"'`]?([^)\"'`]+)[\"'`]?\s*\)", sql, re.I)
        if m:
            # no FK constraints are tracked (file-backed tables have none;
            # CREATE TABLE accepts-and-ignores them) — empty result, the
            # shape SQLite returns for an unconstrained table
            self.table(m.group(1).strip())  # raises on unknown table
            return self.spark.createDataFrame(
                [],
                schema=(
                    "id int, seq int, `table` string, `from` string, "
                    "`to` string, on_update string, on_delete string, "
                    "`match` string"
                ),
            )
        m = re.match(
            r"\s*PRAGMA\s+foreign_keys\s*(=\s*(ON|OFF|TRUE|FALSE|1|0)\s*)?;?\s*$",
            sql,
            re.I,
        )
        if m:
            # reflexively issued by SQLite client code on connect; FK
            # enforcement doesn't exist here, so the toggle is accepted
            # and the query form reports it off — SQLite's own default
            return self.spark.createDataFrame(
                [] if m.group(1) else [(0,)], schema="foreign_keys int"
            )
        if re.match(r"\s*PRAGMA\s+journal_mode\s*(=\s*\w+\s*)?;?\s*$", sql, re.I):
            # in-memory database: SQLite reports journal_mode=memory for
            # ':memory:' connections (the reference's builder.go:353-361
            # connection string), and mode changes are accepted no-ops
            return self.spark.createDataFrame(
                [("memory",)], schema="journal_mode string"
            )
        if re.match(r"\s*PRAGMA\s+database_list\s*;?\s*$", sql, re.I):
            # single in-memory database, exactly like the reference's
            # ':memory:' connection (builder.go:353-361)
            return self.spark.createDataFrame(
                [(0, "main", "")], schema="seq int, name string, file string"
            )
        raise FilesqlError(f"unsupported PRAGMA: {sql.strip()}")

    # ---------------------------------------------------------- transactions

    def begin(self) -> None:
        if self._snapshot is not None or self._savepoints:
            raise TransactionError(
                "transaction already in progress (nested BEGIN is not "
                "supported; use SAVEPOINT for nesting)"
            )
        self._snapshot = (dict(self._tables), dict(self._views))
        self._pk_snapshot = dict(self._primary_keys)
        self._viewdef_snapshot = dict(self._view_defs)
        # origins too: a rolled-back ALTER … RENAME must not leave the
        # auto-save origin map pointing at the phantom new name (that
        # would silently detach the table from its save-back file)
        self._origin_snapshot = dict(self._origins)
        # triggers are schema objects: CREATE/DROP TRIGGER rolls back too
        self._trigger_snapshot = dict(self._triggers)

    def commit(self) -> None:
        if self._snapshot is None and not self._savepoints:
            raise TransactionError("no transaction in progress")
        self._snapshot = None
        self._savepoints.clear()
        if self.auto_save and self.auto_save.on == "commit":
            self._perform_auto_save()

    def rollback(self) -> None:
        """Cancel the whole transaction — back to BEGIN, or (for a
        savepoint-started implicit transaction) to the first SAVEPOINT."""
        if self._snapshot is not None:
            tables, views = self._snapshot
            pks = getattr(self, "_pk_snapshot", self._primary_keys)
            origins = getattr(self, "_origin_snapshot", self._origins)
            trigs = getattr(self, "_trigger_snapshot", self._triggers)
            vdefs = getattr(self, "_viewdef_snapshot", self._view_defs)
        elif self._savepoints:
            _, (tables, views), pks, origins, trigs, vdefs = self._savepoints[0]
        else:
            raise TransactionError("no transaction in progress")
        self._snapshot = None
        self._savepoints.clear()
        self._restore_state(tables, views, pks, origins, trigs, vdefs)

    # SQLite savepoint semantics (lang_savepoint.html): a savepoint outside
    # a transaction starts one; RELEASE of the outermost savepoint commits
    # it; ROLLBACK TO rewinds state but keeps the savepoint on the stack.
    # Names match case-insensitively; the most recent binding wins.

    def savepoint(self, name: str) -> None:
        self._savepoints.append(
            (
                name.lower(),
                (dict(self._tables), dict(self._views)),
                dict(self._primary_keys),
                dict(self._origins),
                dict(self._triggers),
                dict(self._view_defs),
            )
        )

    def _find_savepoint(self, name: str) -> int:
        key = name.lower()
        for i in range(len(self._savepoints) - 1, -1, -1):
            if self._savepoints[i][0] == key:
                return i
        raise TransactionError(f"no such savepoint: {name}")

    def release(self, name: str) -> None:
        i = self._find_savepoint(name)
        del self._savepoints[i:]
        if not self._savepoints and self._snapshot is None:
            # outermost savepoint of an implicit transaction → commit
            if self.auto_save and self.auto_save.on == "commit":
                self._perform_auto_save()

    def rollback_to(self, name: str) -> None:
        i = self._find_savepoint(name)
        _, (tables, views), pks, origins, trigs, vdefs = self._savepoints[i]
        del self._savepoints[i + 1 :]
        self._restore_state(
            dict(tables), dict(views), dict(pks), dict(origins), dict(trigs),
            dict(vdefs),
        )

    def _restore_state(
        self,
        tables: dict[str, DataFrame],
        views: dict[str, DataFrame],
        pks: dict,
        origins: dict | None = None,
        triggers: dict | None = None,
        view_defs: dict | None = None,
    ) -> None:
        self._primary_keys = pks
        if origins is not None:
            self._origins = origins
        if triggers is not None:
            self._triggers = triggers
        # drop Spark temp views for objects created since the snapshot —
        # without this a rolled-back CREATE TABLE stays queryable via
        # spark.sql even though the engine catalog forgot it
        for name in (set(self._tables) | set(self._views)) - (
            set(tables) | set(views)
        ):
            try:
                self.spark.catalog.dropTempView(_view_ident(name))
            except Exception:
                pass
        self._tables, self._views = tables, views
        if view_defs is not None:
            self._view_defs = view_defs
        # restored tables may have different row histories — re-count on
        # the next INSERT rather than trust a stale high-water mark
        self._rowid_hwm.clear()
        for name, df in self._tables.items():
            df.createOrReplaceTempView(_view_ident(name))
        self._mark_views_dirty()
        self._refresh_catalog_views()

    # ------------------------------------------------------------- lifecycle

    def dump(
        self,
        output_dir: str,
        format: str = "csv",  # noqa: A002
        compression: str | None = None,
        single_file: bool = True,
    ) -> list[str]:
        from filesql_spark.sinks.dump import dump_database

        return dump_database(
            self,
            output_dir,
            format=format,
            compression=compression,
            single_file=single_file,
        )

    def _perform_auto_save(self) -> None:
        """save.go:364-399: dump to output_dir, or overwrite originals when
        the configured dir is empty."""
        cfg = self.auto_save
        assert cfg is not None
        from filesql_spark.sinks.dump import dump_database, dump_table_to_path

        if cfg.output_dir:
            dump_database(
                self, cfg.output_dir, format=cfg.format or "csv", compression=cfg.compression
            )
            return
        for name, origin in self._origins.items():
            if name in self._tables:
                dump_table_to_path(self._tables[name], origin)

    def close(self) -> None:
        if self._closed:
            return
        if self.auto_save and self.auto_save.on == "close":
            self._perform_auto_save()
        for name in list(self._tables) + list(self._views) + ["sqlite_master"]:
            try:
                self.spark.catalog.dropTempView(_view_ident(name))
            except Exception:
                pass
        for tmp in self._temp_files:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        self._tables.clear()
        self._views.clear()
        self._closed = True

    def __enter__(self) -> Engine:
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class Statement:
    """database/sql ``Stmt``: a reusable statement bound to its engine.
    ``query``/``execute`` mirror Stmt.Query/Stmt.Exec; ``close`` is a
    no-op kept for lifecycle parity (``defer stmt.Close()``)."""

    def __init__(self, engine: Engine, sql: str) -> None:
        self._engine = engine
        self._sql = sql
        self._closed = False

    def query(self, params=None) -> DataFrame:
        self._check_open()
        return self._engine.query(self._sql, params)

    def execute(self, params=None) -> int:
        self._check_open()
        return self._engine.execute(self._sql, params)

    def close(self) -> None:
        self._closed = True

    def _check_open(self) -> None:
        if self._closed:
            raise FilesqlError("statement is closed")

    def __enter__(self) -> "Statement":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def open(*paths: str, spark: SparkSession | None = None) -> Engine:  # noqa: A001
    """filesql.Open equivalent (filesql.go:92-94): load paths, return Engine."""
    if not paths:
        raise FilesqlError("at least one path is required")
    eng = Engine(spark=spark)
    eng.load_paths(list(paths))
    return eng


def _sqlite_style_error(e) -> FilesqlError | None:
    """Map Spark's analysis errors onto SQLite's wording, which the
    reference surfaces verbatim (error-handling code matching
    'no such table'/'no such column' keeps working —
    filesql_test.go:2274 Test_ErrorMessageQuality). The Spark exception
    stays chained as __cause__."""
    cond = None
    for m in ("getCondition", "getErrorClass"):
        try:
            cond = getattr(e, m)()
            break
        except Exception:
            continue
    if not cond:
        return None
    try:
        params = e.getMessageParameters() or {}
    except Exception:
        params = {}

    def unq(s: str | None) -> str:
        return (s or "?").strip("`\"")

    if cond.startswith("TABLE_OR_VIEW_NOT_FOUND"):
        return FilesqlError(f"no such table: {unq(params.get('relationName'))}")
    if cond.startswith("UNRESOLVED_COLUMN"):
        return FilesqlError(f"no such column: {unq(params.get('objectName'))}")
    if cond.startswith("AMBIGUOUS_REFERENCE"):
        return FilesqlError(f"ambiguous column name: {unq(params.get('name'))}")
    if cond == "PARSE_SYNTAX_ERROR":
        tok = (params.get("error") or "?").strip("'")
        return FilesqlError(f'near "{tok}": syntax error')
    return None


def _view_ident(name: str) -> str:
    """Temp-view identifier for createOrReplaceTempView/dropTempView:
    Spark rejects names with spaces/unicode/punctuation unless backticked
    (the reference supports them via double-quoting, filesql_test.go:1736,
    :1892-2273)."""
    import re

    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        return name
    return "`" + name.replace("`", "``") + "`"


def _strip_comments(script: str) -> str:
    """Blank ``--`` and ``/* */`` comments (outside quotes) to spaces.

    Must run BEFORE tokenizing: a semicolon inside a comment would split
    mid-statement, and an apostrophe in a comment (``-- don't``) would
    open a phantom string token swallowing the rest of the script
    (ADVICE r4). Quote scanning mirrors _split_tokens, including the
    doubled-``''`` escape."""
    out: list[str] = []
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if ch == "-" and script.startswith("--", i):
            j = script.find("\n", i)
            j = j if j != -1 else n
            out.append(" " * (j - i))
            i = j
        elif ch == "/" and script.startswith("/*", i):
            j = script.find("*/", i + 2)
            j = j + 2 if j != -1 else n
            out.append(" " * (j - i))
            i = j
        elif ch == "'":
            j = i + 1
            while j < n:
                if script[j] == "'" and j + 1 < n and script[j + 1] == "'":
                    j += 2
                    continue
                if script[j] == "'":
                    break
                j += 1
            out.append(script[i : j + 1])
            i = j + 1
        elif ch in '"`':
            j = script.find(ch, i + 1)
            j = j if j != -1 else n - 1
            out.append(script[i : j + 1])
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _split_statements(script: str) -> list[str]:
    """Comment- and quote-aware split of a SQL script on ``;`` (string
    literals and quoted identifiers are opaque to the splitter; comments
    are blanked first — see _strip_comments)."""
    from filesql_spark.dialect import _split_tokens

    stmts: list[str] = []
    cur: list[str] = []
    for kind, text in _split_tokens(_strip_comments(script)):
        if kind != "code":
            cur.append(text)
            continue
        while ";" in text:
            head, text = text.split(";", 1)
            cur.append(head)
            stmts.append("".join(cur))
            cur = []
        cur.append(text)
    stmts.append("".join(cur))
    return [s for s in (x.strip() for x in stmts) if s]


def _first_keyword(sql: str) -> str:
    import re

    # strip leading whitespace and -- / /* */ comments
    s = re.sub(r"^(\s*(--[^\n]*\n|/\*.*?\*/))*\s*", "", sql, flags=re.S)
    m = re.match(r"(\w+)", s)
    return m.group(1).upper() if m else ""


_IDENT = r"""(?:"([^"]+)"|`([^`]+)`|\[([^\]]+)\]|'([^']+)'|([A-Za-z_][\w$]*))"""


def _ident_of(m) -> str:
    return next(g for g in m.groups()[-5:] if g is not None)


def _savepoint_ident(sql: str, kind: str) -> str:
    """Name from `SAVEPOINT name` / `RELEASE [SAVEPOINT] name` (quoted or
    bare, per the SQLite grammar)."""
    import re

    pat = (
        rf"\s*{kind}\s+(?:SAVEPOINT\s+)?{_IDENT}\s*;?\s*$"
        if kind == "RELEASE"
        else rf"\s*{kind}\s+{_IDENT}\s*;?\s*$"
    )
    m = re.match(pat, sql, re.I)
    if not m:
        raise TransactionError(f"cannot parse {kind} statement: {sql.strip()}")
    return _ident_of(m)


def _savepoint_target(sql: str) -> str | None:
    """`ROLLBACK [TRANSACTION] TO [SAVEPOINT] name` → name; plain
    ROLLBACK → None."""
    import re

    m = re.match(
        rf"\s*ROLLBACK\s+(?:TRANSACTION\s+)?TO\s+(?:SAVEPOINT\s+)?{_IDENT}\s*;?\s*$",
        sql,
        re.I,
    )
    return _ident_of(m) if m else None


def _sqlite_type(spark_type: str) -> str:
    """Spark type → SQLite storage-class name (types.go:172-195 inverse)."""
    if spark_type in ("bigint", "int", "smallint", "tinyint"):
        return "INTEGER"
    if spark_type in ("double", "float"):
        return "REAL"
    return "TEXT"
