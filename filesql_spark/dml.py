"""DML / DDL emulation over temp views (SURVEY §2.B DML rows, §7.2 phase 5).

SQLite mutates B-trees; Spark DataFrames are immutable. Each statement
rewrites the table's DataFrame lazily and re-registers the view:

- INSERT  → union of the existing plan with a literal VALUES (or SELECT) plan
- UPDATE  → ``withColumns(when(pred, new).otherwise(old))``
- DELETE  → ``filter(NOT coalesce(pred, false))`` (NULL predicate keeps the
  row, matching SQL three-valued DELETE semantics)
- CREATE TABLE/VIEW, DROP, CREATE INDEX (accepted no-op), TRIGGER (error) —
  reference advertises these via SQLite (README.md:333-334)

Affected-row counts match database/sql's Exec contract.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from filesql_spark import dialect
from filesql_spark.errors import FilesqlError

_IDENT = r'(?:"(?P<q>[^"]+)"|`(?P<b>[^`]+)`|(?P<p>[\w-￿]+))'


def _ident(m: re.Match) -> str:
    return m.group("q") or m.group("b") or m.group("p")


def execute(engine, sql: str) -> int:
    head = sql.lstrip()
    kw = head.split(None, 1)[0].upper() if head.split() else ""
    if kw == "INSERT":
        n, _rows = _insert(engine, sql)
        return n
    if kw == "UPDATE":
        return _update(engine, sql)
    if kw == "DELETE":
        return _delete(engine, sql)
    if kw == "CREATE":
        return _create(engine, sql)
    if kw == "DROP":
        return _drop(engine, sql)
    raise FilesqlError(f"unsupported statement: {kw}")


def insert_returning(engine, sql: str):
    """INSERT … RETURNING … → DataFrame of the returned rows (SQLite
    3.35+, inherited by the reference's engine). The insert is applied as
    a side effect, like SQLite's."""
    _n, rows = _insert(engine, sql)
    if rows is None:
        raise FilesqlError("query() on INSERT requires a RETURNING clause")
    return rows


def _code_only(sql: str) -> str:
    """The statement with string literals / quoted identifiers blanked to
    same-length spaces (positions stay aligned with ``sql``) — keyword
    guards must never fire on user data inside literals."""
    return "".join(
        text if kind == "code" else " " * len(text)
        for kind, text in dialect._split_tokens(sql)
    )


def _strip_returning(sql: str) -> tuple[str, list[str] | None]:
    """Split a trailing ``RETURNING expr, …`` off a DML statement.

    The keyword is located on the literal-blanked text (a column value
    containing the word 'returning' must not trigger), at any paren
    depth 0 position — SQLite only allows it as the final clause."""
    code = _code_only(sql)
    depth = 0
    for m in re.finditer(r"[()]|\bRETURNING\b", code, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            exprs = _split_level0(sql[m.end() :].strip().rstrip(";"))
            if not exprs:
                raise FilesqlError("RETURNING requires at least one expression")
            return sql[: m.start()], exprs
    return sql, None


# ------------------------------------------------------------------- INSERT

_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+(?:OR\s+\w+\s+)?INTO\s+{_IDENT}\s*"
    r"(?:\((?P<cols>[^)]*)\))?\s*(?P<body>VALUES\b.*|SELECT\b.*|WITH\b.*)$",
    re.I | re.S,
)


def _insert(engine, sql: str) -> tuple[int, "object | None"]:
    """Apply an INSERT; returns (affected rows, RETURNING DataFrame | None)."""
    sql, returning = _strip_returning(sql)
    # SQLite upsert forms need a primary-key concept DataFrame views don't
    # have — reject them explicitly instead of silently inserting
    # (reference inherits them from SQLite; not exercised in its tests).
    # Guards scan the literal-blanked text: inserted VALUES containing the
    # words 'on conflict' must not trip them (ADVICE r4).
    if re.match(r"\s*INSERT\s+OR\s+\w+", sql, re.I) or re.search(
        r"\bON\s+CONFLICT\b", _code_only(sql), re.I
    ):
        raise FilesqlError(
            "INSERT OR REPLACE/IGNORE and ON CONFLICT are not supported "
            "(no primary-key/unique constraints on DataFrame-backed tables)"
        )
    m = _INSERT_RE.match(sql)
    if not m:
        raise FilesqlError(f"cannot parse INSERT: {sql.strip()[:120]}")
    table = _ident(m)
    target = engine.table(table)
    body = m.group("body").rstrip().rstrip(";")

    src = engine.spark.sql(dialect.rewrite(body))

    if m.group("cols"):
        names = [c.strip().strip('"`') for c in m.group("cols").split(",")]
    else:
        names = target.columns
    if len(src.columns) != len(names):
        raise FilesqlError(
            f"INSERT column count mismatch: {len(src.columns)} values for {len(names)} columns"
        )
    src = src.toDF(*names)

    # missing columns → NULL; align types to the target schema
    target_types = {f.name: f.dataType for f in target.schema.fields}
    aligned = src.select(
        *[
            (F.col(c).cast(target_types[c]) if c in src.columns else F.lit(None).cast(target_types[c])).alias(c)
            for c in target.columns
        ]
    )
    n = aligned.count()
    engine._reregister(table, target.unionByName(aligned))
    if returning is None:
        return n, None
    # RETURNING evaluates over the inserted rows (SQLite semantics); '*'
    # is the aligned row itself, expressions go through the dialect shim
    cols = [
        "*" if e.strip() == "*" else F.expr(dialect.rewrite(e))
        for e in returning
    ]
    return n, aligned.select(*cols)


# ------------------------------------------------------------------- UPDATE

_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+{_IDENT}\s+SET\s+(?P<body>.*)$", re.I | re.S
)


def _split_level0(text: str, sep: str = ",") -> list[str]:
    """Split on commas at paren depth 0, outside string literals."""
    parts, depth, in_str, start = [], 0, False, 0
    for i, ch in enumerate(text):
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == sep and depth == 0:
                parts.append(text[start:i])
                start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _extract_where(body: str) -> tuple[str, str | None]:
    """Split '... WHERE pred' at depth 0 (quote-aware)."""
    depth, in_str = 0, False
    low = body.lower()
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and low.startswith("where", i) and (
                i == 0 or not body[i - 1].isalnum()
            ):
                nxt = i + 5
                if nxt >= len(body) or not body[nxt].isalnum():
                    return body[:i].strip(), body[nxt:].strip().rstrip(";")
        i += 1
    return body.strip().rstrip(";"), None


def _update(engine, sql: str) -> int:
    sql, returning = _strip_returning(sql)
    if returning is not None:
        raise FilesqlError(
            "RETURNING is only supported on INSERT (UPDATE/DELETE rewrite "
            "the whole DataFrame; there is no per-row changed set to return)"
        )
    m = _UPDATE_RE.match(sql)
    if not m:
        raise FilesqlError(f"cannot parse UPDATE: {sql.strip()[:120]}")
    table = _ident(m)
    df = engine.table(table)
    set_part, where = _extract_where(m.group("body"))

    pred = (
        F.coalesce(F.expr(dialect.rewrite(where)).cast("boolean"), F.lit(False))
        if where
        else F.lit(True)
    )
    assigns = {}
    for piece in _split_level0(set_part):
        col, _eq, expr_src = piece.partition("=")
        name = col.strip().strip('"`')
        if name not in df.columns:
            raise FilesqlError(f"UPDATE: no such column {name!r} in {table!r}")
        new_val = F.expr(dialect.rewrite(expr_src.strip())).cast(
            dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[name]
        )
        assigns[name] = F.when(pred, new_val).otherwise(F.col(name))

    n = df.filter(pred).count()
    engine._reregister(table, df.withColumns(assigns))
    return n


# ------------------------------------------------------------------- DELETE

_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+{_IDENT}\s*(?P<rest>.*)$", re.I | re.S
)


def _delete(engine, sql: str) -> int:
    sql, returning = _strip_returning(sql)
    if returning is not None:
        raise FilesqlError(
            "RETURNING is only supported on INSERT (UPDATE/DELETE rewrite "
            "the whole DataFrame; there is no per-row changed set to return)"
        )
    m = _DELETE_RE.match(sql)
    if not m:
        raise FilesqlError(f"cannot parse DELETE: {sql.strip()[:120]}")
    table = _ident(m)
    df = engine.table(table)
    rest = m.group("rest").strip().rstrip(";")
    if rest:
        if not rest.lower().startswith("where"):
            raise FilesqlError(f"cannot parse DELETE tail: {rest[:80]}")
        pred = F.coalesce(
            F.expr(dialect.rewrite(rest[5:].strip())).cast("boolean"), F.lit(False)
        )
    else:
        pred = F.lit(True)
    n = df.filter(pred).count()
    engine._reregister(table, df.filter(~pred))
    return n


# --------------------------------------------------------------------- DDL

_CREATE_TABLE_RE = re.compile(
    rf"^\s*CREATE\s+(?:TEMP(?:ORARY)?\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s*"
    r"(?P<body>\(.*\)|AS\s+.*)$",
    re.I | re.S,
)
_CREATE_VIEW_RE = re.compile(
    rf"^\s*CREATE\s+(?:TEMP(?:ORARY)?\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s+AS\s+(?P<body>.*)$",
    re.I | re.S,
)

_SQLITE_TO_SPARK_TYPE = [
    ("INT", "long"),
    ("CHAR", "string"),
    ("CLOB", "string"),
    ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"),
    ("FLOA", "double"),
    ("DOUB", "double"),
    ("NUMERIC", "double"),
    ("DECIMAL", "double"),
    ("BOOL", "boolean"),
    ("DATE", "string"),  # SQLite stores datetimes as TEXT (types.go:190-192)
    ("TIME", "string"),
]


def _affinity(sqlite_type: str) -> str:
    """SQLite type-affinity rules, mapped onto Spark types."""
    t = sqlite_type.upper()
    for frag, spark_t in _SQLITE_TO_SPARK_TYPE:
        if frag in t:
            return spark_t
    return "string"


def _create(engine, sql: str) -> int:
    low = sql.lstrip().lower()
    if re.match(r"create\s+(unique\s+)?index", low):
        return 0  # accepted and ignored (no indexes in Spark; SURVEY §2.B)
    if "trigger" in low.split()[:3]:
        raise FilesqlError("CREATE TRIGGER is not supported by this engine")

    m = _CREATE_VIEW_RE.match(sql)
    if m:
        name = _ident(m)
        df = engine.spark.sql(dialect.rewrite(m.group("body").rstrip().rstrip(";")))
        engine._views[name] = df
        df.createOrReplaceTempView(name)
        engine._refresh_catalog_views()
        return 0

    m = _CREATE_TABLE_RE.match(sql)
    if m:
        name = _ident(m)
        body = m.group("body").strip().rstrip(";")
        if body.upper().startswith("AS"):
            df = engine.spark.sql(dialect.rewrite(body[2:].strip()))
        else:
            cols = _split_level0(body[1:-1])
            fields = []
            for c in cols:
                if re.match(r"(?i)^(PRIMARY|UNIQUE|CHECK|FOREIGN|CONSTRAINT)\b", c):
                    continue  # table-level constraints: accepted, ignored
                parts = c.split()
                cname = parts[0].strip('"`')
                ctype = _affinity(parts[1]) if len(parts) > 1 else "string"
                fields.append(f"`{cname}` {ctype}")
            df = engine.spark.createDataFrame([], schema=", ".join(fields))
        if name in engine._tables:
            if "IF NOT EXISTS" in sql.upper():
                return 0
            # SQLite raises here; silently replacing would drop user data
            from filesql_spark.errors import DuplicateTableError

            raise DuplicateTableError(f"table {name!r} already exists")
        engine.register(name, df)
        return 0
    raise FilesqlError(f"cannot parse CREATE: {sql.strip()[:120]}")


def _drop(engine, sql: str) -> int:
    m = re.match(
        rf"^\s*DROP\s+(?P<kind>TABLE|VIEW|INDEX)\s+(?:IF\s+EXISTS\s+)?{_IDENT}\s*;?\s*$",
        sql,
        re.I,
    )
    if not m:
        raise FilesqlError(f"cannot parse DROP: {sql.strip()[:120]}")
    kind, name = m.group("kind").upper(), _ident(m)
    if_exists = re.search(r"(?i)IF\s+EXISTS", sql) is not None
    if kind == "INDEX":
        return 0
    store = engine._tables if kind == "TABLE" else engine._views
    if name not in store:
        if if_exists:
            return 0
        raise FilesqlError(f"no such {kind.lower()}: {name}")
    del store[name]
    from filesql_spark.engine import _view_ident

    engine.spark.catalog.dropTempView(_view_ident(name))
    engine._refresh_catalog_views()
    return 0
