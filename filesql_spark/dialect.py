"""SQLite → Spark SQL dialect shim.

The reference's query surface *is* SQLite's dialect (README.md:326-334);
users of this engine bring SQLite-flavored SQL. Spark SQL covers almost all
of it natively — the shim rewrites the rest:

- double-quoted identifiers → backticks (SQL-standard ``"t"`` vs Spark's
  default, which parses double quotes as strings);
- function renames/reshapes: strftime → date_format (format-code
  translation + argument swap), julianday → epoch arithmetic,
  printf → format_string, ifnull → nvl, group_concat → concat_ws∘
  collect_list, random → 64-bit rand;
- ``sqlite_master`` works because the engine registers a compat view
  (engine.py) — no rewrite needed here.

The rewriter is token-aware (single-quoted strings and quoted identifiers
are never rewritten inside) and uses balanced-paren argument extraction for
function reshapes — not naive regex over the whole text.
"""

from __future__ import annotations

from filesql_spark.errors import FilesqlError

# strftime format codes → Spark/Java datetime pattern fragments
_STRFTIME_MAP = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%j": "DDD",
    "%e": "d",
    "%I": "hh",
    "%p": "a",
    "%%": "%",
}


def _split_tokens(sql: str) -> list[tuple[str, str]]:
    """Split into ('code' | 'string' | 'dquote' | 'backtick', text) chunks."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        ch = sql[i]
        if ch == "'":
            if buf:
                out.append(("code", "".join(buf)))
                buf = []
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append(("string", sql[i : j + 1]))
            i = j + 1
        elif ch == '"':
            if buf:
                out.append(("code", "".join(buf)))
                buf = []
            j = sql.find('"', i + 1)
            j = j if j != -1 else n - 1
            out.append(("dquote", sql[i : j + 1]))
            i = j + 1
        elif ch == "`":
            if buf:
                out.append(("code", "".join(buf)))
                buf = []
            j = sql.find("`", i + 1)
            j = j if j != -1 else n - 1
            out.append(("backtick", sql[i : j + 1]))
            i = j + 1
        else:
            buf.append(ch)
            i += 1
    if buf:
        out.append(("code", "".join(buf)))
    return out


def _requote_identifiers(sql: str) -> str:
    """\"ident\" → `ident` (outside string literals)."""
    parts = []
    for kind, text in _split_tokens(sql):
        if kind == "dquote":
            parts.append("`" + text[1:-1].replace("`", "``") + "`")
        else:
            parts.append(text)
    return "".join(parts)


def _find_call(sql: str, name: str, start: int = 0) -> tuple[int, int, list[str]] | None:
    """Locate ``name( … )`` at a code position; return (start, end_exclusive,
    args) with balanced-paren, quote-aware arg splitting."""
    low = sql.lower()
    name_l = name.lower()
    i = start
    while True:
        i = low.find(name_l, i)
        if i == -1:
            return None
        before = sql[i - 1] if i > 0 else " "
        after_idx = i + len(name_l)
        # must be a standalone identifier followed by '('
        if (before.isalnum() or before in "_`\"'") or after_idx >= len(sql):
            i += len(name_l)
            continue
        j = after_idx
        while j < len(sql) and sql[j] in " \t\n":
            j += 1
        if j >= len(sql) or sql[j] != "(":
            i += len(name_l)
            continue
        # check we're not inside a string literal: count quotes before i
        if sql[:i].count("'") % 2 == 1:
            i += len(name_l)
            continue
        depth, k = 0, j
        args: list[str] = []
        arg_start = j + 1
        in_str = False
        while k < len(sql):
            ch = sql[k]
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        args.append(sql[arg_start:k])
                        return i, k + 1, [a.strip() for a in args if a.strip() or len(args) > 0]
                elif ch == "," and depth == 1:
                    args.append(sql[arg_start:k])
                    arg_start = k + 1
            k += 1
        return None  # unbalanced; leave untouched


def _rewrite_calls(sql: str, name: str, builder) -> str:
    """Repeatedly rewrite every ``name(...)`` call via builder(args)->str."""
    pos = 0
    while True:
        hit = _find_call(sql, name, pos)
        if hit is None:
            return sql
        start, end, args = hit
        replacement = builder(args)
        sql = sql[:start] + replacement + sql[end:]
        pos = start + len(replacement)


def translate_strftime_format(fmt: str) -> str:
    """SQLite strftime codes → Java pattern; raise on unsupported codes."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            if code in _STRFTIME_MAP:
                out.append(_STRFTIME_MAP[code])
                i += 2
                continue
            raise FilesqlError(f"unsupported strftime code {code!r} in {fmt!r}")
        # literal character — quote letters so Java doesn't interpret them
        ch = fmt[i]
        out.append(f"'{ch}'" if ch.isalpha() else ch)
        i += 1
    return "".join(out)


def _strftime(args: list[str]) -> str:
    if len(args) != 2:
        raise FilesqlError(f"strftime expects 2 args, got {len(args)}: {args}")
    fmt, expr = args[0].strip(), args[1]
    if not (fmt.startswith("'") and fmt.endswith("'")):
        raise FilesqlError("strftime format must be a string literal")
    inner = fmt[1:-1]
    if inner == "%s":
        return f"CAST(unix_timestamp(CAST(({expr}) AS TIMESTAMP)) AS STRING)"
    java = translate_strftime_format(inner)
    return f"date_format(CAST(({expr}) AS TIMESTAMP), '{java}')"


def _julianday(args: list[str]) -> str:
    (expr,) = args
    return (
        f"(unix_micros(CAST(({expr}) AS TIMESTAMP)) / 86400000000.0 + 2440587.5)"
    )


def _group_concat(args: list[str]) -> str:
    if len(args) == 1:
        return f"concat_ws(',', collect_list({args[0]}))"
    return f"concat_ws({args[1]}, collect_list({args[0]}))"


def _random(args: list[str]) -> str:
    # SQLite random(): uniform int64
    return "CAST((rand() - 0.5) * 1.8446744073709552E19 AS BIGINT)"


def _scalar_minmax(fn: str):
    """SQLite MIN/MAX are scalar with ≥2 args (→ least/greatest) and
    aggregates with 1 arg (→ leave untouched)."""

    def build(args: list[str]) -> str:
        if len(args) >= 2:
            return f"{fn}({', '.join(args)})"
        name = "min" if fn == "least" else "max"
        return f"{name}({', '.join(args)})"

    return build


def _now_family(kind: str):
    """date('now') / datetime('now') / time('now') → TEXT timestamps, like
    SQLite. Only the 'now' form is supported; modifiers raise."""
    fmt = {"date": "yyyy-MM-dd", "datetime": "yyyy-MM-dd HH:mm:ss", "time": "HH:mm:ss"}[kind]

    def build(args: list[str]) -> str:
        stripped = [a.strip().lower() for a in args]
        if stripped == ["'now'"]:
            return f"date_format(current_timestamp(), '{fmt}')"
        if len(args) == 1:
            # date/datetime/time(expr): normalize a datetime TEXT/timestamp
            return f"date_format(CAST(({args[0]}) AS TIMESTAMP), '{fmt}')"
        raise FilesqlError(
            f"{kind}() supports {kind}('now') or a single datetime expression; "
            f"modifiers are not implemented"
        )

    return build


_SIMPLE_RENAMES = {
    "printf": "format_string",
    "ifnull": "nvl",
}

_CALL_REWRITES = {
    "strftime": _strftime,
    "julianday": _julianday,
    "group_concat": _group_concat,
    "random": _random,
    "min": _scalar_minmax("least"),
    "max": _scalar_minmax("greatest"),
    "date": _now_family("date"),
    "datetime": _now_family("datetime"),
    "time": _now_family("time"),
}


def rewrite(sql: str) -> str:
    """SQLite-dialect SQL → Spark SQL."""
    sql = _requote_identifiers(sql)
    for name, fn in _CALL_REWRITES.items():
        sql = _rewrite_calls(sql, name, fn)
    for old, new in _SIMPLE_RENAMES.items():
        sql = _rewrite_calls(sql, old, lambda args, n=new: f"{n}({', '.join(args)})")
    return sql
