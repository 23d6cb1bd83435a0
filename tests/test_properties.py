"""Property-based tests (hypothesis) — the reference has no randomized
testing at all (SURVEY §5); these pin the pure-Python kernels.

Spark-free on purpose: properties run hundreds of examples, so they stick
to driver-side logic (inference, naming, dialect) where a case explosion
is cheap.
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from filesql_spark.dialect import rewrite
from filesql_spark.inference import ColumnType, classify_value, infer_column_type
from filesql_spark.naming import sanitize_name, table_name_from_path
from filesql_spark.sources.detect import SUPPORTED_SUFFIXES, detect_file_type


@given(st.lists(st.text(max_size=30), max_size=200))
@settings(max_examples=200, deadline=None)
def test_inference_total(values):
    """Never crashes; always returns one of the four types."""
    assert infer_column_type(values) in set(ColumnType)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_all_ints_infer_integer(xs):
    assert infer_column_type([str(x) for x in xs]) == ColumnType.INTEGER


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_floats_infer_numeric(xs):
    """repr(float) values always classify numeric (INTEGER when integral)."""
    got = infer_column_type([repr(x) for x in xs])
    assert got in (ColumnType.REAL, ColumnType.INTEGER)


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_classify_total(v):
    assert classify_value(v) in set(ColumnType)


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_sanitize_always_valid(name):
    """Sanitized names are non-empty, ASCII, and never digit-leading."""
    s = sanitize_name(name)
    assert s and s.isascii()
    assert not s[0].isdigit()
    assert all(c.isalnum() or c == "_" for c in s)


@given(
    st.text(
        alphabet=st.characters(blacklist_characters="/\0", blacklist_categories=("Cs",)),
        min_size=1,
        max_size=20,
    ).filter(lambda s: s.strip() and not s.startswith(".")),
    st.sampled_from(SUPPORTED_SUFFIXES),
)
@settings(max_examples=200, deadline=None)
def test_naming_strips_exactly_the_suffixes(stem, suffix):
    """table_name_from_path inverts the extension grammar for any stem
    that doesn't itself end in a supported extension."""
    if any(stem.lower().endswith(e) for e in (".csv", ".tsv", ".ltsv", ".parquet", ".xlsx", ".gz", ".bz2", ".xz", ".zst")):
        return
    path = f"/tmp/{stem}{suffix}"
    fmt, comp = detect_file_type(path)  # must parse
    assert table_name_from_path(path) == stem


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60))
@settings(max_examples=300, deadline=None)
def test_rewrite_total(sql):
    """The dialect rewriter never raises on arbitrary input text."""
    try:
        rewrite(sql)
    except Exception as ex:  # only the documented error type is allowed
        from filesql_spark.errors import FilesqlError

        assert isinstance(ex, FilesqlError)


@given(st.text(alphabet="abcdefghij ,.'()", max_size=60))
@settings(max_examples=300, deadline=None)
def test_rewrite_preserves_single_quoted_literals(sql):
    """Content inside balanced single-quoted strings survives verbatim
    (double quotes excluded — identifier re-quoting rewrites those)."""
    import re

    out = rewrite(sql)
    if sql.count("'") % 2 == 0:
        for lit in re.findall(r"'[^']*'", sql):
            if "(" not in lit:  # function-shaped text may legitimately move
                assert lit in out


# ---------------------------------------------------- GLOB translation


from hypothesis import given, settings as _hyp_settings
from hypothesis import strategies as _st

_glob_chars = _st.sampled_from(list("abcX.?*-") + ["[a-c]", "[xyz]"])


@_hyp_settings(max_examples=200, deadline=None)
@given(
    pat=_st.lists(_glob_chars, min_size=0, max_size=6).map("".join),
    s=_st.text(alphabet="abcxyzX.-", min_size=0, max_size=8),
)
def test_glob_regex_matches_fnmatch(pat, s):
    """_glob_regex must agree with Python's fnmatch (the same */?/[class]
    semantics SQLite's GLOB implements) on every literal pattern without
    negated classes."""
    import fnmatch
    import re as _re

    from filesql_spark.dialect import _glob_regex

    want = fnmatch.fnmatchcase(s, pat)
    got = _re.fullmatch(_glob_regex(pat)[1:-1], s) is not None
    assert got == want, (pat, s)


# ------------------------------------------ dialect rewrite is conservative


_ident = _st.text(alphabet="abcdefgh_", min_size=1, max_size=8).filter(
    # exclude every name the shim rewrites (they'd legitimately change)
    lambda s: s not in {
        "strftime", "julianday", "unixepoch", "group_concat", "random",
        "total", "log", "char", "quote", "min", "max", "date", "datetime",
        "time", "printf", "format", "ifnull", "iif", "unicode",
        "likely", "unlikely", "likelihood",
    }
)
_str_lit = _st.text(
    alphabet="abc LIKE GLOB collate ' x%", min_size=0, max_size=12
).map(lambda s: "'" + s.replace("'", "''") + "'")
_num = _st.integers(min_value=0, max_value=999).map(str)
_term = _st.one_of(_ident, _str_lit, _num)


@_hyp_settings(max_examples=300, deadline=None)
@given(
    cols=_st.lists(_term, min_size=1, max_size=4),
    tbl=_ident,
    where_lhs=_ident,
    where_rhs=_term,
)
def test_rewrite_identity_on_plain_ansi(cols, tbl, where_lhs, where_rhs):
    """rewrite() must be the identity on SQL containing no SQLite-isms —
    including when string literals contain LIKE/GLOB/COLLATE keywords or
    doubled-quote escapes. Guards against over-eager token rewrites."""
    from filesql_spark.dialect import rewrite

    sql = (
        f"SELECT {', '.join(cols)} FROM {tbl} "
        f"WHERE {where_lhs} = {where_rhs} ORDER BY {where_lhs}"
    )
    assert rewrite(sql) == sql


@_hyp_settings(max_examples=500, deadline=None)
@given(
    pat=_st.text(alphabet="ab*?[]^-\\c", min_size=0, max_size=6),
    s=_st.text(alphabet="abc]-^\\", min_size=0, max_size=5),
)
def test_glob_regex_matches_real_sqlite(pat, s):
    """_glob_regex against the REAL oracle — sqlite3's own GLOB — over
    adversarial class/escape characters. Degenerate class ranges
    ([b-a], [a-*]), which regex engines reject, must surface as a clean
    translate-time FilesqlError, never a runtime RLIKE failure."""
    import re as _re
    import sqlite3

    from filesql_spark.dialect import _glob_regex
    from filesql_spark.errors import FilesqlError

    con = sqlite3.connect(":memory:")
    want = con.execute("SELECT ? GLOB ?", (s, pat)).fetchone()[0]
    try:
        rx = _glob_regex(pat)
    except FilesqlError:
        return  # refused degenerate class — documented divergence
    got = 1 if _re.fullmatch(rx[1:-1], s) else 0
    assert got == want, (pat, s, rx)


# ---------------------------------------------------------------- round 7


@given(
    st.integers(min_value=0, max_value=2**50),
    st.integers(min_value=0, max_value=600_000_000),
)
@settings(max_examples=300, deadline=None)
def test_interval_band_covers_window(tl, dt):
    """The banded interval join's coverage invariant: a right row within
    [tl, tl+D] always falls in the left row's band or the next one —
    the two probe buckets are sufficient (no missed pairs)."""
    D = 600_000_000
    bl = tl // D
    br = (tl + dt) // D
    assert br in (bl, bl + 1)


@given(
    st.integers(min_value=-(10**7), max_value=10**7),
    st.integers(min_value=1, max_value=10**4),
)
@settings(max_examples=300, deadline=None)
def test_kmeans_centroid_rounding_is_half_up(s, n):
    """FLOOR((2s+n)/(2n)) == round-half-up(s/n), the exact-rational check
    of the double-arithmetic formula both engines evaluate."""
    from filesql_spark.pipeline.clustering import _round_half_up_mean

    r = _round_half_up_mean(s, n)
    # rational half-up: floor((2s + n) / (2n)) in exact integer arithmetic
    expect = (2 * s + n) // (2 * n)
    assert r == expect
    assert abs(s / n - r) <= 0.5 + 1e-12


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.tuples(
            st.integers(min_value=1, max_value=10**6),  # observed count
            st.integers(min_value=1, max_value=9),  # weight parts
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=300, deadline=None)
def test_mixture_thresholds_feasible(strata):
    """The mixture-resample threshold formula (exact integer arithmetic):
    every stratum's bucket threshold is in [0, 10^4], and the scarcest
    stratum is kept exactly whole."""
    W = sum(w for _, w in strata.values())
    scarcest = min(strata, key=lambda s: (strata[s][0] * W / strata[s][1], s))
    n_m, w_m = strata[scarcest]
    thresholds = {
        s: (10000 * n_m * w) // (w_m * n) for s, (n, w) in strata.items()
    }
    assert all(0 <= t <= 10000 for t in thresholds.values())
    assert thresholds[scarcest] == 10000


@given(
    st.integers(min_value=1, max_value=5000),  # n tokens
    st.integers(min_value=1, max_value=256),  # window
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_chunk_layout_formula_covers_exactly(n, window, data):
    """The chunk-start formula used by pipeline/text.py chunk_tokens
    (greatest(0, (n - window + stride - 1) div stride) last start) tiles
    [0, n) with no gap for any stride ≤ window: every token is covered,
    the tail chunk ends exactly at n, middles are full windows."""
    stride = data.draw(st.integers(min_value=1, max_value=window))
    k = max(0, -((-(n - window)) // stride)) if n > window else 0
    starts = [i * stride for i in range(k + 1)]
    lens = [min(window, n - s) for s in starts]
    assert all(ln >= 1 for ln in lens)  # no empty chunk emitted
    assert starts[-1] + lens[-1] == n  # tail covered exactly
    for i in range(len(starts) - 1):
        assert lens[i] == window  # all but last are full windows
        assert starts[i + 1] <= starts[i] + lens[i]  # no gap
    # spark `div` truncates, python // floors; they agree on the only
    # negative operand case because greatest(0, .) pins it — mirror that
    spark_k = max(0, int((n - window + stride - 1) / stride))
    assert spark_k == k


# ------------------------------------------------- round-7c kernels


@given(
    st.lists(
        st.sampled_from("abcdefgh"), min_size=1, max_size=60
    )
)
@settings(max_examples=150, deadline=None)
def test_entropy_identity_matches_reference(tokens):
    """The H = log2(n) − (Σ c·log2 c)/n rearrangement used by
    text.token_entropy equals the textbook −Σ p·log2 p within float
    noise, and Simpson diversity stays in [0, 1)."""
    import math
    from collections import Counter

    n = len(tokens)
    counts = Counter(tokens).values()
    direct = -sum((c / n) * math.log2(c / n) for c in counts)
    rearranged = math.log2(n) - sum(c * math.log2(c) for c in counts) / n
    assert abs(direct - rearranged) < 1e-9
    simpson = 1.0 - sum(c * c for c in counts) / (n * n)
    assert 0.0 <= simpson < 1.0
    # entropy maxes at log2(distinct): equality iff uniform counts
    assert rearranged <= math.log2(len(counts)) + 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8), st.integers(1, 5)),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 6),
)
@settings(max_examples=60, deadline=None)
def test_pagerank_reference_mass_conserved(edge_list, iters):
    """Driver-side reference of pipeline/graph.py's recurrence (incl.
    the dangling mass = 1 − Σcontrib identity): total mass stays 1 for
    ANY weighted digraph and iteration count, and every rank keeps the
    (1−d)/N floor."""
    d = 0.85
    edges = {}
    for a, b, w in edge_list:
        edges[(a, b)] = edges.get((a, b), 0) + w
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out_w = {}
    for (a, _), w in edges.items():
        out_w[a] = out_w.get(a, 0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for (a, b), w in edges.items():
            contrib[b] += rank[a] * (w / out_w[a])
        dang = 1.0 - sum(contrib.values())
        rank = {
            v: (1 - d) / n + d * (contrib[v] + dang / n) for v in nodes
        }
        assert abs(sum(rank.values()) - 1.0) < 1e-9
        assert all(r >= (1 - d) / n - 1e-12 for r in rank.values())


@given(st.integers(1, 10**6), st.integers(1, 10**6))
@settings(max_examples=200, deadline=None)
@example(num=62993, den=125000)  # (x/den)*1e6 rounds below the exact ppm
def test_ppm_floor_division_bounds(num, den):
    """The exact integer-ppm idiom (x·10⁶ div n) used across the
    round-7c gates never exceeds 10⁶ for x ≤ n and loses < 1 ppm vs
    the real ratio.

    The bound is checked with Fraction: the earlier float form
    ``(x/den)*1e6`` can round below the exact integer ppm (e.g.
    62993/125000 → 503943.99999999994 vs exact 503944), which is IEEE
    rounding in the *test*, not an engine error.
    """
    from fractions import Fraction

    x = min(num, den)
    ppm = x * 1_000_000 // den
    assert 0 <= ppm <= 1_000_000
    diff = Fraction(x, den) * 1_000_000 - ppm
    assert 0 <= diff < 1


# ------------------------------------------------------- round-8 kernels


def test_remove_dup_spans_matches_python_reference(spark):
    """remove_dup_spans vs a direct Python reference on randomized small
    corpora (shared spans planted + random filler)."""
    import hashlib
    import random

    from filesql_spark.pipeline.text import remove_dup_spans

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    for seed in [1, 5, 9]:
        rng = random.Random(seed)
        shared = " ".join(rng.choice(vocab) for _ in range(6))
        docs = []
        for i in range(8):
            words = [rng.choice(vocab) for _ in range(rng.randrange(3, 15))]
            if i % 3 == 0:
                pos = rng.randrange(0, len(words) + 1)
                words[pos:pos] = shared.split()
            docs.append((i, " ".join(words)))

        # python reference: 5-gram positions, cross-doc dup set, covered
        n = 5
        grams = {}
        for did, text in docs:
            w = text.split(" ")
            for p in range(len(w) - n + 1):
                g = " ".join(w[p : p + n])
                grams.setdefault(g, set()).add(did)
        dup = {g for g, ds in grams.items() if len(ds) >= 2}
        want = {}
        for did, text in docs:
            w = text.split(" ")
            covered = set()
            for p in range(len(w) - n + 1):
                if " ".join(w[p : p + n]) in dup:
                    covered.update(range(p, p + n))
            kept = [w[i] for i in range(len(w)) if i not in covered]
            want[did] = (
                len(w),
                len(w) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_hash)
            for r in remove_dup_spans(df).collect()
        }
        assert got == want, seed


def test_user_streaks_matches_python_reference(spark, tmp_path):
    import datetime as dt
    import os
    import random

    base = dt.datetime(2024, 1, 1, 9, 0)
    rng = random.Random(17)
    rows = []
    days_by_user = {}
    eid = 0
    for u in range(6):
        days = sorted(rng.sample(range(30), rng.randrange(1, 12)))
        days_by_user[u] = days
        for d in days:
            for _ in range(rng.randrange(1, 3)):  # multiple events per day
                rows.append((eid, base + dt.timedelta(days=d, minutes=eid % 60), u, "view", 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))

    def ref(days):
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        return (len(days), max(runs), len(runs))

    from filesql_spark.queries.relational import events_user_streaks

    got = {
        r.user_id: (r.n_active_days, r.longest_streak, r.n_streaks)
        for r in events_user_streaks(spark, d).collect()
    }
    assert got == {u: ref(days) for u, days in days_by_user.items()}


def test_stickiness_matches_python_reference(spark, tmp_path):
    import datetime as dt
    import os
    import random

    base = dt.datetime(2024, 2, 1)
    rng = random.Random(23)
    pairs = set()
    for u in range(10):
        for d in rng.sample(range(20), rng.randrange(1, 10)):
            pairs.add((u, d))
    rows = [
        (i, base + dt.timedelta(days=d, hours=u % 24), u, "view", 1.0, "{}")
        for i, (u, d) in enumerate(sorted(pairs))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    p = str(tmp_path / "sf")
    os.makedirs(p)
    df.write.parquet(os.path.join(p, "events.parquet"))

    from filesql_spark.queries.pipeline_queries import events_stickiness_dau_wau

    got = {
        r.day.date(): (r.dau, r.wau, r.stickiness_ppm)
        for r in events_stickiness_dau_wau(spark, p).collect()
    }
    active_days = {d for _, d in pairs}
    for d in active_days:
        day = (base + dt.timedelta(days=d)).date()
        dau = sum(1 for u, dd in pairs if dd == d)
        wau = len({u for u, dd in pairs if d - 6 <= dd <= d})
        assert got[day] == (dau, wau, dau * 1_000_000 // wau), day


# ----------------------------------------------------------- bind_params
# Placeholder binding must be a pure text transform whose literals
# survive the full rewrite pipeline byte-for-byte. Spark-free: bind,
# rewrite, then re-extract the literal and compare.


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_bind_string_survives_rewrite(s):
    from filesql_spark.dialect import _literal_content, _split_tokens, bind_params

    bound = bind_params("SELECT ? AS v", [s])
    # the bound literal is valid SQLite: exactly one string token, whose
    # content is the original value
    toks = [t for k, t in _split_tokens(bound) if k == "string"]
    assert len(toks) == 1
    assert toks[0][1:-1].replace("''", "'") == s
    # and the full dialect rewrite keeps it intact (post-rewrite content
    # is read back with the Spark-escaping-aware extractor)
    rewritten = rewrite(bound)
    rtoks = [t for k, t in _split_tokens(rewritten) if k == "string"]
    assert len(rtoks) == 1
    assert _literal_content(rtoks[0]) == s


@given(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.binary(max_size=20),
    )
)
@settings(max_examples=200, deadline=None)
def test_bind_scalar_renders_parseable_literal(v):
    from filesql_spark.dialect import bind_params

    bound = bind_params("SELECT ? AS v", [v])
    # no placeholder survives, and the statement still rewrites cleanly
    assert "?" not in bound
    rewrite(bound)


@given(st.integers(min_value=1, max_value=6), st.integers(min_value=0, max_value=7))
@settings(max_examples=100, deadline=None)
def test_bind_positional_counting(n_ph, n_params):
    from filesql_spark.dialect import bind_params
    from filesql_spark.errors import FilesqlError

    sql = "SELECT " + ", ".join(["?"] * n_ph)
    params = list(range(n_params))
    if n_ph == n_params:
        bound = bind_params(sql, params)
        assert "?" not in bound
    else:
        try:
            bind_params(sql, params)
            raised = False
        except FilesqlError:
            raised = True
        assert raised
