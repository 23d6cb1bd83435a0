"""Text analysis operators — pure column expressions, zero UDFs.

Everything here stays inside whole-stage codegen: split/regexp/md5/
array_intersect are JVM built-ins, so these run at scan speed on 100 TB
(one pass over the documents table, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filesql_spark.pipeline.constants import LANG_PRIORITY, STOPWORDS

# "BPE-ish" token pattern: alpha runs, single digits, or single punctuation
BPE_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def tokens(col: Column) -> Column:
    """Lowercase word tokens (split on non-letters, empties dropped)."""
    return F.filter(F.split(F.lower(col), "[^a-z]+"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish-regex token counting."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(F.filter(F.split(F.trim(c), "\\s+"), lambda t: t != "")).alias("ws_tokens"),
        F.regexp_count(c, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.length(c).cast("long").alias("n_chars_actual"),
    )


def _lang_scores(toks: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID; argmax with LANG_PRIORITY tie-break,
    'und' (undetermined) when no stopword hits at all."""
    toks = tokens(F.col(text_col))
    s = _lang_scores(toks)
    best = F.lit("und")
    # build the argmax as a priority-ordered CASE: a language wins iff its
    # score is >= every other score (earlier priority wins ties)
    expr = None
    for lang in LANG_PRIORITY:
        cond = (s[lang] > 0)
        for other in LANG_PRIORITY:
            if other != lang:
                cond = cond & (s[lang] >= s[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    detected = expr.otherwise(best)
    return df.select(
        "doc_id",
        detected.alias("detected_lang"),
        *[s[lang].alias(f"score_{lang}") for lang in LANG_PRIORITY],
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + composite.

    All counts are exact integers; each ratio is one deterministic IEEE
    division, so the DuckDB oracle matches bit-for-bit.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    ).cast("long")
    n_punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("long")
    mean_token_len = F.when(
        n_tokens > 0,
        (n_chars - (n_tokens - 1)) / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens.cast("double")).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(0.0)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        mean_token_len.alias("mean_token_len"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5, normalized md5, 64-bit prefix
    (hex→int), and a cheap locality-sensitive head hash."""
    c = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    full = F.md5(c)
    return df.select(
        "doc_id",
        full.alias("md5_full"),
        F.md5(norm).alias("md5_norm"),
        # 15 hex chars = 60 bits: fits signed int64 in both engines
        F.conv(F.substring(full, 1, 15), 16, 10).cast("long").alias("h60"),
        F.md5(F.substring(norm, 1, 64)).alias("head_hash"),
    )


LENGTH_QUANTILES = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999]


def length_percentiles(
    df: DataFrame, col: str = "n_chars", approximate: bool = False
) -> DataFrame:
    """Corpus length-distribution summary: one row per quantile of ``col``
    — the sanity dashboard a data pipeline checks before/after cleaning.

    ``approximate=False`` uses Spark's exact interpolated percentile
    (identical last-ulp to DuckDB's quantile_cont — the oracle); at
    100 TB flip ``approximate=True`` for percentile_approx, which
    aggregates a bounded sketch instead of sorting the column.
    """
    qarr = F.array(*[F.lit(q) for q in LENGTH_QUANTILES])
    fn = F.percentile_approx if approximate else F.percentile
    agg = df.agg(fn(F.col(col), qarr).alias("v"))
    return agg.select(F.posexplode("v").alias("i", "value")).select(
        F.element_at(qarr, F.col("i") + 1).alias("q"),
        F.col("value").cast("double").alias("value"),
    )


def top_tokens(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-wide vocabulary: top-k tokens by frequency, with document
    frequency — the term-statistics pass a tokenizer-training or TF-IDF
    pipeline runs first.

    Output: (tok, cnt, doc_freq), ordered by (cnt desc, tok) with LIMIT k
    — a total order, so the result set is deterministic.

    Scale: explode → groupBy(token) is one shuffle with map-side partial
    aggregation (token cardinality ≪ token instances); the final top-k is
    TakeOrderedAndProject over the aggregated vocabulary, never a full
    sort of the corpus. count_distinct(doc_id) uses Spark's two-phase
    distinct aggregation — at 100 TB swap approx_count_distinct if ±2%
    doc_freq is acceptable.
    """
    toks = df.repartition("doc_id").select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count("*").alias("cnt"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(k)
    )


# PII patterns: RE2-compatible (the oracle engine) AND Java-regex-compatible
# (Spark) — ASCII classes and \b word boundaries only, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction: mask emails / SSNs / phone numbers / IPv4 addresses,
    counting each class before masking — the pre-training scrub pass.

    Output: (doc_id, redacted, n_email, n_ssn, n_phone, n_ipv4). Counts
    are taken on the ORIGINAL text (replacement order can't hide a class
    from its own counter); masks apply in PII_PATTERNS order. Pure
    regexp column expressions — whole-stage codegen, zero shuffle, scan
    speed at 100 TB.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = c
    for _, pat, mask in PII_PATTERNS:
        red = F.regexp_replace(red, pat, mask)
    return df.select("doc_id", red.alias("redacted"), *counts)


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    duplicate-token fraction, most-common-token fraction, top-bigram
    fraction, duplicate-trigram fraction, and a keep/drop flag.

    All counts are per-document array expressions (no explode, no
    shuffle): the mode count scans distinct×total token pairs per doc —
    O(L²) in doc length but zero-shuffle and codegen'd; documents are
    bounded (hundreds of tokens), so this stays CPU-trivial at 100 TB
    where an explode+groupBy+window alternative would shuffle every
    token instance. Ratios are single IEEE divisions of exact ints.
    """
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda x: F.size(F.filter(t, lambda y: y == x)),
        )
    )
    empty = F.array().cast("array<string>")
    # when-guards keep element_at off index 0 for 0/1-token docs (ANSI
    # mode raises there; the guarded branch is never evaluated)
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
        ),
    ).otherwise(empty)
    top_bi_cnt = F.array_max(
        F.transform(
            F.array_distinct(bi),
            lambda x: F.size(F.filter(bi, lambda y: y == x)),
        )
    )
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
                F.element_at(t, i + 3),
            ),
        ),
    ).otherwise(empty)
    n_tri = F.size(tri)
    nd_tri = F.size(F.array_distinct(tri))
    dup_tok = F.when(n > 0, (n - nd) / n.cast("double")).otherwise(0.0)
    top_tok = F.when(n > 0, top_cnt / n.cast("double")).otherwise(0.0)
    top_bigram = F.when(n >= 2, top_bi_cnt / (n - 1).cast("double")).otherwise(0.0)
    dup_trigram = F.when(n >= 3, (n_tri - nd_tri) / n_tri.cast("double")).otherwise(0.0)
    keep = (
        (top_tok <= F.lit(0.20)) & (dup_trigram <= F.lit(0.35))
    ).cast("int")
    return df.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        dup_tok.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        top_bigram.alias("top_bigram_frac"),
        dup_trigram.alias("dup_trigram_frac"),
        keep.alias("pass_repetition"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword search: top-k documents for a fixed query-term list.

    Output: (doc_id, dl, tf_<term>..., score), ordered by (score desc,
    doc_id) LIMIT k — a total order.

    Scoring uses the rational Robertson-Sparck-Jones idf
    ``(N - df + 0.5) / (df + 0.5)`` — deliberately NOT ``ln`` of it:
    every op here (+,-,*,/) is IEEE-754 correctly-rounded and therefore
    bit-identical across engines, while ``ln`` is implementation-defined
    and measured to differ by 1 ulp between the JVM and DuckDB on ~8% of
    inputs — enough to flip an exact result hash. Per-term idf is
    monotone in df exactly like the log form, so per-term ranking is
    unchanged; the summed score weighs rare terms more sharply.

    Scale: one corpus pass computes per-doc (dl, tf_i) as column
    expressions (no shuffle); one scalar aggregate derives (N, avgdl,
    df_i); the one-row stats broadcast back (crossJoin(broadcast)) — no
    inverted index is materialized, which is the right shape when the
    query set is small and ad hoc. The final top-k is
    TakeOrderedAndProject, never a full sort. The per-doc (dl, tf_i)
    table is persisted — it is a handful of longs per doc, and both the
    stats aggregate and the scoring join read it, so the cache replaces
    a second full tokenize+filter pass over the corpus (r17; A/B at
    sf0.1: 1.14s -> 0.97s, and at scale one corpus scan instead of two).
    """
    from filesql_spark.pipeline._persist import swap_persist

    c = F.col(text_col)
    t = tokens(c)
    # swap-persisted (r18): the old bare persist was plan-keyed on the
    # per-call QUERY TERMS, so every distinct term set pinned a new entry
    # for the session's lifetime (VERDICT r17 #6); the keyed swap keeps
    # exactly one pinned stats table at a time.
    base = swap_persist("bm25.base", df.select(
        "doc_id",
        F.size(t).cast("long").alias("dl"),
        # NB: the closure must keep arity 1 — a `lambda x, trm=trm:` default
        # arg makes PySpark bind the second param to the array INDEX
        *[
            F.size(F.filter(t, (lambda trm: lambda x: x == F.lit(trm))(trm)))
            .cast("long")
            .alias(f"tf_{trm}")
            for trm in terms
        ],
    ))
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf_{trm}") > 0).cast("long")).alias(f"df_{trm}")
            for trm in terms
        ],
    ).select(
        "n",
        (F.col("sdl").cast("double") / F.col("n")).alias("avgdl"),
        *[
            (
                ((F.col("n") - F.col(f"df_{trm}")).cast("double") + F.lit(0.5))
                / (F.col(f"df_{trm}").cast("double") + F.lit(0.5))
            ).alias(f"idf_{trm}")
            for trm in terms
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    one_minus_b = 1.0 - b
    norm = F.lit(k1) * (
        F.lit(one_minus_b) + ((F.lit(b) * F.col("dl")) / F.col("avgdl"))
    )
    score = None
    for trm in terms:
        tf = F.col(f"tf_{trm}")
        s = F.col(f"idf_{trm}") * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
        score = s if score is None else score + s
    return (
        joined.select(
            "doc_id", "dl", *[f"tf_{trm}" for trm in terms], score.alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def rarity_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mean corpus frequency of each document's tokens — the lexical
    rarity/OOV quality signal: documents whose tokens are rare in the
    corpus (typos, code dumps, foreign scripts, boilerplate IDs) score
    low and get routed to heavier filters. The rational surrogate for a
    unigram-LM log-likelihood that stays engine-exact: one IEEE division
    of two exact integers per document, no ``ln`` (libm last-ulp
    differences would break the oracle hash).

    Two-pass dataflow: (1) explode tokens → groupBy(token) builds the
    corpus term-frequency table (one shuffle, map-side combine; vocab ≪
    corpus); (2) tokens join the vocab — BROADCAST, since even a 100-TB
    web corpus's a-z vocabulary is millions of rows, not billions — and
    re-aggregate per document (shuffle on doc_id). No skew trap: the
    hot tokens ("the") sit on the broadcast side.

    Output: (doc_id, n_tokens, freq_sum, mean_token_freq), zero-token
    documents kept with 0/0/0.0.
    """
    toks = df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    per_doc = (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("tf").alias("freq_sum"))
    )
    return (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("freq_sum"), F.lit(0)).cast("long").alias("freq_sum"),
            F.when(
                F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                F.col("freq_sum").cast("double") / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_token_freq"),
        )
    )


# One pinned dup-hash set per dup-span operator at a time (r16,
# VERDICT r15 #6): the persisted set must outlive the RESULT's first
# action (the exact join re-reads it), so it cannot be unpersisted
# inside the builder — but repeated calls in one session (driver
# correctness run, registry sweeps) must not ACCUMULATE pinned
# executor storage. Each new call swaps out the previous call's set.
# The mechanism was generalized to every operator-internal persist in
# r18 and now lives in pipeline/_persist.py.
from filesql_spark.pipeline._persist import swap_persist as _swap_persist  # noqa: E402


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
    bloom_n: int | str | None = None,
) -> DataFrame:
    """Cross-document duplicated-substring spans — the span-level exact
    substring dedup of Lee et al. ("Deduplicating Training Data Makes
    Language Models Better"): find every maximal run of word positions
    whose n-grams also occur in at least ``min_docs - 1`` OTHER
    documents, so a cleaning stage can excise the span instead of
    dropping the whole document.

    Shape (two passes over the gram stream, never all-pairs):
    1. positional n-gram hashes (doc_id, p, h) — the same 60-bit
       md5-derived gram hash the decontamination gate uses, evaluated
       inside one generator projection;
    2. the corpus-wide duplicated-gram set: one groupBy h with a
       distinct-doc count — the only corpus-sized shuffle;
    3. flagged positions (equi-join back on h) merged into maximal
       spans by gaps-and-islands (p − row_number over the per-doc
       window; windows partition by doc, so parallelism is per-doc).

    At 100 TB the dup-gram set is still corpus-sized: the standard
    refinements are (a) broadcasting a Bloom filter of the dup hashes
    so pass 3's join prunes map-side — WIRED (r14): pass ``bloom_n``
    (expected dup-hash count, known at deployment scale) or
    ``bloom_n="auto"`` (r15: sizes the Bloom from a count() on the
    persisted dup set — one extra job over data pass 2 already
    materialized, so the scale path needs no expert estimate) and the
    gram stream is filtered through sketch.bloom_semi_join before the
    exact join, so only candidate grams (matches + ~3% deterministic
    false positives) pay the join shuffle; the dup set is persisted
    because it feeds both the kilobyte Bloom build and the
    FP-discarding exact join. The persisted handle is attached to the
    result as ``_filesql_persisted`` — executor storage stays pinned
    for the session unless the caller unpersists it after
    materializing the result (r14 advice) — and (b) the suffix-array
    formulation when byte-level (not
    word-level) spans are required — implemented as ``dup_spans_bytes``
    below via hash-prefix suffix grouping. Output: (doc_id, span_start,
    span_tokens), one row per maximal span, 0-based token offsets.
    """
    from pyspark.sql import Window

    from filesql_spark.pipeline.contamination import _hash60

    t = (
        df.repartition("doc_id")
        .withColumn("__w", F.split(F.col(text_col), " "))
        .filter(F.size("__w") >= n)
    )
    gram = "concat(" + ", ' ', ".join(f"__w[i+{j}]" for j in range(n)) + ")"
    pg = f"transform(sequence(0, size(__w) - {n}), i -> struct(i AS p, {gram} AS gm))"
    g = t.select("doc_id", F.explode(F.expr(pg)).alias("pg")).select(
        "doc_id",
        F.col("pg.p").cast("long").alias("p"),
        _hash60(F.col("pg.gm")).alias("h"),
    )
    # persist the positional gram-hash stream: the dup-set aggregation and
    # the flagged-position join both read it, and each uncached read
    # re-pays the text scan + split + n-gram concat + md5 (r17; A/B at
    # sf0.1: 2.11s -> 1.10s). The stream is 3 longs per gram —
    # MEMORY_AND_DISK spills it at corpus scale, trading disk-backed
    # re-read for a second full gram build; the same swap discipline as
    # the dup set keeps repeated calls from accumulating pinned storage.
    g = _swap_persist("dup_spans_grams", g)
    dup = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    persisted = None
    if bloom_n is not None:
        from filesql_spark.pipeline.sketch import bloom_semi_join

        dup = persisted = _swap_persist("dup_spans", dup)
        n_keys = dup.count() if bloom_n == "auto" else bloom_n
        flagged = bloom_semi_join(g, "h", dup, "h", n_keys=n_keys).join(
            dup, "h"
        )
    else:
        flagged = g.join(dup, "h")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = flagged.withColumn("grp", F.col("p") - F.row_number().over(w))
    out = (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") - F.min("p") + n).cast("long").alias("span_tokens"),
        )
        .drop("grp")
    )
    out._filesql_persisted = persisted
    return out


def dup_spans_bytes(
    df: DataFrame,
    text_col: str = "text",
    min_len: int = 40,
    min_docs: int = 2,
    bloom_n: int | str | None = None,
) -> DataFrame:
    """Byte-level duplicated-substring spans — the suffix-array
    formulation of Lee et al.'s ExactSubstr dedup that ``dup_spans``
    documents as the 100 TB refinement (word-level grams can't excise
    duplicates that straddle token boundaries or punctuation variants).

    Semantics (exactly what the excision stage needs): a byte position
    is covered iff it lies inside some length-``min_len`` window whose
    bytes also occur in at least ``min_docs - 1`` OTHER documents; the
    output is each maximal covered run as (doc_id, span_start,
    span_bytes), 0-based BYTE offsets into the UTF-8 encoding. This is
    the same coverage set a suffix array yields for "all positions
    inside a cross-document duplicated substring of length ≥ L": any
    duplicated substring of length M ≥ L is the union of its M − L + 1
    duplicated L-windows, and conversely every covered byte sits in a
    duplicated window — so the union-of-windows IS the union of maximal
    duplicated substrings.

    Shape = hash-prefix suffix grouping (the distributed stand-in for a
    global suffix array): each suffix is represented by the 128-bit hash
    of its first ``min_len`` bytes — grouping on that key is grouping
    suffixes by their L-byte prefix, i.e. the first L levels of the
    suffix-array order, which is all ExactSubstr coverage needs.
    1. one generator projection emits (doc_id, p, h₁, h₂) per suffix —
       UTF-8 bytes via a BINARY cast, both hashes JVM-side xxhash64
       (two salts: a single 64-bit key would collide ~n²/2⁶⁵ times at
       corpus scale; the pair is effectively 128-bit);
    2. the duplicated-prefix set: one corpus-wide groupBy with a
       distinct-doc count — the only corpus-sized shuffle (rows are
       ~32 B regardless of L, same order as the 8 B/suffix pointer
       array the single-node suffix array pays);
    3. flagged suffix starts equi-join back, then gaps-and-islands
       merges stride-1 runs into maximal spans per doc.

    Bounded prototype: exact on the documents fixture (differentially
    pytest-gated against a byte-level brute-force oracle); at 100 TB the
    same Bloom map-side prune as ``dup_spans`` applies to pass 3's join
    — WIRED (r14): pass ``bloom_n`` (or ``"auto"``, r15 — sized by a
    count() on the persisted dup set; the handle is attached to the
    result as ``_filesql_persisted`` for caller unpersist, as in
    ``dup_spans``) and the suffix stream is pruned on
    h1 through the broadcast Bloom before the exact (h1, h2) join (the
    second hash stays in the exact join, which discards Bloom false
    positives and h1 collisions alike). Scaling measured empirically (r13, sf0.1 documents
    replicated with per-replica vowel rotation so spans never merge
    across replicas, median of 3): e₅ = 0.12, e₂₀ = 0.33 — far under
    the 0.7 gate; the corpus-sized groupBy dominates and grows
    linearly in bytes.
    """
    from pyspark.sql import Window

    t = (
        df.repartition("doc_id")
        .select("doc_id", F.col(text_col).cast("binary").alias("__b"))
        .filter(F.length("__b") >= min_len)
    )
    pg = (
        f"transform(sequence(0, length(__b) - {min_len}), i -> struct("
        f"i AS p, xxhash64(substring(__b, i + 1, {min_len})) AS h1, "
        f"xxhash64(substring(__b, i + 1, {min_len}), 1) AS h2))"
    )
    g = t.select("doc_id", F.explode(F.expr(pg)).alias("pg")).select(
        "doc_id",
        F.col("pg.p").cast("long").alias("p"),
        F.col("pg.h1").alias("h1"),
        F.col("pg.h2").alias("h2"),
    )
    # same gram-stream persist as dup_spans (r17): the dup aggregation and
    # the flagged join otherwise each re-pay the suffix-hash generator
    g = _swap_persist("dup_spans_bytes_grams", g)
    dup = (
        g.groupBy("h1", "h2")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h1", "h2")
    )
    persisted = None
    if bloom_n is not None:
        from filesql_spark.pipeline.sketch import bloom_semi_join

        dup = persisted = _swap_persist("dup_spans_bytes", dup)
        n_keys = dup.count() if bloom_n == "auto" else bloom_n
        flagged = bloom_semi_join(
            g, "h1", dup.select("h1"), "h1", n_keys=n_keys
        ).join(dup, ["h1", "h2"])
    else:
        flagged = g.join(dup, ["h1", "h2"])
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = flagged.withColumn("grp", F.col("p") - F.row_number().over(w))
    out = (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") - F.min("p") + min_len).cast("long").alias("span_bytes"),
        )
        .drop("grp")
    )
    out._filesql_persisted = persisted
    return out


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the chunking step that turns raw documents into training sequences
    when a context window is shorter than a document (RAG indexing and
    pretraining both run this before packing).

    Chunk starts are 0, stride, 2·stride, …; the last start is the
    smallest multiple of ``stride`` ≥ n − window (ceil division), so the
    document tail is always covered and every chunk except possibly the
    last has exactly ``window`` tokens. A doc with ≤ window tokens is one
    chunk. Deterministic layout: (doc_id, chunk_id) is a stable key, so a
    resumed job reproduces the same chunks (same property the sequence
    packer relies on).

    100-TB design: zero shuffles — tokenization, the start-sequence
    explode, and the slice/join are all per-row column expressions inside
    one whole-stage-codegen projection; output rows ≈ input tokens ÷
    stride, produced at scan speed. The ceil division is written as
    ``greatest(0, (n - window + stride - 1) div stride)`` — Spark's `div`
    truncates toward zero while DuckDB's `//` floors, but both land on 0
    for the only negative case (n < window), which `greatest` pins anyway.
    """
    t = tokens(F.col(text_col))
    d = df.select("doc_id", t.alias("__t"), F.size(t).alias("__n")).filter(
        F.col("__n") > 0
    )
    k = F.greatest(
        F.lit(0), F.expr(f"(__n - {window} + {stride - 1}) div {stride}")
    )
    c = d.select(
        "doc_id",
        "__t",
        "__n",
        F.explode(F.sequence(F.lit(0), k)).alias("chunk_id"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("long").alias("start_tok"),
        F.least(
            F.lit(window), F.col("__n") - F.col("chunk_id") * stride
        ).cast("long").alias("chunk_len"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("__t"),
                F.col("chunk_id") * stride + 1,
                F.least(F.lit(window), F.col("__n") - F.col("chunk_id") * stride),
            ),
        ).alias("chunk_text"),
    )
    return c.filter(F.col("chunk_len") > 0)


def bigram_model(df: DataFrame, text_col: str = "text", top_prev: int = 100) -> DataFrame:
    """Bigram next-token model over the corpus: for the ``top_prev`` most
    frequent context tokens, the single most likely next token with its
    integer-ppm conditional probability — the cheapest corpus language
    model, used as a generation-quality / boilerplate probe (a corpus
    whose top bigram probabilities approach 10⁶ ppm is template spam).

    100-TB design: the bigram explode is a per-row projection (slice +
    transform, no self-join); one shuffle counts (prev, next) pairs with
    map-side partial aggregation, a second tiny shuffle sums per-prev
    totals over the already-aggregated pair counts (≪ token count), and
    the per-prev argmax is a window over pair counts grouped by prev —
    partitioned, never global. The final top-100 is a TakeOrdered.
    Probabilities are exact integers (c·10⁶ div total), so both engines
    rank identically; ties break lexicographically on the next token.
    """
    from pyspark.sql import Window

    t = tokens(F.col(text_col))
    pairs = (
        df.select(t.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1),"
                    " i -> struct(__t[i-1] AS prev, __t[i] AS next))"
                )
            ).alias("bg")
        )
        .select("bg.prev", "bg.next")
    )
    pc = pairs.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("c_pair"))
    tot = pc.groupBy("prev").agg(F.sum("c_pair").alias("c_prev"))
    w = Window.partitionBy("prev").orderBy(F.col("c_pair").desc(), F.col("next"))
    best = (
        pc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        best.join(tot, "prev")
        .select(
            "prev",
            F.col("next").alias("next_top"),
            F.col("c_pair").cast("long").alias("c_pair"),
            F.col("c_prev").cast("long").alias("c_prev"),
            F.expr("(c_pair * 1000000) div c_prev").alias("prob_ppm"),
        )
        .orderBy(F.col("c_prev").desc(), "prev")
        .limit(top_prev)
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-distribution concentration signals: Shannon entropy and
    Gini-Simpson diversity of each document's token histogram — the
    compression-ratio proxy used as a quality gate (low entropy =
    templated/repetitive text; complements the Gopher fractions in
    ``repetition_metrics`` with a whole-distribution statistic).

    Per-doc token counts are the same zero-shuffle O(L²) array
    expressions as ``repetition_metrics`` (documents are bounded at
    hundreds of tokens, so this is CPU-trivial and codegen'd; long-doc
    corpora would switch to the explode+groupBy path).

    Determinism: Σc and Σc² are exact integers, so Simpson diversity
    (1 − Σc²/n²) is two IEEE ops on exact operands — bit-stable with no
    rounding. Shannon entropy needs libm log2 (engines differ in the
    last ulp, and the Σ c·log2 c fold order differs), so it alone is
    rounded to 6 decimals: H = log2(n) − (Σ c·log2 c)/n.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    counts = F.transform(
        F.array_distinct(t),
        lambda x: F.size(F.filter(t, lambda y: y == x)),
    )
    sum_c2 = F.aggregate(
        counts, F.lit(0).cast("long"), lambda acc, c: acc + (c * c).cast("long")
    )
    ent_sum = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log2(c.cast("double")),
    )
    nd = n.cast("double")
    simpson = F.lit(1.0) - sum_c2.cast("double") / (nd * nd)
    entropy = F.round(F.log2(nd) - ent_sum / nd, 6)
    return df.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        F.when(n > 0, simpson).otherwise(0.0).alias("simpson_diversity"),
        F.when(n > 0, entropy).otherwise(0.0).alias("token_entropy"),
        (F.when(n > 0, entropy).otherwise(0.0) >= 3.0).cast("int").alias("pass_entropy"),
    )


def tfidf_topk(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Per-document top-k characteristic terms by TF·IDF — the document
    keyword extraction / sparse-vectorization step (what a corpus
    indexer materializes per doc before retrieval or topic labeling).

    IDF uses the rational Robertson–Sparck-Jones form
    (N − df + 0.5)/(df + 0.5), the same no-libm choice as
    ``bm25_topk``: tf is an exact integer, idf is ONE IEEE division of
    exact operands, score = tf·idf is one multiply — bit-deterministic
    across engines with no rounding at all (a log-based idf measured
    1-ulp JVM↔DuckDB divergence; see bm25_topk).

    Scale: one explode → (doc, term) count shuffle for tf, a term-keyed
    aggregate for df (map-side combined), the df table joined back on
    term, and a per-doc top-k window (shuffle on doc_id). Term
    cardinality ≪ token instances, so both aggregates shrink the data;
    no corpus-wide sort anywhere.
    """
    from pyspark.sql import Window

    toks = df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        (
            F.col("tf")
            * (
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "score")
    )


def lm_perplexity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram-LM perplexity per document — the KenLM-style quality
    filter (CCNet / RedPajama lineage): score each doc under a language
    model trained on the corpus itself; implausible token sequences
    (boilerplate, shredded text, spam) score high.

    Model: add-one-smoothed bigram probabilities
    p(b|a) = (c_ab + 1) / (c_a + V). Per-doc score is the mean negative
    log-prob of its bigrams; perplexity = exp(mean NLL).

    Determinism: a float Σ log p across partitions would be
    fold-order-unstable, so each bigram's log-prob is quantized to
    integer MICRO-NATS once (libm ln differs by ≤1 ulp between engines
    — only a value within ~1e-10 of a micro-nat boundary could round
    apart), making the per-doc sum exact; the mean is one division and
    only the final exp() is rounded (6 dp).

    Scale: the model IS two count tables — unigrams (vocab-sized,
    broadcast; switch to a shuffle join past ~10⁷ vocab) and bigrams
    (joined on the bigram key, the one data-sized shuffle alongside the
    doc regroup). Training and scoring are the same two passes — no
    external model artifact.
    """
    # persisted: the bigram stream reads this twice (bigram counts +
    # scoring) and the unigram table once — one tokenize pass instead of
    # three (r17; the unigram branch previously re-tokenized the source)
    toks = _swap_persist(
        "lm_perplexity_toks",
        df.select("doc_id", tokens(F.col(text_col)).alias("t")),
    )
    n = F.size("t")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at("t", i + 1).alias("a"),
                F.element_at("t", i + 2).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    doc_bi = toks.select("doc_id", F.explode(bigrams).alias("bi")).select(
        "doc_id", "bi.a", "bi.b"
    )
    uni = (
        toks.select(F.explode("t").alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    bi_counts = doc_bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    lp_micro = F.round(
        F.log(
            (F.col("cab") + F.lit(1)).cast("double")
            / (F.col("ca") + F.col("v")).cast("double")
        )
        * 1_000_000
    ).cast("long")
    scored = (
        doc_bi.join(bi_counts, ["a", "b"])
        .join(F.broadcast(uni), "a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp_micro.alias("lp"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("sum_lp_micro"),
    )
    avg_nll = (
        -F.col("sum_lp_micro").cast("double")
        / (F.col("n_bigrams").cast("double") * 1_000_000.0)
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "sum_lp_micro",
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 6).alias("perplexity"),
    )


def remove_dup_spans(
    df: DataFrame, text_col: str = "text", n: int = 5, min_docs: int = 2
) -> DataFrame:
    """Span-level dedup as a TRANSFORM: excise every token covered by a
    cross-document duplicated n-gram and return the cleaned text — the
    action stage of ``dup_spans`` (Lee et al.'s recipe removes the
    repeated substring, not the document; boilerplate headers/footers
    disappear while the unique prose survives).

    Same two-pass shape as dup_spans: positional gram hashes → the
    corpus-wide duplicated-gram set (one groupBy h, the only
    corpus-sized shuffle) → flagged positions exploded to covered
    token indices and aggregated per doc; the rebuild is then a pure
    zero-shuffle array expression (filter + transform + concat_ws)
    against the per-doc removal set. Output: (doc_id, n_tokens,
    n_removed, cleaned_hash) — the md5 of the cleaned text stands in
    for the text itself so the result stays hash-comparable.
    """
    from filesql_spark.pipeline.contamination import _hash60

    t = df.repartition("doc_id").withColumn("__w", F.split(F.col(text_col), " "))
    grams = t.filter(F.size("__w") >= n)
    gram = "concat(" + ", ' ', ".join(f"__w[i+{j}]" for j in range(n)) + ")"
    pg = f"transform(sequence(0, size(__w) - {n}), i -> struct(i AS p, {gram} AS gm))"
    g = grams.select("doc_id", F.explode(F.expr(pg)).alias("pg")).select(
        "doc_id",
        F.col("pg.p").cast("long").alias("p"),
        _hash60(F.col("pg.gm")).alias("h"),
    )
    # same gram-stream persist as dup_spans (r17): dup agg + rm join both
    # read it, saving a second text scan + gram build
    g = _swap_persist("remove_dup_spans_grams", g)
    dup = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    rm = (
        g.join(dup, "h")
        .select("doc_id", F.explode(F.expr(f"sequence(p, p + {n - 1})")).alias("pos"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("rm"))
    )
    out = t.join(rm, "doc_id", "left").withColumn(
        "rm", F.coalesce("rm", F.array().cast("array<long>"))
    )
    kept = "filter(sequence(0L, size(__w) - 1L), i -> NOT array_contains(rm, i))"
    return out.select(
        "doc_id",
        F.size("__w").cast("long").alias("n_tokens"),
        (F.size("__w") - F.size(F.expr(kept))).cast("long").alias("n_removed"),
        F.md5(
            F.expr(f"concat_ws(' ', transform({kept}, i -> __w[CAST(i AS INT)]))")
        ).alias("cleaned_hash"),
    )
