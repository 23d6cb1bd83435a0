"""Round-13 additions: byte-level dup spans (the suffix-array half of
the Lee-et-al. ExactSubstr pair — VERDICT r12 #7), pytest-gated against
a byte-level brute-force oracle (no registry row, like the recall gates)."""

from __future__ import annotations

import random

import pytest


def _oracle_spans(docs, min_len, min_docs=2):
    """Brute-force byte-level coverage oracle: flag every suffix start
    whose L-byte window occurs in >= min_docs distinct docs, merge
    stride-1 runs. Returns {(doc_id, span_start, span_bytes)}."""
    from collections import defaultdict

    occ = defaultdict(set)
    enc = {d: t.encode("utf-8") for d, t in docs}
    for d, b in enc.items():
        for i in range(len(b) - min_len + 1):
            occ[b[i:i + min_len]].add(d)
    out = set()
    for d, b in enc.items():
        flagged = [
            i for i in range(len(b) - min_len + 1)
            if len(occ[b[i:i + min_len]]) >= min_docs
        ]
        i = 0
        while i < len(flagged):
            j = i
            while j + 1 < len(flagged) and flagged[j + 1] == flagged[j] + 1:
                j += 1
            out.add((d, flagged[i], flagged[j] - flagged[i] + min_len))
            i = j + 1
    return out


def _spark_spans(spark, docs, min_len, min_docs=2):
    from filesql_spark.pipeline.text import dup_spans_bytes

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        (r.doc_id, r.span_start, r.span_bytes)
        for r in dup_spans_bytes(
            df, min_len=min_len, min_docs=min_docs
        ).collect()
    }


def test_dup_spans_bytes_planted(spark):
    """A planted 60-byte shared substring straddling word boundaries —
    the case the word-level grams can't excise exactly — is recovered
    at its exact byte offsets in both docs."""
    shared = "the quick brown fox jumps over the lazy dog again and again!"
    assert len(shared.encode()) == 60
    # boundary chars differ on BOTH sides in the two docs, so the
    # maximal duplicated substring is exactly `shared`
    docs = [
        (1, "PREFIX-A." + shared + " SUFFIX-A"),
        (2, "a different, longer prefix here:" + shared + "? done"),
        (3, "no duplication in this one at all, entirely unique text"),
    ]
    got = _spark_spans(spark, docs, min_len=40)
    assert got == _oracle_spans(docs, 40)
    assert (1, 9, 60) in got  # exact byte offset + maximal length
    assert not any(d == 3 for d, *_ in got)


def test_dup_spans_bytes_matches_bruteforce_corpus(spark):
    """Randomized differential: seeded ASCII docs with planted shared
    substrings of varying lengths and overlap patterns — the Spark
    coverage set must equal the byte-level oracle exactly."""
    rng = random.Random(1313)

    def blob(n):
        return "".join(rng.choice("abcdefgh ") for _ in range(n))

    planted = [blob(25), blob(31), blob(44)]
    docs = []
    for d in range(10):
        parts = [blob(rng.randint(20, 60))]
        for p in planted:
            if rng.random() < 0.55:
                parts.append(p)
                parts.append(blob(rng.randint(5, 30)))
        docs.append((d, "".join(parts)))
    for L in (20, 25):
        assert _spark_spans(spark, docs, L) == _oracle_spans(docs, L), L


def test_dup_spans_bytes_offsets_are_utf8_bytes(spark):
    """Multi-byte characters: offsets/lengths count UTF-8 BYTES, not
    chars (the suffix grouping runs over a BINARY cast)."""
    shared = "é" * 20  # 40 bytes, 20 chars
    docs = [(1, "xx" + shared), (2, shared + "yy")]
    got = _spark_spans(spark, docs, min_len=40)
    assert got == _oracle_spans(docs, 40)
    assert (1, 2, 40) in got and (2, 0, 40) in got


def test_dup_spans_bytes_within_doc_repeat_not_flagged(spark):
    """min_docs=2 is a DISTINCT-doc threshold: a substring repeated
    inside one document only is not a cross-doc duplicate."""
    rep = "z" * 45
    docs = [(1, rep + "-middle-" + rep), (2, "unrelated text entirely here")]
    assert _spark_spans(spark, docs, min_len=40) == set()


def test_dup_spans_bytes_min_docs_three(spark):
    shared = "q" * 50
    docs = [(1, "a" + shared), (2, "b" + shared), (3, "c" + shared),
            (4, "nothing shared")]
    got2 = _spark_spans(spark, docs, min_len=40, min_docs=3)
    assert got2 == _oracle_spans(docs, 40, min_docs=3)
    assert {d for d, *_ in got2} == {1, 2, 3}
