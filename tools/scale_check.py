"""Scaling spot-check (VERDICT r9 #9): build a K×-replicated copy of the
sf0.1 tables in /tmp, run the heaviest registry queries at both scales,
and report per-query scaling exponents  e = log(t_K / t_1) / log(K).

The claim under test is the log-n knob story: bucketed candidate
generation (LSH bands, SimHash bands, PPJoin prefixes, IVF cells),
broadcast small sides, and node-sized iterative state should scale
near-linearly (e ≈ 1) — an exponent drifting toward 2 exposes a hidden
all-pairs or a driver-side bottleneck.

Replication is NOT naive duplication:

- fact keys get a per-replica stride (replica i adds i·10⁹) so join fan-
  outs and key cardinalities grow with the data, as they would at a real
  higher SF;
- document text goes through a per-replica vowel `translate` so near-dup
  clusters do NOT merge across replicas (naive copying would grow every
  MinHash/SimHash cluster K-fold and the pair tables K²-fold — a corpus
  property real scale-ups don't have, which would contaminate the
  measurement);
- embeddings get a deterministic per-replica offset for the same reason.

Usage:
    python tools/scale_check.py [--mult 5] [--runs 3]
        [--base /root/testdata/sf0.1] [--work /tmp/spark_graft_scale]
        [--queries name1,name2,...]

Writes the detail table to SCALECHECK.json at the repo root and prints a
compact summary. One-off diagnostic — not part of bench.py's protocol.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10**9

# The heavy tail from BENCH_LOCAL (the queries whose scaling matters),
# chosen to cover each candidate-generation family once.
DEFAULT_QUERIES = [
    "q1_pricing_summary",        # full lineitem scan + groupBy
    "q3_shipping_priority",      # 3-way join
    "events_sessionize",         # session windows over events
    "dedup_minhash_lsh",         # banded LSH (re-derives pairs fully)
    "dedup_simhash",             # 4×16-bit band blocking
    "dedup_ngram_jaccard",       # PPJoin prefix filtering
    "dedup_embedding_cosine",    # hyperplane-LSH cells
    "dedup_exact",               # fingerprint groupBy
    "text_dup_spans",            # corpus-wide gram shuffle
    "orders_association_rules",  # pair mining with support pruning
    "graph_pagerank_events",     # iterative, node-sized state
    "ann_bruteforce_topk",       # brute-force baseline (expected e≈1 on
                                 # corpus side; query side fixed)
    "text_bm25_search",          # inverted scoring over grams
    "pipeline_clean_corpus",     # composed lazy DAG
]


def _scale_table(spark, name: str, src: str, dst: str, mult: int) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if name in ("region", "nation"):
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        return

    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }[name]

    parts = []
    vowels = "aeiou"
    for i in range(mult):
        rep = df
        for k in key_cols:
            rep = rep.withColumn(k, F.col(k) + F.lit(i * STRIDE))
        if name == "documents" and i > 0:
            # per-replica character-rotation: breaks cross-replica
            # shingle overlap so near-dup structure stays per-replica.
            # Vowel rotation alone gives only 5 distinct mappings — at
            # mult > 5, replicas i and i+5 would be IDENTICAL text,
            # creating genuinely quadratic duplicate clusters real
            # scale-ups don't have (found the hard way: the ×20 run
            # filled the spill disk). Vowels × consonants = 25 mappings;
            # a second consonant group (r15, for the ×100 run) makes it
            # 125 — same failure mode at mult > 25 otherwise.
            cons = "rstln"
            cons2 = "dhcmf"
            rot = vowels[i % 5:] + vowels[: i % 5]
            crot = cons[(i // 5) % 5:] + cons[: (i // 5) % 5]
            crot2 = cons2[(i // 25) % 5:] + cons2[: (i // 25) % 5]
            rep = rep.withColumn(
                "text",
                F.translate("text", vowels + cons + cons2,
                            rot + crot + crot2),
            )
        if name == "embeddings" and i > 0:
            # per-(replica, dimension, row) perturbation that changes the
            # vector's DIRECTION. A constant offset (the first attempt)
            # keeps all replicas of a vector near-parallel — cosine-LSH
            # cells then hold 20-way near-dup clusters and the verify
            # stage goes quadratic in the replica count, a corpus
            # property real scale-ups don't have (it flooded 40G+ of
            # spill at ×20 before this fix).
            # hash-based per-(row, dim, replica) noise — NOT a constant
            # offset (keeps replicas parallel) and NOT sinusoids (phase-
            # shifted copies of one waveform correlate across rows);
            # both degenerate into everything-is-a-near-dup corpora whose
            # TRUE pair count is quadratic (15M pairs at ×5 — the
            # operator answered correctly, the data was wrong)
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + (
                            F.pmod(
                                F.hash(F.col("vec_id"), j, F.lit(i)),
                                F.lit(1000),
                            ).cast("double")
                            / 1000.0
                            - 0.5
                        ).cast("float")
                    ),
                ),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))


def _time_queries(spark, queries, names, sf_dir: str, runs: int) -> dict:
    out = {}
    for n in names:
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(samples), 4)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/spark_graft_scale")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--tables", default=None,
                    help="comma list: replicate only these tables (the "
                         "ones the chosen --queries read)")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing --work dataset")
    args = ap.parse_args()

    from filesql_spark.queries import all_queries
    from filesql_spark.session import get_spark

    spark = get_spark(app_name="filesql_spark_scalecheck")
    spark.sparkContext.setLogLevel("ERROR")

    dst = os.path.join(args.work, f"x{args.mult}")
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    if args.tables:
        tables = [t for t in args.tables.split(",") if t in tables]
    if not args.skip_build:
        t0 = time.perf_counter()
        for t in tables:
            _scale_table(spark, t, args.base, dst, args.mult)
        print(f"built {dst} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    queries = all_queries()
    names = (args.queries.split(",") if args.queries else DEFAULT_QUERIES)
    names = [n for n in names if n in queries]

    # warm-up at each scale so file-listing/codegen caches don't skew run 1
    for n in names[:2]:
        queries[n](spark, args.base).count()
        queries[n](spark, dst).count()

    base_t = _time_queries(spark, queries, names, args.base, args.runs)
    scaled_t = _time_queries(spark, queries, names, dst, args.runs)

    rows = []
    for n in names:
        t1, tk = base_t[n], scaled_t[n]
        exp = math.log(tk / t1) / math.log(args.mult) if t1 > 0 else None
        rows.append({"query": n, "base_sec": t1, "scaled_sec": tk,
                     "exponent": round(exp, 3) if exp is not None else None})
        print(f"{n:35} {t1:8.3f}s -> {tk:8.3f}s   e={exp:5.2f}")

    detail = {
        "mult": args.mult, "runs": args.runs, "base": args.base,
        "scaled_dir": dst, "rows": rows,
        "note": ("exponent = log(tK/t1)/log(K); fixed per-query overhead "
                 "(plan construction, task launch) biases e DOWN on "
                 "sub-second queries — read e against base_sec"),
    }
    # merge, don't overwrite: each (mult, query-set) run is its own
    # record so the 5x/20x/50x series stays readable side by side
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALECHECK.json")
    existing = None
    if os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
        except Exception:
            existing = None
    if isinstance(existing, dict) and isinstance(existing.get("runs"), list):
        runs_out = existing["runs"] + [detail]
    elif isinstance(existing, dict) and "rows" in existing:
        runs_out = [existing, detail]  # legacy single-run format
    elif isinstance(existing, dict) and "checks" in existing:
        # legacy multi-check format ({"checks": [{mult, rows}, …]})
        runs_out = [
            {**{k: existing.get(k) for k in ("runs", "base", "note")}, **c}
            for c in existing["checks"]
        ] + [detail]
    else:
        runs_out = [detail]
    with open(path, "w") as f:
        json.dump({"runs": runs_out}, f, indent=1)
        f.write("\n")
    print(json.dumps({"scale_check": {r["query"]: r["exponent"] for r in rows},
                      "mult": args.mult}))


if __name__ == "__main__":
    main()
