"""Per-query measurement probe for optimization rounds (guide §1).

Times a subset of registry queries with EXACTLY the bench.py protocol
(median of N runs, count() action, clearCache between samples, warm
session) and optionally writes `.explain("formatted")` plans plus a
plan-shape summary (Exchange / join-strategy / Python-eval node counts)
to plans/<tag>/<query>_<suffix>.txt.

    python tools/perf_probe.py --top 25 --runs 5 --plans r17 --suffix before
    python tools/perf_probe.py dedup_connected_components text_dup_spans

Prints one JSON line per query and a total.  Not part of the driver
contract — bench.py remains the only graded harness.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLAN_NODES = re.compile(
    r"\b(Exchange|BroadcastExchange|SortMergeJoin|BroadcastHashJoin|"
    r"ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct|"
    r"BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow|"
    r"FlatMapGroupsInPandas|Sort|Window|HashAggregate|SortAggregate|"
    r"ObjectHashAggregate|Generate)\b"
)


def plan_shape(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for m in PLAN_NODES.finditer(plan):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: --top)")
    ap.add_argument("--top", type=int, default=0,
                    help="probe the N slowest queries per BENCH_LOCAL.json")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--plans", default="",
                    help="write explain output under plans/<tag>/")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="plans only, skip the timed samples")
    args = ap.parse_args()

    from filesql_spark.queries import all_queries
    from filesql_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="perf_probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    names = list(args.names)
    if args.top:
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
            committed = json.load(f)["queries"]
        ranked = sorted(committed, key=committed.get, reverse=True)
        names += [n for n in ranked[: args.top] if n not in names]
    names = [n for n in names if n in queries]

    # warm-up (same as bench.py)
    for n in names[:2]:
        queries[n](spark, sf_dir).count()

    plan_dir = ""
    if args.plans:
        plan_dir = os.path.join(REPO, "plans", args.plans)
        os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, float] = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"probe:{n}")
        if plan_dir:
            spark.catalog.clearCache()
            df = queries[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{n}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            shape = plan_shape(plan)
        else:
            shape = {}
        if args.no_time:
            print(json.dumps({"query": n, "plan": shape}))
            continue
        samples = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        med = round(statistics.median(samples), 4)
        results[n] = med
        out = {"query": n, "sec": med,
               "samples": [round(s, 3) for s in samples]}
        if shape:
            out["plan"] = shape
        print(json.dumps(out), flush=True)
        spark.sparkContext.setJobDescription(None)

    if results:
        print(json.dumps({"total_sec": round(sum(results.values()), 4),
                          "n": len(results),
                          "loadavg": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
