"""Fill OPTIMIZATION_r17.md placeholders from the baseline/final bench JSONs."""
import json
import re
import sys

base = json.load(open("/tmp/BENCH_r17_baseline.json"))
fin = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_r17_final.json"))

bq, fq = base["queries"], fin["queries"]

# baseline figures formatted from the loaded JSON (ADVICE r17: hardcoded
# literals could contradict the computed delta if the file differs)
line = (
    f"headline **{fin['value']:.2f} s** (baseline {base['value']:.2f} s, **"
    f"{(1 - fin['value'] / base['value']) * 100:+.1f}%**), intersection21 "
    f"{fin.get('intersection21_sec', float('nan')):.2f} s (baseline "
    f"{base.get('intersection21_sec', float('nan')):.2f} s), "
    f"loadavg {fin.get('loadavg')}, n_queries {len(fq)}"
)

rows = []
for k in sorted(bq, key=lambda k: -bq[k]):
    b, f = bq[k], fq.get(k)
    if f is None:
        continue
    d = (f - b) / b * 100
    if b >= 0.75 or abs(d) > 40:
        rows.append(f"| {k} | {b:.2f} | {f:.2f} | {d:+.0f}% |")
table = "\n".join(
    ["| query | before (s) | after (s) | Δ |", "|---|---|---|---|"] + rows
)

src = open("OPTIMIZATION_r17.md").read()
src = src.replace("<!-- FINAL_BENCH_LINE -->", line)
src = src.replace("<!-- FINAL_TABLE -->", table)
open("OPTIMIZATION_r17.md", "w").write(src)
print(line)
print(f"{len(rows)} table rows written")
