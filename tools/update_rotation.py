"""Regenerate the driver-grading rotation map from CORRECTNESS_r*.json.

Run at the START of each round (see the policy comment above
``_LAST_DRIVER_ROUND`` in filesql_spark/queries/__init__.py):

    python tools/update_rotation.py          # rewrite the map in place
    python tools/update_rotation.py --check  # show the resulting window only

For every correctness file, an entry with rows+schema+hash all true and
``err: null`` gets its last-green round bumped to that file's round
number; entries absent from the map have never been driver-graded and
sort first in the 50-slot window automatically.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(REPO, "filesql_spark", "queries", "__init__.py")


def collect_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    last = collect_green()
    src = open(INIT).read()
    body = "\n".join(f'    "{k}": {v},' for k, v in sorted(last.items(), key=lambda kv: kv[0]))
    new_src = re.sub(
        r"(_LAST_DRIVER_ROUND: dict\[str, int\] = \{\n).*?(\n\})",
        lambda m: m.group(1) + body + m.group(2),
        src,
        flags=re.S,
    )
    if "--check" not in sys.argv:
        open(INIT, "w").write(new_src)
        print(f"rewrote map: {len(last)} driver-verified entries")
    sys.path.insert(0, REPO)
    # import AFTER the rewrite so the window reflects it
    for mod in list(sys.modules):
        if mod.startswith("filesql_spark"):
            del sys.modules[mod]
    from filesql_spark.queries import REGISTRY, all_queries

    names = list(all_queries())
    never = [n for n in REGISTRY if n not in last]
    print(f"registry {len(names)} | never-graded {len(never)}")
    print("window (first 50):")
    for i, n in enumerate(names[:50], 1):
        print(f"  {i:2d}. {n}")
    deferred = [n for n in never if n not in set(names[:50])]
    if deferred:
        print("never-graded deferred past the window:", deferred)


if __name__ == "__main__":
    main()
