"""Differential test of every registry query against its DuckDB oracle.

This is a local mirror of the driver's t2 correctness gate: every entry in
``__spark_entry__.queries()`` must hash-match its ``oracle_sql()`` twin.
"""

from __future__ import annotations

import pytest

from filesql_spark.queries import all_oracles, all_queries
from tests.compare import compare

QUERIES = all_queries()
ORACLES = all_oracles()


def test_registry_nonempty():
    assert len(QUERIES) >= 10


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    problems = compare(df, duck, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_rotation_map_integrity():
    """The driver-grading rotation map must track reality (VERDICT r8 #7).

    The 50-slot grading window is ordered by ``_LAST_DRIVER_ROUND``
    staleness; if that map is stale (an entry renamed away, or a round's
    CORRECTNESS greens never folded in), the window silently
    mis-prioritizes.  Assert (a) every mapped name exists in the registry
    and (b) the newest CORRECTNESS file's green set is reflected in the
    map at (at least) its recorded round, so a forgotten
    ``tools/update_rotation.py`` run fails CI instead.
    """
    import glob
    import json
    import os
    import re

    from filesql_spark.queries import _LAST_DRIVER_ROUND, REGISTRY

    unknown = set(_LAST_DRIVER_ROUND) - set(REGISTRY)
    assert not unknown, f"rotation map names absent from registry: {sorted(unknown)}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no CORRECTNESS files present")
    newest = files[-1]
    rnd = int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", newest).group(1))
    with open(newest) as fh:
        rows = json.load(fh)
    green = {
        n
        for n, r in rows.items()
        if r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match")
        and r.get("err") is None
    }
    # Ignore greens for since-renamed/removed entries; the subset check is
    # about map freshness for entries that still exist.
    stale = {
        n for n in green & set(REGISTRY) if _LAST_DRIVER_ROUND.get(n, 0) < rnd
    }
    if not stale:
        return
    # The driver writes CORRECTNESS_r{N}.json AFTER the builder's final
    # commit of round N, so the newest file unavoidably postdates the map
    # for one inter-round window.  That landing is not a forgotten regen —
    # warn instead of failing when the file is newer than the last commit
    # that touched the map (VERDICT r12 "What's wrong" #1).
    import subprocess
    import warnings

    map_path = os.path.join(repo, "filesql_spark", "queries", "__init__.py")
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", map_path],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip()
        map_commit_ts = int(out) if out else 0
    except Exception:
        map_commit_ts = 0
    if map_commit_ts and os.path.getmtime(newest) > map_commit_ts:
        warnings.warn(
            f"rotation map predates {os.path.basename(newest)} (which landed "
            f"after the last map commit) — run tools/update_rotation.py at "
            f"round start; missing round-{rnd} greens: {sorted(stale)[:5]}...",
            stacklevel=1,
        )
        return
    assert not stale, (
        f"rotation map is stale vs {os.path.basename(newest)} — run "
        f"tools/update_rotation.py (missing round-{rnd} greens: {sorted(stale)[:5]}...)"
    )
