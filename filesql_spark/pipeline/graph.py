"""Iterative graph algorithms over edge-list DataFrames.

Companion to the min-label-propagation connected components in
``pipeline/dedup.py`` — same execution shape (a bounded loop of
join + aggregate rounds with lineage truncation), different recurrence.

100-TB design (PageRank):
- The edge list is the data-sized relation. It is normalized once
  (out-weight join), persisted, and re-used unchanged every round; each
  iteration shuffles only on the edge keys it would shuffle on anyway
  (src for the rank join, dst for the contribution aggregate). Ranks are
  node-sized — orders of magnitude smaller than edges for any real graph.
- ``localCheckpoint`` truncates lineage each round (the same guard the
  connected-components loop uses): without it, 10 rounds of nested joins
  make Catalyst analysis itself the bottleneck.
- Dangling mass (nodes with no out-edges) is folded in via a ONE-ROW
  aggregate cross-joined back — never a driver-side collect.
- Float determinism: per-round contribution sums are floating adds whose
  partition order varies, so ranks are reported ROUND(·, 6); iteration
  count is fixed (no data-dependent convergence test), keeping the
  computation a static DAG the DuckDB oracle can mirror CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank over an edge list, fixed iteration count.

    Recurrence (per node v, N = node count, d = damping):
        rank'(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} rank(u)·w(u,v)/out_w(u)
                                   + dangling_mass/N )

    Returns (node, pagerank) with pagerank rounded to 6 decimals.
    """
    w = (
        F.col(weight).cast("double")
        if weight
        else F.lit(1.0)
    )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalized transition weights, built once and reused every round
    trans = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    trans = trans.persist()
    nodes = nodes.persist()
    n_nodes = nodes.count()  # one tiny action; also materializes the persists
    has_out = out_w.select(F.col("src").alias("node"))

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        dangling = (
            ranks.join(F.broadcast(has_out), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        contribs = (
            trans.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / n_nodes
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    out = ranks.select("node", F.round("rank", 6).alias("pagerank"))
    return out
