"""Iterative graph algorithms over edge-list DataFrames.

Companion to the min-label-propagation connected components in
``pipeline/dedup.py`` — same execution shape (a bounded loop of
join + aggregate rounds with lineage truncation), different recurrence.

100-TB design (PageRank):
- The edge list is the data-sized relation. It is normalized once
  (out-weight join), persisted, and re-used unchanged every round; each
  iteration shuffles only on the keys it would shuffle on anyway (src
  for the rank join, dst for the contribution aggregate). Ranks are
  node-sized — orders of magnitude smaller than edges for any real
  graph, so they ride as broadcast relations here; at billions of nodes
  the same loop works with the broadcasts replaced by hash joins (the
  shuffle keys don't change).
- One LAZY ``localCheckpoint`` per iteration, on the contribution
  table (node-sized, cheap): it truncates lineage AND deduplicates the
  two downstream reads (new ranks + dangling total) once materialized.
  Without it the double-reference doubles the recompute tree every
  round (2^iters), and Catalyst analysis itself becomes the bottleneck
  — the same guard the connected-components loop uses. The lazy form
  (r17) collapses the 10 per-iteration driver-synchronized checkpoint
  jobs into one materialization cascade at the first action; the
  trade-off is fault-recovery granularity — an executor loss
  mid-cascade recomputes the whole cascade, where the eager form only
  re-ran the lost iteration. On a long-lived cluster run, flip back to
  eager (or checkpoint every j-th iteration) if recompute-on-failure
  dominates; locally the cascade wins (A/B r17: 4.06 → 3.63 s median,
  lazy 7/8 pairwise).
- Dangling mass (nodes with no out-edges) is folded in as
  ``1 − Σ contributions`` — an identity because each out-node's
  normalized weights sum to 1, so contributed mass is exactly the rank
  mass of non-dangling nodes. This costs one tiny aggregate over the
  checkpointed contribution table instead of a per-round anti-join
  against the out-node set (measured ~25% of loop wall-clock), and is
  self-correcting: any float drift of total mass away from 1 is
  reabsorbed the next round.
- Float determinism: per-round contribution sums are floating adds
  whose partition order varies, so ranks are reported ROUND(·, 6);
  iteration count is fixed (no data-dependent convergence test),
  keeping the computation a static DAG the DuckDB oracle mirrors
  CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filesql_spark.pipeline._persist import swap_persist


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list, fixed iteration count.

    Recurrence (per node v, N = node count, d = damping):
        rank'(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} rank(u)·w(u,v)/out_w(u)
                                   + dangling_mass/N )
    with dangling_mass = 1 − Σ_v Σ_u rank(u)·p(u,v)  (see module doc).

    Returns (node, pagerank) with pagerank rounded to 6 decimals.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    # persist the caller's edge relation: nodes, out-weights and the
    # transition table all derive from it, and without the cache each
    # derivation re-runs the (possibly data-sized) plan that produced it
    e = swap_persist("pagerank.edges", edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ))
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
    nodes = swap_persist("pagerank.nodes", nodes)
    n_nodes = nodes.count()  # one tiny action; also materializes the persist
    if n_nodes <= 100_000:
        # the AGGREGATED graph is small even when the edge input is 100 TB
        # (here: |event types|² transitions distilled from every event):
        # compact it so each iteration job is one task instead of
        # shuffle-partitions tasks. repartition — not coalesce — so the
        # data-sized edge aggregation upstream keeps its parallelism.
        trans = trans.repartition(1)
    trans = swap_persist("pagerank.trans", trans)

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contribs = (
            trans.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        ).localCheckpoint(eager=False)  # lazy: truncates lineage and still
        # deduplicates the two downstream reads (dangling + new ranks) once
        # materialized, but WITHOUT an extra per-iteration driver-synchronized
        # job — the checkpoint RDD computes inside the next broadcast build,
        # so the whole 10-round loop collapses from 10 eager checkpoint jobs
        # + a final action into one materialization cascade (guide §2.4/§5:
        # fewer jobs, one fewer pass per round — the eager form computed
        # contribs, wrote it, then re-read it for the broadcast)
        dangling = contribs.agg(
            (F.lit(1.0) - F.coalesce(F.sum("contrib"), F.lit(0.0))).alias("dang")
        )
        ranks = (
            nodes.join(F.broadcast(contribs), "node", "left")
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
    return ranks.select("node", F.round("rank", 6).alias("pagerank"))


def triangle_stats(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Global triangle census over an undirected edge list: one row with
    (n_nodes, n_edges, n_wedges, n_triangles, closure_ppm) where
    closure_ppm = 3·triangles·10⁶ ÷ wedges (the global clustering
    coefficient in exact integer ppm) — the structural health check for
    near-dup graphs (a clique-y graph dedups very differently from a
    chain-y one).

    Algorithm: canonical a<b edges; wedges (a,b,c) with b<c from the
    shared-endpoint self-join; triangles = wedges whose closing edge
    (b,c) exists (left-semi). Everything is equi-joins on node ids —
    no cartesian. At 100 TB-scale graphs the standard hardening is
    degree-ordered orientation (point each edge at its higher-degree
    endpoint before the wedge join, bounding per-key fan-out by max
    oriented out-degree ~ sqrt(|E|)); the id-ordered form here keeps
    the DuckDB oracle's arithmetic identical, and the swap is a
    one-line orientation change on the persisted edge table.
    """
    e = swap_persist(
        "triangle.edges",
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .distinct(),
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / F.lit(2))
        .cast("long")
        .alias("n_wedges"),
    ).crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    wedges = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.a") == F.col("y.a"))
        .filter(F.col("x.b") < F.col("y.b"))
        .select(F.col("x.b").alias("a"), F.col("y.b").alias("b"))
    )
    tri = wedges.join(e, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    return base.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.expr("(3 * n_triangles * 1000000) div n_wedges"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("closure_ppm"),
    )
