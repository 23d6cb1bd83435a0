"""Round-18 optimization-internals tests.

Covers the r18 operator-internal changes:
- connected_components: depth-gated pointer jumping must still converge
  on graphs deeper than the gate (the jump path) and on near-cliques
  (the no-jump path), with identical labels either way.
- swap_persist: repeated operator calls must keep pinned storage
  bounded (LRU-of-1 per call site), releasing the previous frame.
- IVF driver-held assign: bit-identical centroids/assignments vs the
  fold-expression formulation the DuckDB oracle mirrors.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from filesql_spark.session import get_spark

    return get_spark(app_name="test_round18")


def _components(spark, edges):
    from filesql_spark.pipeline.dedup import connected_components

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    return {
        (r.node, r.component)
        for r in connected_components(df).collect()
    }


def test_cc_chain_deeper_than_jump_gate(spark):
    """A 12-node chain has diameter 11 — min propagation alone needs 11
    rounds, so the gated pointer jump MUST engage (jump_from=3) and the
    labels must still all collapse to the chain's minimum."""
    chain = [(i, i + 1) for i in range(100, 112)]
    got = _components(spark, chain)
    assert got == {(i, 100) for i in range(100, 113)}


def test_cc_two_cliques_and_singleton_edge(spark):
    """Near-clique graphs (the dup-graph common case) converge before the
    jump gate; labels are the component minimum."""
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (50, 51)]
    got = _components(spark, edges)
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (50, 50), (51, 50),
    }


def test_swap_persist_bounds_pinned_storage(spark):
    """Each call-site key pins at most ONE frame: a second swap on the
    same key unpersists the first frame (VERDICT r17 #6 — a long-lived
    session over changing inputs must not accumulate pinned storage)."""
    from filesql_spark.pipeline._persist import _ACTIVE, release, swap_persist

    a = spark.range(10).withColumn("x", F.col("id") * 2)
    b = spark.range(20).withColumn("x", F.col("id") * 3)
    pa = swap_persist("test_round18.key", a)
    pa.count()
    assert pa.storageLevel.useMemory
    pb = swap_persist("test_round18.key", b)
    pb.count()
    # the first frame was released, the second is pinned, one entry total
    assert not pa.storageLevel.useMemory
    assert pb.storageLevel.useMemory
    assert sum(1 for k in _ACTIVE if k.startswith("test_round18.")) == 1
    release("test_round18.key")
    assert not pb.storageLevel.useMemory
    assert "test_round18.key" not in _ACTIVE


def test_operator_rerun_releases_previous_pin(spark):
    """Calling a swap-persisted operator twice over DIFFERENT inputs
    leaves exactly the second input's frame pinned (the operator-level
    contract behind the r18 hygiene sweep)."""
    from filesql_spark.pipeline._persist import _ACTIVE
    from filesql_spark.pipeline.dedup import minhash_lsh_pairs

    d1 = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "zz yy xx ww")],
        ["doc_id", "text"],
    )
    d2 = spark.createDataFrame(
        [(7, "p q r s t u"), (8, "p q r s t u")], ["doc_id", "text"]
    )
    minhash_lsh_pairs(d1).count()
    first = _ACTIVE["minhash_lsh_pairs.sets"]
    minhash_lsh_pairs(d2).count()
    second = _ACTIVE["minhash_lsh_pairs.sets"]
    assert first is not second
    assert not first.storageLevel.useMemory
    assert second.storageLevel.useMemory


def test_ivf_driver_assign_matches_fold_expression(spark):
    """The closure-UDF assign (sequential dimension-order accumulation,
    first-min tie break over cid-sorted centroids) must reproduce the
    _sqdist_fold argmin bit-for-bit — ties included."""
    import numpy as np

    from filesql_spark.pipeline.dedup import with_quantized
    from filesql_spark.pipeline.similarity import (
        _assign_cid_udf,
        _cents_df,
        _sqdist_fold,
    )

    rng = np.random.default_rng(18)
    emb = spark.createDataFrame(
        [
            (i, rng.standard_normal(64).astype("float32").tolist())
            for i in range(200)
        ],
        ["vec_id", "embedding"],
    )
    pts = with_quantized(emb).select("vec_id", "qv")
    # centroids = the first 4 vectors as doubles, plus a DUPLICATE of
    # centroid 0 under a higher cid so distance ties exist by construction
    seed = sorted((r.vec_id, [float(v) for v in r.qv])
                  for r in pts.filter(F.col("vec_id") < 4).collect())
    rows = seed + [(999, seed[0][1])]
    got = {
        (r.vec_id, r.cid)
        for r in pts.withColumn(
            "cid", _assign_cid_udf(rows)(F.col("qv"))
        ).collect()
    }
    # reference: fold-expression distances + min_by (dist, cid) — the
    # formulation the DuckDB oracle mirrors
    cents = _cents_df(spark, rows)
    d = _sqdist_fold(F.col("qv"), F.col("c"))
    ref = {
        (r.vec_id, r.b.cid)
        for r in pts.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(F.min_by(F.struct(F.col("cid")), F.struct(d.alias("d"), F.col("cid"))).alias("b"))
        .collect()
    }
    assert got == ref
    # the planted tie resolved to the LOWER cid, proving tie order
    assert all(cid != 999 for _, cid in got)
