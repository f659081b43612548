"""emb_kcenter_scalable must match the greedy baseline's coverage
quality while scanning the corpus O(rounds) times instead of O(k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans.extended import _load_embeddings
from compendium_spark.plans.knn import (
    KCS_K,
    KCS_L,
    KCS_ROUNDS,
    _min_sqdist,
    emb_kcenter_init,
    emb_kcenter_scalable,
)

from .conftest import SF_ORACLE


def _coverage_radius(spark, ids):
    emb = _load_embeddings(spark, SF_ORACLE)
    vecs = [
        [float(v) for v in r["e"]]
        for r in emb.filter(F.col("vec_id").isin(ids)).collect()
    ]
    return _min_sqdist(emb, vecs).agg(F.max("d")).collect()[0][0]


def test_scalable_recall_vs_greedy(spark):
    greedy = [r["vec_id"] for r in emb_kcenter_init(spark, SF_ORACLE).collect()]
    scalable = [
        r["vec_id"] for r in emb_kcenter_scalable(spark, SF_ORACLE).collect()
    ]
    assert len(scalable) == KCS_K
    # same deterministic seed
    assert scalable[0] == greedy[0]
    # coverage: max-over-corpus min-distance to the selected set. The
    # oversampled pick must stay close to the greedy 2-approximation
    # (measured 2.10 vs 2.08 at sf0.01 — ~1% apart; 1.5x is the alarm
    # threshold, not the expectation)
    rg = _coverage_radius(spark, greedy)
    rs = _coverage_radius(spark, scalable)
    assert rs <= 1.5 * rg, (rs, rg)


def test_scalable_candidate_budget():
    # the driver-side reduction operates on at most 1 + R*L rows —
    # the documented tiny-collect that makes the round count O(R)
    assert 1 + KCS_ROUNDS * KCS_L < 32
