"""Round-7 reshapes: the r6 verdict's near-vacuous hash rows
(`text_hapax_ratio`, `dedup_bloom_prefilter`, `dedup_cluster_stats`,
plus the reworked `dedup_embedding_cosine` covered in
test_embedding_cosine_recall.py) now emit distributions. These tests
pin BOTH the thickness (≥10 rows at the gate fixture, the verdict's
done-criterion) and the reshaped semantics.
"""

from __future__ import annotations

import pytest

from compendium_spark.plans import all_plans

from .conftest import SF_ORACLE, SF_SMOKE

PLANS = all_plans()

THICKENED = ["text_hapax_ratio", "dedup_bloom_prefilter", "dedup_cluster_stats"]


@pytest.mark.parametrize("name", THICKENED)
def test_reshaped_plans_hash_a_distribution(spark, name):
    assert PLANS[name].fn(spark, SF_ORACLE).count() >= 10


def test_hapax_per_source_semantics(spark):
    rows = PLANS["text_hapax_ratio"].fn(spark, SF_SMOKE).collect()
    assert len({r.source for r in rows}) == len(rows)  # one row per source
    for r in rows:
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert r.n_hapax <= r.n_vocab <= r.n_tokens


def test_cluster_stats_per_cluster_semantics(spark):
    labels = PLANS["dedup_cluster_labels"].fn(spark, SF_SMOKE).collect()
    stats = PLANS["dedup_cluster_stats"].fn(spark, SF_SMOKE).collect()
    # one row per distinct cluster, sizes sum to the labeled doc count
    assert len(stats) == len({r.cluster_id for r in labels})
    assert sum(r.cluster_size for r in stats) == len(labels)
    for r in stats:
        assert r.n_dropped == r.cluster_size - 1
        assert r.cluster_id <= r.max_doc  # representative is the min id
    # ordered fat-first, ties by cluster id
    keys = [(-r.cluster_size, r.cluster_id) for r in stats]
    assert keys == sorted(keys)


def test_bloom_candidates_are_all_probe_hits(spark):
    """Every emitted row passed all k probes against the occupied set
    (recomputed here from first principles) — the filter emits no row
    it cannot justify."""
    from pyspark.sql import functions as F

    from compendium_spark.plans.bloom import (
        BLOOM_K,
        REF_MAX_ID,
        _spark_probe,
    )
    from compendium_spark.tables import load

    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", F.md5(F.trim(F.lower(F.col("text")))).alias("h")
    )
    probed = docs.select(
        "doc_id", *[_spark_probe(F.col("h"), i).alias(f"p{i}") for i in range(BLOOM_K)]
    ).collect()
    occupied = set()
    for r in probed:
        if r.doc_id < REF_MAX_ID:
            occupied.update(r[f"p{i}"] for i in range(BLOOM_K))
    by_id = {r.doc_id: r for r in probed}
    out = PLANS["dedup_bloom_prefilter"].fn(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        p = by_id[r.doc_id]
        assert all(p[f"p{i}"] in occupied for i in range(BLOOM_K))
