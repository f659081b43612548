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


def test_scene_cuts_partition_every_video(spark):
    """Scenes must tile each video's frame range exactly: contiguous,
    non-overlapping, starting at 0, ending at payload length, with a
    real cut (delta > tau) at every boundary being implied by
    construction — here we pin the tiling algebra."""
    from compendium_spark.tables import load

    out = PLANS["mm_scene_cuts"].fn(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in load(spark, SF_SMOKE, "documents").collect()
        if r.doc_id % 3 == 2  # video rows
    }
    by_vid: dict = {}
    for r in out:
        by_vid.setdefault(r.media_id, []).append(r)
    assert set(by_vid) == set(docs)
    for vid, rows in by_vid.items():
        rows.sort(key=lambda r: r.scene_idx)
        assert [r.scene_idx for r in rows] == list(range(len(rows)))
        assert rows[0].start_frame == 0
        assert rows[-1].end_frame == docs[vid]
        for a, b in zip(rows, rows[1:]):
            assert a.end_frame == b.start_frame  # contiguous
        for r in rows:
            assert r.n_frames == r.end_frame - r.start_frame >= 1


def test_compaction_bins_cover_all_files(spark):
    """Every manifest file lands in exactly one bin; bin ids are the
    contiguous prefix 0..n-1; each bin except possibly the last holds
    at least the target's worth once its first file is counted (the
    next-fit guarantee: a bin only closes after crossing the target)."""
    from pyspark.sql import functions as F

    from compendium_spark.plans.olap_ext import COMPACT_TARGET
    from compendium_spark.tables import load

    bins = PLANS["o11_compaction_plan"].fn(spark, SF_SMOKE).collect()
    ev = load(spark, SF_SMOKE, "events")
    n_files = ev.select(F.date_trunc("hour", "ts")).distinct().count()
    assert sorted(r.bin_id for r in bins) == list(range(len(bins)))
    assert sum(r.n_files for r in bins) == n_files
    # next-fit invariant: bin k closes exactly when the CUMULATIVE
    # size crosses (k+1)*target (an individual bin's own total may be
    # small if the previous bin overshot the boundary)
    running = 0
    ordered = sorted(bins, key=lambda r: r.bin_id)
    for r in ordered:
        assert running < (r.bin_id + 1) * COMPACT_TARGET  # bin was open
        running += r.total_bytes
        if r is not ordered[-1]:
            assert running >= (r.bin_id + 1) * COMPACT_TARGET  # closed
    for r in bins:
        assert r.first_hour <= r.last_hour


def test_hybrid_topk_ranks_and_fusion_bounds(spark):
    out = PLANS["sim_hybrid_topk"].fn(spark, SF_SMOKE).collect()
    by_q: dict = {}
    for r in out:
        assert -1.000001 <= r.cosine <= 1.000001
        assert 0.0 <= r.jaccard <= 1.0
        # fusion is the midpoint of its parts (quantization slack)
        assert abs(r.hybrid - (r.cosine + r.jaccard) / 2) < 2e-6
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        hybrids = [r.hybrid for r in rows]
        assert hybrids == sorted(hybrids, reverse=True)


def test_novelty_first_document_is_fully_novel(spark):
    rows = {r.doc_id: r for r in PLANS["text_ngram_novelty"].fn(spark, SF_SMOKE).collect()}
    first = rows[min(rows)]
    assert first.novelty_ratio == 1.0  # nothing earlier to repeat
    for r in rows.values():
        assert 0.0 <= r.novelty_ratio <= 1.0
        assert r.n_novel <= r.n_grams
