"""VERDICT r13 #2: the three exhaustive exact-oracle dedup plans
(dedup_embedding_cosine, dedup_containment, dedup_ngram_jaccard) carry
typed regime-boundary guards so a 100× caller fails in MILLISECONDS
with the scale-path twin named, instead of discovering the measured
quadratic (490 s at 2×10⁴ vectors / 118M self-join pairs at 5×10⁴
docs) the slow way.

Pins, per the verdict's done-criteria:
  * the guard FIRES above budget — on an oversized fixture dir, each
    plan raises ExactOracleRegimeError naming its twin, before any
    join is scheduled (wall-clock bounded);
  * the guard does NOT fire at gated SFs — sf0.001/sf0.01 run the
    full plan (row parity with the oracle is the driver gate's job;
    here we assert no raise and nonzero work), and sf0.1's counts
    (5000 docs / 2000 vectors) sit under the budgets by construction.
"""

from __future__ import annotations

import time

import pytest

from compendium_spark.plans.extended import (
    EXACT_COSINE_MAX_VECTORS,
    EXACT_SHINGLE_MAX_DOCS,
    ExactOracleRegimeError,
    dedup_containment,
    dedup_embedding_cosine,
    dedup_ngram_jaccard,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oversized_dir(spark, tmp_path_factory):
    """A fixture dir whose documents/embeddings row counts exceed
    both budgets. CONTENT is irrelevant — the guard must trip on the
    metadata count before touching a single text/vector — so rows are
    minimal (1-token docs shingle to nothing; tiny vectors)."""
    d = tmp_path_factory.mktemp("oversized")
    n_docs = EXACT_SHINGLE_MAX_DOCS + 1
    n_vec = EXACT_COSINE_MAX_VECTORS + 1
    spark.range(n_docs).selectExpr(
        "id AS doc_id", "'x' AS text"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    spark.range(n_vec).selectExpr(
        "id AS vec_id", "array(0.1f, 0.2f) AS embedding"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize(
    ("fn", "twin"),
    [
        (dedup_embedding_cosine, "dedup_semdedup"),
        (dedup_containment, "dedup_containment_pipeline"),
        (dedup_ngram_jaccard, "dedup_neardup_pipeline"),
    ],
)
def test_guard_fires_fast_and_names_the_twin(spark, oversized_dir, fn, twin):
    t0 = time.monotonic()
    with pytest.raises(ExactOracleRegimeError, match=twin):
        fn(spark, oversized_dir)
    # "fails in milliseconds": the budget here is generous only for
    # session warm-up variance — the guard is one metadata count,
    # nowhere near the 490 s the unguarded quadratic measured
    assert time.monotonic() - t0 < 30.0


def test_guards_silent_at_gated_sf(spark):
    """The driver gate runs these plans at sf0.01 and the bench at
    sf0.1 — the guard must never fire there (500/5000 docs,
    500/2000 vectors, all under the 10⁴ budgets)."""
    assert dedup_embedding_cosine(spark, SF_SMOKE).count() > 0
    assert dedup_containment(spark, SF_SMOKE).count() > 0
    assert dedup_ngram_jaccard(spark, SF_SMOKE).count() > 0


def test_budgets_sit_between_gated_and_melting_scales():
    """sf0.1 (5000 docs / 2000 vectors) must pass; the measured
    melting points (50000 docs / 20000 vectors, SCALING.md) must
    trip. The budgets are pinned so neither side can drift silently."""
    assert 5000 < EXACT_SHINGLE_MAX_DOCS < 50000
    assert 2000 < EXACT_COSINE_MAX_VECTORS < 20000
