"""Physical plan-shape regression guard.

A plan that silently picks up a CartesianProduct or a
BroadcastNestedLoopJoin is a 100 TB incident waiting to happen, even
if it stays correct at test scale. This walks EVERY registered plan at
the smoke scale factor and asserts those strategies appear only where
they are the documented design:

  * the two labeled exact all-pairs baselines (the production paths
    are the LSH/IVF candidate plans registered alongside);
  * single-row scalar-subquery broadcasts (a 1×N join has no keys —
    BNLJ of one row is the correct physical form).

PLANS_AUDIT.md shows the same facts as a human-readable table; this
test makes the invariant executable so a plan edit can't regress it
unnoticed.
"""

from __future__ import annotations

import pytest

from compendium_spark.plans import all_plans

from .conftest import SF_SMOKE

PLANS = all_plans()

# documented exact brute-force baselines (never the scale default —
# the ANN/LSH candidate plans registered alongside are the scale path);
# sim_cosine_topk's broadcast-queries × corpus sweep is keyless by design
ALLPAIRS_BASELINES = {
    # dedup_embedding_cosine left this set in round 7: re-registered
    # as the LSH-bucketed exact verify (equi-join on bucket keys, no
    # BNLJ) — the all-pairs form is now a DuckDB-only test oracle
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sim_mips_topk",  # same broadcast-queries exact baseline, dot metric
    "sim_pq_adc_topk",  # broadcast query LUTs × compressed code scan
    # verification twin: exact + quantized cosine in one broadcast
    # queries × corpus sweep, plus two single-row min/max broadcasts
    "sim_sq_topk_recall",
    # MRL check: <=10 broadcast query vectors × sharded corpus — the
    # same legitimate exact form as sim_cosine_topk (both cosines
    # computed in that one pass)
    "emb_matryoshka_recall",
    # hybrid fusion's dense side: same <=10 broadcast query vectors ×
    # sharded corpus sweep; the lexical side is a keyed token join
    "sim_hybrid_topk",
    # binary-quantized search: same broadcast-queries sweep over the
    # packed sign-bit codes (integer Hamming scan)
    "sim_bq_topk",
    # RRF's dense ranker: the same <=10 broadcast query vectors ×
    # sharded corpus sweep as sim_hybrid_topk; the lexical ranker and
    # the fusion join are keyed
    "sim_rrf_fusion",
    # MMR re-rank: the relevance pool is the same <=10 broadcast query
    # vectors × corpus exact sweep (pool choice is orthogonal to the
    # re-rank — production pools come from the keyed ANN plans); the
    # greedy diversity pass is per-query Arrow over pool² only
    "sim_mmr_topk",
    # recall dashboard: its ground-truth leg is the sim_cosine_topk
    # exact sweep (<=10 broadcast queries × corpus, keyless by
    # design); both LSH candidate legs and every report join are keyed
    "sim_recall_report",
    # nprobe tuning curve: exact-baseline <=10-query broadcast sweep
    # plus the <=8-row rank/sweep frames and 1-row totals; the
    # candidate leg is the keyed probe⋈inverted-file join
    "sim_ivf_tuning_curve",
    # cross-family frontier: the same exact-baseline <=10-query
    # broadcast sweep + the PQ compressed-domain scan (broadcast
    # LUTs × code table, keyless by design) + <=4-row sweep frames
    # and 1-row totals; ivf/lsh candidate legs are keyed joins
    "sim_frontier_report",
}
# plans whose only BNLJ/cartesian is a broadcast single-row scalar
# (threshold / total / max) joined against every row — keyless by nature
SCALAR_SUBQUERY = {
    "q11_important_stock",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    "a2_multi_count_distinct",
    "dedup_neardup_pipeline",
    "curate_corpus",
    "dedup_cluster_labels",
    "dedup_cluster_stats",  # same fixpoint subtree as cluster_labels
    "text_lm_score",  # 1-row vocabulary total broadcast
    "emb_quantize_int8",  # 1-row per-dim min/max broadcast
    "text_tfidf_topk",  # 1-row corpus-size N broadcast into the idf
    "text_tfidf_log",  # same 1-row N broadcast, log-idf variant
    "a23_countmin_sketch",  # 1-row stream-total broadcast into the eps bound
    "j18_snapshot_diff",  # 1-row (snap1, snap2) bounds broadcast
    "text_bm25_topk",  # 1-row (N, avgdl) corpus-stats broadcast
    "text_boilerplate_shingles",  # 1-row corpus-size broadcast into the share
    "curate_domain_mix_report",  # 1-row (tot_docs, tot_tokens) broadcast into the shares
    "emb_dedup_threshold_curve",  # 1-row corpus-total broadcast + 6-row tau sweep
    "curate_dsir_weights",  # 1-row (tot_t, tot_r) model-totals broadcast
    "curate_dsir_resample",  # same DSIR totals broadcast via _dsir_doc_scores
    "text_source_overlap_matrix",  # sources² grid: inequality join of two ≤20-row frames
    "curate_split_leakage",  # 1-row leaky-cluster count crossed onto the ≤3-row split report
}


def _executed(df) -> str:
    df.collect()  # let AQE settle on the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


@pytest.mark.parametrize("name", sorted(PLANS))
def test_no_accidental_allpairs_join(spark, name):
    plan = _executed(PLANS[name].fn(spark, SF_SMOKE))
    has_cartesian = "CartesianProduct" in plan
    has_bnlj = "BroadcastNestedLoopJoin" in plan
    if name in ALLPAIRS_BASELINES or name in SCALAR_SUBQUERY:
        return  # documented
    assert not has_cartesian, f"{name}: unexpected CartesianProduct"
    assert not has_bnlj, f"{name}: unexpected BroadcastNestedLoopJoin"
