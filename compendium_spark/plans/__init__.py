"""Query plans — the engine's operator inventory, one function per
SURVEY.md §2 operator, each paired with a DuckDB oracle SQL string.

Import side effect: importing this package registers every plan in
``registry.all_plans()``.
"""

from compendium_spark.plans import (  # noqa: F401
    ann,
    bloom,
    crawl2docs,
    curation,
    dq,
    extended,
    frontier,
    graph,
    history,
    incremental,
    ingest,
    ivf,
    kmeans,
    knn,
    mmr,
    multimodal,
    olap_ext,
    pq,
    quality,
    reference_ops,
    reference_ops2,
    registry,
    relational_ext,
    scoring,
    semantic,
    sinks,
    sketches,
    streaming_plans,
    text,
    timeseries,
    tpch,
    tpch2,
    tpch3,
    windows,
)

# The driver's correctness gate samples a 50-plan prefix of the
# registry per round; the window composition is now MECHANICAL:
# `python tools/gate_ledger.py window-audit` asserts that every plan
# whose driver-green row predates its current code (the ledger's
# "stale" set) sits inside this prefix. Round 6:
#   tier 1 — the 26 plans the ledger flags "code changed since green
#            rNN": the ~21 round-5 quantize-swept plans whose green
#            rows predate the sweep (the round-5 verdict's #1 debt),
#            plus this round's reworked plans (graph_common_neighbors
#            sparsify+cap, mm_phash_dedup vectorized kernel,
#            dq_expectations_report single-pass pivot,
#            graph_triangle_count / dedup_cluster_labels lazy-
#            checkpoint-era changes).
#   tier 2 — the 14 NEW round-6 plans (no driver row yet).
#   tier 3 — 10 drift canaries: the OLDEST clean greens (r01 rows
#            whose fingerprints still match), re-sampled so data/env
#            drift cannot hide behind a four-round-old green.
_ROUND6_STALE_CODE = [
    "a12_stats_moments",
    "a13_exact_quantiles",
    "a6_threshold_disposition",
    "a8_mean_stddev",
    "a_approx_error_bound",
    "corpus_stats_report",
    "dedup_cluster_labels",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dq_expectations_report",
    "e_array_positional",
    "emb_outlier_filter",
    "emb_quantize_int8",
    "f_ratio_nullsafe",
    "graph_common_neighbors",
    "graph_triangle_count",
    "mm_phash_dedup",
    "p10_proportional_span_filter",
    "sim_ivf_cells",
    "sim_lsh_topk",
    "text_bpe_tokens",
    "text_lm_score",
    "text_quality_score",
    "text_repetition_ratio",
    "text_token_entropy",
    "w9_rank_distributions",
]
_ROUND6_NEW = [
    "crawl_to_documents",
    "emb_kcenter_scalable",
    "j20_asof_nearest",
    "j21_cdc_apply",
    "e_pivot_wide",
    "o7_shard_assign",
    "o9_weighted_sample",
    "curate_mixture_temperature",
    "curate_url_canonical",
    "text_zipf_profile",
    "text_hapax_ratio",
    "emb_centroid_drift",
    "graph_2hop_features",
    "dq_snapshot_drift",
    "sim_mips_topk",
    "emb_dim_variance_topk",
    # round-6 explain-iteration reshapes (values identical, code
    # changed → the ledger flags them, so they re-green this round)
    "a23_countmin_sketch",
    "dedup_bloom_prefilter",
    # round-6 late additions
    "o10_epoch_shuffle",
    "w17_retention_cohorts",
    "curate_gate_funnel",
]
# the round-6 helper-closure fingerprint (tools/gate_ledger.py) also
# flags plans whose SHARED HELPERS changed after their green row —
# exactly the class the plan-body-only fingerprint missed:
#   curate_corpus / dedup_cluster_stats compose dedup_cluster_labels'
#   changed fixpoint; dedup_minhash_lsh's shingle/signature helpers
#   moved after its r01 green. With these, every one of the 50 slots
#   carries a REAL re-verification (no canary padding needed this
#   round — window-audit enforces stale ⊆ window).
_ROUND6_HELPER_STALE = [
    "curate_corpus",
    "dedup_cluster_stats",
    "dedup_minhash_lsh",
]
_ROUND6_WINDOW = [
    *_ROUND6_STALE_CODE,
    *_ROUND6_NEW,
    *_ROUND6_HELPER_STALE,
]
assert len(_ROUND6_WINDOW) == 50, len(_ROUND6_WINDOW)

# ---- round 7 ----------------------------------------------------------
# tier 1 — the ledger's stale set after this round's edits (gate_ledger
# check, run at round close): the 4 thickened/reworked plans
# (dedup_embedding_cosine bucketed top-25, text_hapax_ratio per-source,
# dedup_bloom_prefilter m=256, dedup_cluster_stats per-cluster), the 2
# LSH plans moved to the Arrow bucket kernel, curate_decontaminate's
# shuffle removal, the 9 streaming plans (STREAM_STATE_PARTITIONS
# change in windows.py — surfaced by the round-7 dotted-name closure
# fix, which made module-attribute helpers fingerprint-visible), and
# the round-7 NEW plans (13: mm_scene_cuts, sim_hybrid_topk,
# text_ngram_novelty, o11_compaction_plan, ts_ohlc_downsample,
# w18_markov_transitions, sim_bq_topk, curate_contamination_report,
# text_bm25_topk, sim_rrf_fusion, dedup_fuzzy_edit, ts_ewma,
# curate_length_buckets). [counts corrected r8 per ADVICE.md]
_ROUND7_STALE = [
    "curate_decontaminate",
    "dedup_bloom_prefilter",
    "dedup_cluster_stats",
    "dedup_embedding_cosine",
    "mm_scene_cuts",
    "sim_hybrid_topk",
    "sim_lsh_buckets",
    "sim_lsh_topk",
    "streaming_dedup",
    "streaming_enrich_join",
    "streaming_interval_join",
    "streaming_mv_refresh",
    "streaming_running_totals",
    "streaming_scd2",
    "streaming_session_windows",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "text_hapax_ratio",
    "text_ngram_novelty",
    "o11_compaction_plan",
    "ts_ohlc_downsample",
    "w18_markov_transitions",
    "sim_bq_topk",
    "curate_contamination_report",
    "text_bm25_topk",
    "sim_rrf_fusion",
    "dedup_fuzzy_edit",
    "ts_ewma",
    "curate_length_buckets",
]
# tier 2 — drift canaries: the 21 OLDEST clean greens (r01/r02 rows
# whose closure fingerprints still match), re-sampled so data/env
# drift cannot hide behind a six-round-old green. [count corrected r8
# per ADVICE.md — 29 stale + 21 canaries = 50]
_ROUND7_CANARIES = [
    "a10_last_wins_dedup",
    "a11_salted_twostage_agg",
    "a14_string_agg",
    "a1_group_count_range_pick",
    "a2_multi_count_distinct",
    "a3_frequency_table",
    "a4_flag_proportions",
    "a5_all_quantifier",
    "a9_majority_vote",
    "a_cube",
    "a_rollup",
    "dedup_exact",
    "dedup_simhash",
    "eav_json_extract",
    "j1_left_join_null_filter",
    "j2_anti_join",
    "j3_key_remap_join",
    "j5_membership_anti",
    "j6_partial_update_merge",
    "j7_snowflake_dims",
    "mm_frame_sample",
]
_ROUND7_WINDOW = [*_ROUND7_STALE, *_ROUND7_CANARIES]
assert len(_ROUND7_WINDOW) == 50, len(_ROUND7_WINDOW)

# ---- round 8 ----------------------------------------------------------
# tier 1 — the ledger's 32-plan stale set after this round's edits
# (gate_ledger check at round close, list copied verbatim): the
# broadcast-hint sweep (text_tfidf_topk/_log, text_lm_score,
# text_bm25_topk, emb_lang_centroids, curate_corpus, j3/j5/j6, q20),
# the adaptive-L cosine rework + the sim_lsh_* plans touched by
# bucket_entries' n_tables parameter, the re-formed samplers
# (o1_seeded_sample, o2_stratified_sample — first-ever hash rows —
# plus the a_approx_error_bound / a13 / a19 / corpus_stats_report
# closure neighbors of the retired a_approx_aggregates),
# curate_decontaminate's short-doc guard + its contamination-report
# dependent, the widened streaming_interval_join + refactored
# streaming_mv_refresh, sim_hybrid_topk's quantized rank,
# a22_hll_setops' shared distinct, dq_expectations_report's docstring
# closure, w8_ntile_bands (old helper drift the ledger carries), the
# 8 NEW round-8 plans (sim_multiprobe_topk, text_bigram_lm_score,
# dedup_containment, sim_knn_graph_multiprobe, curate_quality_dedup,
# o12_zonemap_prune, dedup_cross_source_rate, curate_yield_curve —
# never driver-green, joined later by text_boilerplate_shingles),
# the remaining 3 streaming plans whose transforms were extracted
# for the progress pins late in the round (tumbling/running/enrich),
# and sim_knn_graph (single-scan sided-kernel rebuild). 42 from
# gate_ledger check, +8 late additions (curate_domain_mix_report,
# text_bpe_merge_candidates, curate_pack_efficiency,
# dedup_impact_report, dq_schema_profile, dedup_lsh_tuning_curve,
# sim_recall_report, text_lang_confusion — never driver-green)
# = 50 total.
_ROUND8_STALE = [
    "a13_exact_quantiles",
    "a19_robust_stats",
    "a22_hll_setops",
    "a_approx_error_bound",
    "corpus_stats_report",
    "curate_contamination_report",
    "curate_corpus",
    "curate_decontaminate",
    "curate_domain_mix_report",
    "curate_pack_efficiency",
    "curate_quality_dedup",
    "dedup_impact_report",
    "curate_yield_curve",
    "dedup_containment",
    "dedup_cross_source_rate",
    "dedup_embedding_cosine",
    "dedup_lsh_tuning_curve",
    "dq_expectations_report",
    "dq_schema_profile",
    "emb_lang_centroids",
    "j3_key_remap_join",
    "j5_membership_anti",
    "j6_partial_update_merge",
    "o12_zonemap_prune",
    "o1_seeded_sample",
    "o2_stratified_sample",
    "q20_potential_promotion",
    "sim_hybrid_topk",
    "sim_knn_graph",
    "sim_knn_graph_multiprobe",
    "sim_lsh_buckets",
    "sim_lsh_topk",
    "sim_multiprobe_topk",
    "sim_recall_report",
    "streaming_dedup",
    "streaming_enrich_join",
    "streaming_interval_join",
    "streaming_mv_refresh",
    "streaming_running_totals",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "text_bigram_lm_score",
    "text_bm25_topk",
    "text_boilerplate_shingles",
    "text_bpe_merge_candidates",
    "text_lang_confusion",
    "text_lm_score",
    "text_tfidf_log",
    "text_tfidf_topk",
    "w8_ntile_bands",
]
# tier 2 — drift canaries: NONE this round — the final window is
# exactly its 50-plan stale set (the r6 precedent), every mid-round
# canary (t1_melt_wide_to_long, a15_argmax, a_grouping_sets,
# f_json_extract, f_scalar_functions, j11, j12, j9,
# mm_feature_pipeline, o1_topk, p1–p8) having given its slot to the
# late-round additions; they stay clean-green in the ledger.
_ROUND8_CANARIES: list[str] = []
_ROUND8_WINDOW = [*_ROUND8_STALE, *_ROUND8_CANARIES]
assert len(_ROUND8_WINDOW) == 50, len(_ROUND8_WINDOW)

# ---- round 9 ----------------------------------------------------------
# tier 1 — the ledger's stale set after this round's edits (gate_ledger
# check at round close): the 9 round-8 on-deck plans, now folded into
# their home modules and registered (never driver-green), plus the
# closure fan-out of the two kernel folds — _probe_cells gained the
# ranked form (sim_ivf_topk / sim_range_search) and pq._assign_codes
# gained the parameterized-codebook long form (sim_pq_codes /
# sim_pq_adc_topk) — and of this round's scale/recall fixes
# (curate_decontaminate external-eval seam + its contamination-report
# dependent, dedup_embedding_cosine boundary L-bump,
# sim_recall_report shared-leg rework).
_ROUND9_STALE = [
    "curate_contamination_report",
    "curate_decontaminate",
    "curate_dsir_resample",
    "curate_dsir_weights",
    "curate_mixture_epochs",
    "dedup_embedding_cosine",
    "dedup_winnowing",
    "graph_kcore",
    "sim_recall_report",
    "train_ivf_centroids",
    "ts_anomaly_remainder",
    "emb_dedup_threshold_curve",
    "sim_filtered_topk",
    "sim_ivf_topk",
    "sim_ivf_tuning_curve",
    "sim_pq_adc_topk",
    "sim_pq_codes",
    "sim_range_search",
    "streaming_interval_outer_join",
    "text_gopher_rules",
    "text_heaps_curve",
    "text_source_overlap_matrix",
    "train_pq_codebooks",
    "train_quality_logreg",
    "ts_seasonal_decompose",
]
# tier 2 — drift canaries: the 25 OLDEST clean greens (r01/r02 rows
# whose closure fingerprints still match), re-sampled so data/env
# drift cannot hide behind an eight-round-old green (two slots ceded
# to the late graph_kcore / text_source_overlap_matrix additions).
_ROUND9_CANARIES = [
    "o1_topk",
    "p1_ordered_key_scan",
    "p2_distinct_projection",
    "p3_null_work_queue",
    "p4_eligibility_filter",
    "p5_status_set_filter",
    "p7_nonzero_filter",
    "p8_nonempty_array_filter",
    "t1_melt_wide_to_long",
    "a15_argmax",
    "a_grouping_sets",
    "f_json_extract",
    "f_scalar_functions",
    "j11_full_outer_join",
    "j12_salted_skew_join",
    "j9_semi_join",
    "mm_feature_pipeline",
    "p6_keyword_filter",
    "q10_returned_items",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q1_pricing_summary",
]
_ROUND9_WINDOW = [*_ROUND9_STALE, *_ROUND9_CANARIES]
assert len(_ROUND9_WINDOW) == 50, len(_ROUND9_WINDOW)

# Round 10:
#   tier 1 — the ledger's stale set: 5 NEW plans (the fixture-backed
#            ingest family closing VERDICT r9 #1, + the cross-family
#            ANN frontier, VERDICT #7) and the reworked
#            text_source_overlap_matrix (VERDICT "weak" #1: MinHash
#            signatures replace the hot-shingle self-join).
#   tier 2 — drift canaries: the oldest-gated plans, rotating the
#            r≤4 tail per VERDICT #4 — all 19 r2 rows, all 14 r3
#            rows, and the first 10 of the 16 r4 rows (the remaining
#            6 r4 w*-window plans lead round 11's canary tier).
_ROUND10_STALE = [
    "ing_xml_samples",
    "ing_xml_tags",
    "ing_fasta_pairs",
    "ing_summary_disposition",
    "sim_frontier_report",
    "text_source_overlap_matrix",
    # ADVICE r9 #1 confirmed live: the fixed unroll was 1 round short
    # of the sf0.1 fixpoint — reworked to iterate-to-convergence
    "graph_kcore",
]
_ROUND10_CANARIES = [
    # r2 (19)
    "q18_large_volume_orders",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "s_set_operations",
    "t2_pivot",
    "text_fingerprint",
    "text_lang_id",
    "text_token_count",
    "text_token_frequency",
    "w5_topk_per_group",
    "w8_ntile_bands_scaled",
    # r3 (14)
    "curate_cap_per_source",
    "curate_mixture_sample",
    "curate_pack_sequences",
    "curate_pii_redact",
    "curate_split_assign",
    "dedup_normalized",
    "dedup_substring_shingle",
    "j13_blocked_fuzzy_join",
    "o2_stratified_deterministic",
    "q11_important_stock",
    "q15_top_supplier",
    "q21_waiting_orders",
    "text_chunk_windows",
    "text_cooccurrence",
    # r4 (first 10 of 16; one slot ceded to the graph_kcore rework)
    "a16_grouping_sets",
    "curate_token_budget",
    "f_date_functions",
    "j10_range_join",
    "j14_interval_overlap_join",
    "j8_asof_join",
    "mm_decode",
    "ts_resample_ffill",
    "w10_funnel_conversion",
    "w11_sequence_pattern",
]
_ROUND10_WINDOW = [*_ROUND10_STALE, *_ROUND10_CANARIES]
assert len(_ROUND10_WINDOW) == 50, len(_ROUND10_WINDOW)

# Round 11:
#   tier 1 — the ledger's stale set: the 7 round-10 on-deck plans
#            (VERDICT r10 #1: the last ungated reference readers —
#            EFetch parse, ASV melt, taxonomy, sources classifier,
#            geo dims — plus the cluster-aware split-leakage audit
#            and the MMR re-ranker), the new sink round-trip plans
#            (VERDICT #4), and this round's reworked plans.
#   tier 2 — drift canaries: the oldest-gated plans per VERDICT #2 —
#            the 6 remaining r4 w*-window plans, then the r5 cohort.
_ROUND11_STALE = [
    "ing_xml_runs",
    "ing_asv_counts_melt",
    "ing_taxonomy",
    "ing_sources_decisions",
    "ing_geo_summary",
    "curate_split_leakage",
    "sim_mmr_topk",
    # re-staled by the ADVICE r10 #4 fixture-staging hardening (the
    # shared `_stage` helper is in their closure fingerprint)
    "ing_xml_samples",
    "ing_xml_tags",
    "ing_fasta_pairs",
    "ing_summary_disposition",
    # the new sink round-trips (VERDICT r10 #4 — the last operator
    # class with no oracle exposure)
    "sink_accessions_roundtrip",
    "sink_sources_roundtrip",
    "sink_archive_roundtrip",
    # K2 transactional behaviors, natively versioned (VERDICT r10
    # "missing" #3): snapshot commits + time travel, oracle-gated
    "sink_timetravel_roundtrip",
    # reworked this round (VERDICT r10 #6: cut-point derivation no
    # longer collects a cardinality-sized histogram)
    "w8_ntile_bands_scaled",
]
_ROUND11_CANARIES = [
    # r4 (the 6 deferred from round 10)
    "w1_tumbling_window",
    "w2_sliding_window",
    "w3_sessionization",
    "w4_running_sum",
    "w6_lag_lead_delta",
    "w7_range_frame",
    # r5 (first 37 of 32 placeholder — trimmed below)
    "a18_freq_items_sketch",
    "a20_hll_sketch",
    "a21_histogram_quantile",
    "cluster_kmeans",
    "dedup_incremental_lsh",
    "dedup_neardup_pipeline",
    "dedup_semdedup",
    "dedup_signature_jaccard",
    "emb_covariance",
    "emb_kcenter_init",
    "emb_matryoshka_recall",
    "emb_pca_variance_check",
    "emb_whiten_check",
    "graph_pagerank",
    "j16_scd2_intervals",
    "j17_point_in_time_join",
    "j18_snapshot_diff",
    "mm_audio_vad",
    "mv_incremental_refresh",
    "o5_zorder_layout",
    "o6_skew_report",
    "sim_cosine_topk",
    "sim_ivfpq_topk",
    "sim_sq_topk_recall",
    "text_quality_classifier",
    "text_shingle_containment",
    "ts_interpolate_linear",
    "w12_time_bounded_funnel",
]
_ROUND11_WINDOW = [*_ROUND11_STALE, *_ROUND11_CANARIES]
assert len(_ROUND11_WINDOW) == 50, len(_ROUND11_WINDOW)
registry.promote(_ROUND11_WINDOW)

all_plans = registry.all_plans
