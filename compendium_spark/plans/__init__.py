"""Query plans — the engine's operator inventory, one function per
SURVEY.md §2 operator, each paired with a DuckDB oracle SQL string.

Import side effect: importing this package registers every plan in
``registry.all_plans()``.
"""

from compendium_spark.plans import (  # noqa: F401
    ann,
    curation,
    extended,
    ivf,
    multimodal,
    olap_ext,
    pq,
    quality,
    reference_ops,
    reference_ops2,
    registry,
    relational_ext,
    streaming_plans,
    text,
    timeseries,
    tpch,
    tpch2,
    tpch3,
    windows,
)

# The driver's correctness gate samples a prefix of the registry
# (50 plans in round 1), so the iteration order is explicitly tiered:
#   tier 1 — plans with no driver-green row in CORRECTNESS_r01.json
#            (all of tpch/tpch2/windows/relational_ext/text, j9) plus
#            the two whose round-1 rows were red and are fixed this
#            round (mm_feature_pipeline dtype, a_approx_aggregates
#            array output);
#   tier 2 — plans new in round 2 (tpch3's q2/q9/q11/q15/q20/q21 and
#            the w8 scale form) — whatever fits the remaining window
#            goes green now, the rest lead the next round's window;
#   tier 3 — everything already green in round 1.
_ROUND2_NEW = [
    "w8_ntile_bands_scaled",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q15_top_supplier",
    "q20_potential_promotion",
    "q21_waiting_orders",
    "text_chunk_windows",
    "curate_pack_sequences",
    "dedup_normalized",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_interval_join",
    "streaming_dedup",
    "streaming_running_totals",
    "ts_resample_ffill",
    "curate_decontaminate",
    "curate_cap_per_source",
    "emb_lang_centroids",
    "curate_mixture_sample",
    "streaming_session_windows",
    "text_lm_score",
    "j13_blocked_fuzzy_join",
    "w9_rank_distributions",
    "text_repetition_ratio",
    "curate_pii_redact",
    "curate_split_assign",
    "corpus_stats_report",
    "emb_quantize_int8",
    "emb_outlier_filter",
    "streaming_enrich_join",
    "dedup_cluster_stats",
    "sim_pq_codes",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "curate_gate_funnel",
    "o2_stratified_deterministic",
]
registry.promote(
    [
        # TPC-H family as of round 1
        *[
            n
            for n, p in registry.all_plans().items()
            if n.startswith("q") and n not in _ROUND2_NEW
        ],
        # windows, sessionization, scalar/date/json functions, set ops,
        # pivot, as-of/range/skew joins, argmax, grouping sets
        *[
            n
            for n, p in registry.all_plans().items()
            if p.fn.__module__.endswith(("relational_ext", "windows"))
            and n not in _ROUND2_NEW
        ],
        # text analysis + keyword filter (SURVEY P6)
        *[
            n
            for n, p in registry.all_plans().items()
            if p.fn.__module__.endswith("plans.text")
        ],
        "j9_semi_join",
        "mm_feature_pipeline",
        "a_approx_aggregates",
        *_ROUND2_NEW,
    ]
)

all_plans = registry.all_plans
