"""Cross-SF scaling probe: measure representative plans at three data
scales and report the wall-time growth slope.

The brief's question — "would this hold at 1000×the data?" — deserves a
measurement, not an assertion. This tool times each plan at
sf0.001/0.01/0.1 (100× input growth end to end) and reports the
log-log slope of wall time vs scale factor:

* slope ≈ 0 — fixed-cost regime (scheduling floor dominates; the data
  is too small to see the algorithm),
* slope ≈ 1 — linear scaling (the shape we demand of every production
  path),
* slope ≈ 2 — quadratic (acceptable ONLY for the documented exact
  baselines, e.g. dedup_embedding_cosine).

Local caveat: at these SFs most plans sit partly in the fixed-cost
regime, so slopes UNDERSTATE their asymptotic cost; a slope near 1 at
the top interval (0.01→0.1) is the meaningful signal. Slopes are
computed on the top interval for that reason.

Usage:
    python tools/scaling_bench.py > SCALING.md
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compendium_spark.plans import all_plans  # noqa: E402
from compendium_spark.session import get_session  # noqa: E402

SFS = [0.001, 0.01, 0.1]
SF_DIRS = {sf: f"/root/testdata/sf{sf}" for sf in SFS}

# one representative per family; chosen so every scaling claim in
# COVERAGE.md has a measured witness
PROBES = [
    ("q1_pricing_summary", "scan+agg (TPC-H Q1)"),
    ("q3_shipping_priority", "fact-fact join"),
    ("dedup_exact", "hash-groupBy dedup"),
    ("dedup_minhash_lsh", "banded LSH candidates"),
    ("dedup_semdedup", "cell-bounded pair scoring"),
    ("sim_ivf_topk", "probe-pruned ANN"),
    ("text_quality_score", "scan-stage text metrics"),
    ("w3_sessionization", "keyed window"),
    ("j17_point_in_time_join", "union-sort temporal join"),
    ("a20_hll_sketch", "mergeable sketch"),
    ("graph_pagerank", "iterative keyed join"),
    ("mm_audio_vad", "Arrow binary kernel"),
    ("dq_expectations_report", "compiled multi-check DQ pass"),
    ("a21_histogram_quantile", "mergeable quantile sketch"),
    ("w15_rolling_zscore", "bounded-frame window"),
    ("dedup_bloom_prefilter", "broadcast Bloom scan-stage prune"),
    # round 6
    ("j20_asof_nearest", "bidirectional union-sort as-of join"),
    ("o9_weighted_sample", "scan-stage hash-weighted predicate"),
    ("graph_2hop_features", "hub-capped 2-hop expansion"),
    ("crawl_to_documents", "mapInPandas extraction pipeline"),
    ("curate_url_canonical", "scan-stage canonicalize + hash dedup"),
    ("dedup_embedding_cosine", "LSH-bucketed exact verify, adaptive L (r8)"),
    # round 7: the round-6 families the r6 verdict flagged as unswept
    ("j21_cdc_apply", "CDC ordered-log apply"),
    ("o10_epoch_shuffle", "deterministic per-epoch shuffle"),
    ("w17_retention_cohorts", "cohort retention matrix"),
    ("e_pivot_wide", "inline-array wide pivot"),
    ("dq_snapshot_drift", "two-snapshot drift compare"),
    ("curate_mixture_temperature", "temperature-scaled mixture weights"),
    ("emb_kcenter_scalable", "k-means|| oversampled k-center"),
    # round 7 additions + the reworked decontamination path
    ("sim_hybrid_topk", "dense+lexical fusion retrieval"),
    ("mm_scene_cuts", "Arrow scene-cut kernel"),
    ("text_ngram_novelty", "first-seen n-gram novelty"),
    ("o11_compaction_plan", "manifest next-fit binning"),
    ("curate_decontaminate", "broadcast n-gram decontamination"),
    # round 8: the de-hinted vocabulary joins, the adaptive-L rework
    # (note: L itself grows 4->8 across the top interval, so its slope
    # includes the recall knob's cost, not just data growth), and the
    # new operators
    ("text_tfidf_log", "tf-idf with plain vocab equi-join (r8)"),
    ("text_lm_score", "unigram LM scoring, de-hinted vocab join (r8)"),
    ("sim_multiprobe_topk", "multi-probe LSH (Hamming-1 probes)"),
    ("text_bigram_lm_score", "bigram LM scoring"),
    ("dedup_containment", "asymmetric shingle containment (exact baseline)"),
    # round 8 late additions
    ("sim_knn_graph_multiprobe", "single-scan two-sided multi-probe kNN"),
    ("curate_quality_dedup", "quality-argmax canonical pick per cluster"),
    ("o12_zonemap_prune", "zone-map pruning report (manifest agg)"),
    ("dedup_cross_source_rate", "cross-source dup-pair rollup"),
    ("curate_yield_curve", "threshold-sweep yield report"),
    ("text_boilerplate_shingles", "corpus-global boilerplate watchlist"),
    # round 8: training-report batch
    ("curate_domain_mix_report", "domain-mixture share table"),
    ("text_bpe_merge_candidates", "vocab-weighted BPE pair counts"),
    ("curate_pack_efficiency", "packing straddle/fill report"),
    ("dedup_impact_report", "per-source dedup impact rollup"),
    ("dq_schema_profile", "single-pass column profiler"),
    ("dedup_lsh_tuning_curve", "banding S-curve vs candidates"),
    ("sim_recall_report", "measured ANN recall dashboard"),
    ("text_lang_confusion", "lang-ID confusion matrix"),
    # round 9: on-deck registration + new-operator batch
    ("curate_dsir_weights", "hashed-model importance weights (DSIR)"),
    ("curate_dsir_resample", "Gumbel-top-k importance resampling"),
    ("sim_ivf_tuning_curve", "nested-probe nprobe sweep"),
    ("sim_filtered_topk", "pre-filtered (label-constrained) ANN"),
    ("emb_dedup_threshold_curve", "semantic-dedup tau sweep"),
    ("text_heaps_curve", "vocabulary-growth (Heaps) curve"),
    ("ts_seasonal_decompose", "integer-exact STL-lite decomposition"),
    ("ts_anomaly_remainder", "remainder anomaly alerting"),
    ("dedup_winnowing", "MOSS winnowing fingerprints"),
    ("train_quality_logreg", "integer-state logreg trainer"),
    ("train_ivf_centroids", "coarse-quantizer Lloyd trainer"),
    ("graph_kcore", "k-core peel to fixpoint (r10)"),
    ("text_source_overlap_matrix", "per-source MinHash sketch Jaccard (r10)"),
    ("text_gopher_rules", "integer-compare quality rule battery"),
    ("curate_mixture_epochs", "token-budget epoch recipe"),
    # round 10
    ("sim_frontier_report", "cross-family recall-vs-cost frontier"),
    ("ing_summary_disposition", "fixture ingest + QC chain (SF-invariant)"),
    # round 11: the registered on-deck cohort + the new sink family
    ("sim_mmr_topk", "MMR greedy re-rank over broadcast pool"),
    ("curate_split_leakage", "cluster-aware split + leakage audit"),
    ("ing_geo_summary", "geo-dim ingest + snowflake (SF-invariant)"),
    ("sink_accessions_roundtrip", "warehouse insert + list sink (SF-invariant)"),
    ("w8_ntile_bands_scaled", "broadcast-cut-point NTILE (r11 rework)"),
    # round 12: the line-dedup transform and the lakehouse round-trips
    # (sinks are SF-invariant fixtures — their probe pins the commit
    # machinery's fixed cost, not data scaling)
    ("text_line_dedup", "window-counted exact line dedup"),
    ("sink_timetravel_roundtrip", "3-commit COW + time travel (SF-invariant)"),
    ("sink_exactly_once_roundtrip", "txn-fold exactly-once sink (SF-invariant)"),
    ("text_bpe_apply", "vocab-side BPE encode (r13 rework)"),
    # round 13: the trainer twin and the containment scale twin
    ("train_bpe_merges", "iterative BPE trainer (8 argmax rounds)"),
    ("dedup_containment_pipeline", "LSH-candidate containment verify"),
]


def main() -> None:
    import math

    spark = get_session("scaling-bench")
    plans = all_plans()
    # warm the JVM/codegen once per plan at the smallest SF
    for name, _ in PROBES:
        plans[name].fn(spark, SF_DIRS[SFS[0]]).count()
    rows = []
    for name, family in PROBES:
        times = {}
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                plans[name].fn(spark, SF_DIRS[sf]).count()
                best = min(best, time.time() - t0)
            times[sf] = best
        # top-interval slope: log(t(0.1)/t(0.01)) / log(10)
        slope = math.log(times[0.1] / times[0.01]) / math.log(10.0)
        rows.append((name, family, times, slope))
    print("# SCALING — measured wall-time growth across 100× data")
    print()
    print("Generated by tools/scaling_bench.py (per-SF min of 2 runs,")
    print(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]). Slope = ")
    print("log10(t(sf0.1)/t(sf0.01)): ~0 fixed-cost floor, ~1 linear,")
    print("~2 quadratic. See tool docstring for the fixed-cost caveat.")
    print()
    print("| plan | family | sf0.001 s | sf0.01 s | sf0.1 s | slope(0.01→0.1) |")
    print("|---|---|---|---|---|---|")
    for name, family, times, slope in rows:
        print(
            f"| {name} | {family} | {times[0.001]:.2f} | {times[0.01]:.2f} "
            f"| {times[0.1]:.2f} | {slope:+.2f} |"
        )
    print(CHAIN_DEPTH_FOOTER.rstrip())
    print(DECADE_FOOTER.rstrip())
    print(BUCKETED_JOIN_FOOTER.rstrip())
    print(SKIPPING_FOOTER.rstrip())


CHAIN_DEPTH_FOOTER = """
### text_bpe_apply chain-depth probe (r13, VERDICT r12 #3)

The +0.46 slope's second axis is the MERGE TABLE: the replace chain's
cost scales with merge count, not just rows. Measured at sf0.1 by
tools/bpe_chain_probe.py (min-of-3, synthetic never-firing merges
deepening the chain without changing output):

| chain depth | scan-side (per occurrence) | vocab-side (per DISTINCT word) |
|---|---|---|
| 8 | 0.764 s | 0.349 s |
| 16 | 0.812 s | 0.332 s |
| 32 | 0.860 s | 0.337 s |
| 64 | 1.136 s | 0.373 s |

Scan-side grows ~linearly in depth (the chain runs on every word
occurrence); vocab-side is DEPTH-FLAT and 2x faster even at depth 8,
because the corpus has ~250 occurrences per distinct word and the
chain runs once per distinct word (Heaps'-law amortization — the
text_bpe_merge_candidates reduction). The registered plan was
reworked to the vocab-side shape in r13 (hash-green re-pinned); at a
production merge count (30k+) the chain additionally splits into
fixed-depth projection stages to stay under the JVM's 64 KB codegen
method limit.
"""

DECADE_FOOTER = """
## sf1.0 decade probe (r13, VERDICT r12 #7)

tools/decade_probe.py generates a distribution-faithful sf1.0 (10x
sf0.1: same fixed document vocabulary, lang/source mix, dup rate,
TPC-H-ish key fanouts; every value a pure hash of the row key) and
times the highest-slope plans one more decade out (min-of-2,
uncontended):

| plan | sf0.1 | sf1.0 | decade slope (1.0 = linear) |
|---|---|---|---|
| text_bpe_apply (post-rework) | 0.69 s | 0.86 s | +0.09 |
| text_bigram_lm_score | 1.53 s | 2.60 s | +0.23 |
| dedup_winnowing | 3.35 s | 5.44 s | +0.21 |
| q3_shipping_priority | 1.22 s | 3.50 s | +0.46 |
| curate_decontaminate | 0.76 s | 1.79 s | +0.37 |
| dedup_containment (exhaustive) | 2.44 s | 39.5 s | **+1.21** |

A second sweep covers the ANN/dedup/train families (embeddings are
generated too: 64-dim hash-derived Box-Muller unit vectors with the
measured 0.07 label tilt):

| plan | sf0.1 | sf1.0 | decade slope |
|---|---|---|---|
| sim_ivf_topk | 2.44 s | 2.75 s | +0.05 |
| train_bpe_merges | 2.91 s | 3.39 s | +0.07 |
| sim_lsh_topk | 2.73 s | 4.06 s | +0.17 |
| train_pq_codebooks | 3.05 s | 4.75 s | +0.19 |
| train_ivf_centroids | 2.78 s | 5.25 s | +0.28 |
| dedup_minhash_lsh | 1.37 s | 2.94 s | +0.33 |
| text_source_overlap_matrix | 1.71 s | 3.84 s | +0.35 |
| dedup_neardup_pipeline | 2.10 s | 5.07 s | +0.38 |
| dedup_semdedup | 1.36 s | 4.30 s | +0.50 |
| dedup_containment_pipeline | 1.29 s | 4.79 s | +0.57 |
| dedup_embedding_cosine | 3.65 s | 489.5 s | **+2.13** |

Everything query-driven, candidate-driven, or centroid-bounded holds
a sublinear decade slope. Two real findings came out of the sweep:

**dedup_embedding_cosine (+2.13).** Its sign-LSH self-join uses k=4
bits per table (16 buckets), so candidate volume is L·n²/2^k —
quadratic with a 1/16-per-table constant. k=4 is not an oversight:
the plan's 0.5-cosine threshold needs per-table collision probability
(1-θ/π)^k ≈ 0.2 at θ=60° for its pinned exact recall (L=8..16
tables + 1-bit multiprobe); growing k to keep buckets small (k ≈
log2 n) collapses that to (2/3)^8 ≈ 4% per table, which no affordable
L recovers — the classic (k, L) trade. At production semantic-dedup
thresholds (cos ≥ 0.9) larger k stays high-recall, but for THIS
operator's contract the honest statement is: LSH-bucketed exact
verify is a ≤10^4-vector tool; the registered scale path for
embedding dedup is dedup_semdedup (IVF-cell-bounded, +0.50 measured,
4.3 s at sf1.0 on the same corpus). Both docstrings now carry the
measured numbers.

**dedup_containment (+1.21).** Its (and dedup_ngram_jaccard's
shared) exhaustive shingle self-join
materializes Sum C(bucket,2) pairs — 14k at sf0.01, 1.27M at sf0.1,
118M at sf1.0, for an output of a few hundred rows — because the
fixture's fixed 31-word vocabulary saturates the shingle space and
bucket sizes grow with the corpus. A rare-shingle candidate cap
(PPJoin-style prefix filtering) was prototyped and MEASURED WORSE on
this corpus: the dense shingle space makes ~every pair share a rare
shingle at sf0.1 (4x slower) while saturating df kills recall at
sf1.0. The shipped answer is architectural, matching the repo's
exact-baseline precedent: the exhaustive plans stay registered as the
sample-scale exact oracles (docstrings now carry the measured cost),
and the full-corpus path is the LSH-candidate composition —
dedup_neardup_pipeline (jaccard, existing) and
dedup_containment_pipeline (containment, NEW in r13) — whose verify
cost is O(candidates): 35/775 candidate pairs at sf0.01/sf0.1
covering 100% of qualifying pairs (pinned in tests/test_r13_plans.py).
"""

BUCKETED_JOIN_FOOTER = """
## Pre-shuffled layout: bucketed co-located joins

Slopes above measure per-RUN cost; bucketing moves a recurring join's
shuffle out of the runs entirely. `tools/bucket_bench.py` writes
`orders`/`lineitem` bucketed by the join key and A/Bs the same
aggregation join; `tests/test_bucketing.py` pins the plan-shape
contract (ZERO join-key Exchange with the bucketed layout,
value-identical result). Measured r9, sf0.1, local[32], broadcast
disabled (the technique under test is shuffle removal):

| layout | join-key exchanges | join wall (min-of-3) |
|---|---|---|
| plain parquet | 2 | 0.604 s |
| bucketBy(16, orderkey) both sides | 0 | 0.324 s (1.87×) |

One-time bucketed write: 5.3 s — the amortized shuffle. At 100 TB the
per-run saving is the full both-sides shuffle of the two largest
tables, and the layout also serves every OTHER orderkey join.
"""


SKIPPING_FOOTER = """
## Layout × data skipping: manifest stats as scan planning

The VersionedWarehouse records per-file column (min, max, null_count)
in its snapshot manifests (parquet-footer harvest at commit);
`read(..., where=...)` prunes provably-excluded files BEFORE Spark
opens anything. How much that saves is pure layout — which is why
`compact(cluster_by=...)` exists (OPTIMIZE ZORDER-lite). Measured r11
by tools/skipping_bench.py: sf0.1 lineitem, 16 files per layout,
min-of-3 scan wall, identical rows both ways:

| probe | layout | files kept | bytes read | scan wall |
|---|---|---|---|---|
| 1-month ship window | scattered (hash) | 16/16 | 12.0 MB | 0.360 s |
| 1-month ship window | clustered (range) | 1/16 | 0.7 MB | 0.190 s |
| 1-year ship window | scattered (hash) | 16/16 | 12.0 MB | 0.193 s |
| 1-year ship window | clustered (range) | 3/16 | 2.1 MB | 0.140 s |

At 100 TB the files-kept column IS the scan cost: the clustered
layout schedules ~1/16 of the tasks for the selective probe. The
prerequisite found while measuring: Spark's legacy INT96 timestamp
output carries NO parquet statistics — session.py pins
outputTimestampType=TIMESTAMP_MICROS (regression-pinned in
tests/test_data_skipping_layout.py).
"""


if __name__ == "__main__":
    main()
