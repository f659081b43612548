"""ANN quality: LSH bucket recall vs the exact baseline; approx-agg
error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans import all_plans
from compendium_spark.tables import load

from .conftest import SF_ORACLE, SF_SMOKE

PLANS = all_plans()


def test_lsh_recall_against_exact(spark):
    """Bucketed top-5 must agree with exact top-5 on a meaningful
    fraction of neighbors (4 planes → 16 buckets → recall well above
    the 1/16 random-candidate floor)."""
    exact = PLANS["sim_cosine_topk"].fn(spark, SF_ORACLE).collect()
    approx = PLANS["sim_lsh_topk"].fn(spark, SF_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg_recall = sum(recalls) / len(recalls)
    # 4 tables x 4 bits: each table's bucket holds ~1/16 of the corpus,
    # OR over 4 tables covers ~1/4 - on weak-structure synthetic
    # embeddings the information-theoretic ceiling is modest; assert
    # clearly above the single-bucket random floor
    assert avg_recall >= 0.3, f"LSH recall {avg_recall:.2f} too low"


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe (round 8): probing Hamming-1 buckets can only ADD
    candidates, so its recall vs the exact baseline must dominate
    single-probe sim_lsh_topk's — and clear a strictly higher floor
    (per-table collision for a borderline pair ~0.20 -> ~0.59)."""

    def recall(plan_name):
        exact = PLANS["sim_cosine_topk"].fn(spark, SF_ORACLE).collect()
        approx = PLANS[plan_name].fn(spark, SF_ORACLE).collect()
        es, aps = {}, {}
        for r in exact:
            es.setdefault(r.query_id, set()).add(r.cand_id)
        for r in approx:
            aps.setdefault(r.query_id, set()).add(r.cand_id)
        per_q = [
            len(es[q] & aps.get(q, set())) / len(es[q]) for q in es
        ]
        return sum(per_q) / len(per_q)

    r_single = recall("sim_lsh_topk")
    r_multi = recall("sim_multiprobe_topk")
    assert r_multi >= r_single
    assert r_multi >= 0.5, f"multi-probe recall {r_multi:.2f} too low"


def test_lsh_buckets_cover_corpus(spark):
    rows = PLANS["sim_lsh_buckets"].fn(spark, SF_ORACLE).collect()
    assert sum(r.n_vectors for r in rows) == 500 * 4  # each vector in 4 tables
    assert 4 < len(rows) <= 64


def test_approx_count_distinct_error(spark):
    """HLL++ / KLL sketch error bounds (a_approx_aggregates retired in
    round 8 — a_approx_error_bound carries the sketch surface and
    computes the pass/fail booleans itself; this test asserts they
    actually pass, plus an independent rel-err recomputation)."""
    rows = PLANS["a_approx_error_bound"].fn(spark, SF_ORACLE).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.distinct_ok and r.q50_ok, r
    li = load(spark, SF_ORACLE, "lineitem")
    approx = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n"))
        .collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, n_exact in exact.items():
        rel_err = abs(approx[flag] - n_exact) / n_exact
        assert rel_err < 0.1, f"{flag}: {rel_err:.3f}"


def test_ivf_recall_against_exact(spark):
    """IVF probe search vs exact top-5: 4 of 16 cells probed covers
    ~1/4 of the corpus by volume, but neighbors concentrate in the
    query's own cells, so recall must sit well above that floor."""
    exact = PLANS["sim_cosine_topk"].fn(spark, SF_ORACLE).collect()
    approx = PLANS["sim_ivf_topk"].fn(spark, SF_ORACLE).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg_recall = sum(recalls) / len(recalls)
    assert avg_recall >= 0.3, f"IVF recall {avg_recall:.2f} too low"


def test_ivf_cells_cover_corpus(spark):
    rows = PLANS["sim_ivf_cells"].fn(spark, SF_ORACLE).collect()
    assert sum(r.n_vectors for r in rows) == 500  # every vector in exactly 1 cell
    assert len(rows) > 1  # centroids actually partition the space


def test_pq_adc_recall_against_exact(spark):
    """ADC over M=16 seeded-Gaussian codebooks must rank clearly above
    the random-candidate floor (5/500 = 1%); measured ~0.30 recall@5 vs
    the exact dot-product ranking on the synthetic corpus. (Trained
    k-means codebooks raise recall; they don't change the plan shape.)
    """
    import numpy as np

    emb = load(spark, SF_ORACLE, "embeddings").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in emb])
    x = np.array([r.embedding for r in emb], dtype=np.float64)
    approx = PLANS["sim_pq_adc_topk"].fn(spark, SF_ORACLE).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.cand_id)
    recalls = []
    for qi in range(10):
        dots = x @ x[qi]
        dots[qi] = -np.inf
        exact5 = set(ids[np.argsort(-dots)[:5]].tolist())
        recalls.append(len(exact5 & approx_sets.get(qi, set())) / 5)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.2, f"PQ ADC recall {avg:.2f} too low"


def test_pq_codes_cover_corpus(spark):
    rows = PLANS["sim_pq_codes"].fn(spark, SF_ORACLE).collect()
    assert sum(r.n_vectors for r in rows) == 500 * 16  # M codes per vector
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r.subspace, 0)
        by_sub[r.subspace] += 1
    # every subspace uses a healthy share of its 16 entries
    assert all(n >= 8 for n in by_sub.values()), by_sub


def test_bucket_kernel_matches_expression_spec(spark):
    """Round 7 moved the bucket projection to an Arrow kernel
    (bucket_entries); _bucket_expr remains the expression-level spec
    and the oracle mirror. The kernel must reproduce it bit-for-bit —
    same signs, hence same buckets, for every vector and table."""
    from pyspark.sql import functions as F

    from compendium_spark.plans.ann import (
        N_TABLES,
        _bucket_expr,
        bucket_entries,
    )
    from compendium_spark.plans.extended import _load_embeddings

    emb = _load_embeddings(spark, SF_SMOKE)
    e = F.col("e")
    spec = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), _bucket_expr(e, t).alias("bucket")
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("h"),
    ).select("vec_id", "h.tbl", "h.bucket")
    got = bucket_entries(emb)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, spec.collect())
    )


def test_bucket_kernel_matches_expression_for_extended_pool(spark):
    """Round 8 extended the plane pool to 16 tables for the adaptive-L
    knob. Pin kernel == expression spec for a HIGH table index too
    (table 11) — the adaptive path must agree with the oracle's
    literal planes beyond the original 4-table prefix."""
    from pyspark.sql import functions as F

    from compendium_spark.plans.ann import (
        N_TABLES_MAX,
        _bucket_expr,
        bucket_entries,
    )
    from compendium_spark.plans.extended import _load_embeddings

    assert N_TABLES_MAX == 16
    emb = _load_embeddings(spark, SF_SMOKE)
    t = 11
    spec = emb.select(
        "vec_id", _bucket_expr(F.col("e"), t).alias("bucket")
    )
    got = bucket_entries(emb, n_tables=12).filter(F.col("tbl") == t).select(
        "vec_id", "bucket"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, spec.collect())
    )
