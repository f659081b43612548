"""Hash-strength parity + semantic pins for the 9 round-9 plans.

These shipped in round 8 as the unregistered on-deck module (the
50-slot gate window was full) and were folded into their home modules
and registered at round-9 start. tests/test_parity.py already runs
the registered-plan hash parity at sf0.001/sf0.01; this suite goes one
SF further (sf0.1 — the round-7 embedding-cosine lesson: sf0.01-only
checks can hide scale behavior), sweeps shuffle-partition counts, and
pins the semantics a value-hash can't express (nested-probe
monotonicity, decomposition identity, trained-model quality).
"""

from __future__ import annotations

import pytest

from compendium_spark.plans import extended, ivf, scoring, streaming_plans, text, timeseries
from compendium_spark.plans.registry import all_plans

from .conftest import SF_ORACLE, SF_SMOKE
from .test_parity import _assert_hash_equal, _duck_conn, _normalize

R9_PLANS = [
    "curate_dsir_weights",
    "sim_ivf_tuning_curve",
    "ts_seasonal_decompose",
    "emb_dedup_threshold_curve",
    "text_heaps_curve",
    "sim_filtered_topk",
    "streaming_interval_outer_join",
    "train_quality_logreg",
    "train_pq_codebooks",
]

SF_FULL = "/root/testdata/sf0.1"


def test_all_r9_plans_registered_with_oracles():
    live = all_plans()
    for name in R9_PLANS:
        assert name in live, f"{name} not registered"
        assert live[name].oracle, f"{name} registered without an oracle"


@pytest.mark.parametrize("sf_dir", [SF_FULL])
@pytest.mark.parametrize("name", sorted(R9_PLANS))
def test_r9_parity_sf01(spark, name, sf_dir):
    """sf0.1 parity — one SF beyond the driver gate (sf0.001/sf0.01
    are covered for every registered plan by tests/test_parity.py)."""
    p = all_plans()[name]
    got = _normalize(p.fn(spark, sf_dir).toPandas())
    want = _normalize(_duck_conn(sf_dir).execute(p.oracle).df())
    assert len(got) > 0, f"{name}: empty result is a vacuous parity check"
    _assert_hash_equal(got, want, name)


@pytest.mark.parametrize("name", sorted(R9_PLANS))
def test_r9_partition_invariance(spark, name, monkeypatch):
    """Distributed-correctness core property: the result must be
    bitwise identical at any shuffle-partition count. The streaming
    plan pins shuffle partitions internally (_run_to_memory →
    STREAM_STATE_PARTITIONS), so for it the sweep varies THAT constant
    — otherwise both runs would silently execute at the same
    8-partition state layout and the test would be vacuous for exactly
    the plan whose state distribution matters."""
    import compendium_spark.streaming.windows as sw

    fn = all_plans()[name].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def run(n_part: int):
        if name.startswith("streaming_"):
            monkeypatch.setattr(sw, "STREAM_STATE_PARTITIONS", n_part)
        else:
            spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        return _normalize(fn(spark, SF_SMOKE).toPandas())

    try:
        lo = run(3)
        hi = run(32)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    _assert_hash_equal(lo, hi, f"{name}@partitions")


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in R9_PLANS
        # the trainers run their iteration floats-through-integers
        # inside the function and return a driver-built table at grid
        # precision — a second full GD/Lloyd run per repeat is covered
        # by the partition sweep above; the seasonal plan is the one
        # whose r8 bug WAS a repeat-run flip, so it repeats here too
        if n in ("ts_seasonal_decompose", "curate_dsir_weights",
                 "train_quality_logreg")
    ),
)
def test_r9_repeatruns_stable_sf01(spark, name):
    """ADVICE r8 #2: the float-sum→FLOOR-quantizer boundary-flip class
    is RUN-TO-RUN nondeterminism, which a single parity pass can't
    see. Re-run the reworked integer-exact plans at sf0.1 and require
    bitwise-identical results (the verification that caught the
    ts_seasonal_decompose bug)."""
    fn = all_plans()[name].fn
    a = _normalize(fn(spark, SF_FULL).toPandas())
    b = _normalize(fn(spark, SF_FULL).toPandas())
    _assert_hash_equal(a, b, f"{name}@repeat")


# mirror of tests/test_plan_shapes.py: keyless joins only where they
# are the documented design (exact-baseline sweeps against ≤10
# broadcast queries, 1-row scalar totals, literal sweep frames)
R9_KEYLESS_OK = {
    "curate_dsir_weights",  # 1-row (tot_t, tot_r) scalar broadcast
    "sim_ivf_tuning_curve",  # exact-baseline sweep + ≤8-row rank/sweep frames + 1-row totals
    "emb_dedup_threshold_curve",  # 1-row corpus-total broadcast into the shares
}
# plans whose RETURNED frame does not embody the computation, so its
# executed plan proves nothing about join strategy: the trainers run
# their joins eagerly inside the function and return a driver-built
# table; the streaming plan returns a memory-sink read. Their join
# hygiene is covered by the broadcast-policy lint (every hint site
# allowlisted with a bound and a site count).
R9_DRIVER_BUILT = {
    "train_quality_logreg",
    "train_pq_codebooks",
    "streaming_interval_outer_join",
}


@pytest.mark.parametrize("name", sorted(set(R9_PLANS) - R9_DRIVER_BUILT))
def test_r9_no_accidental_allpairs_join(spark, name):
    fn = all_plans()[name].fn
    df = fn(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    if name in R9_KEYLESS_OK:
        return  # documented
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_dsir_target_slice_scores_higher(spark):
    """DSIR's defining property: documents FROM the target domain
    (lang='en') must average a higher importance weight than the rest
    of the raw corpus — the weight is the target-vs-raw log-ratio."""
    import pandas as pd

    got = scoring.curate_dsir_weights(spark, SF_ORACLE).toPandas()
    langs = (
        _duck_conn(SF_ORACLE)
        .execute("SELECT doc_id, lang FROM documents")
        .df()
    )
    m = pd.merge(got, langs, on="doc_id")
    mean_en = m.loc[m.lang == scoring.DSIR_TARGET_LANG, "dsir_weight"].mean()
    mean_rest = m.loc[m.lang != scoring.DSIR_TARGET_LANG, "dsir_weight"].mean()
    assert mean_en > mean_rest, (mean_en, mean_rest)


def test_tuning_curve_monotone(spark):
    """Nested probes ⇒ candidates and recall are non-decreasing in
    nprobe, and cand_share stays a proper fraction."""
    rows = ivf.sim_ivf_tuning_curve(spark, SF_ORACLE).toPandas()
    assert list(rows.nprobe) == ivf.PROBE_SWEEP
    assert rows.n_candidates.is_monotonic_increasing
    assert rows.n_hits.is_monotonic_increasing
    assert (rows.cand_share <= 1.0).all() and (rows.cand_share > 0).all()
    # at max probe depth (8 of 16 cells) recall must clear the floor a
    # uniform random half-corpus scan would average
    assert rows.recall_at_k.iloc[-1] >= 0.5, rows.to_dict("records")


def test_threshold_curve_monotone_and_consistent(spark):
    """Raising tau can only shrink every count; at tau=0.5 (where the
    LSH candidate recall is exact at sf0.01 — dedup_embedding_cosine
    docstring) the pair count must equal the brute-force all-pairs
    count of pairs whose QUANTIZED cosine clears 0.5 — the same 1e-6
    grid semantics the curve counts on (ADVICE r8 #4: filtering the
    brute side on the raw cosine would spuriously drop a pair sitting
    in [0.4999995, 0.5))."""
    rows = extended.emb_dedup_threshold_curve(spark, SF_ORACLE).toPandas()
    assert list(rows.threshold) == extended.EMB_TAU_SWEEP
    for c in ["n_pairs", "n_docs_affected", "n_dropped_greedy"]:
        assert rows[c].is_monotonic_decreasing, c
    assert rows.n_pairs.iloc[0] > 0
    want = _duck_conn(SF_ORACLE).execute("""
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ),
        n AS (
          SELECT vec_id, e,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
          FROM v
        )
        SELECT COUNT(*) FROM (
          SELECT CAST(FLOOR(CAST((list_sum(list_transform(a.e, (x, i) -> x * b.e[i]))
                   / (a.nrm * b.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0 AS cosine
          FROM n a, n b WHERE a.vec_id < b.vec_id
        ) WHERE cosine >= 0.5
    """).fetchone()[0]
    got = int(rows.loc[rows.threshold == 0.5, "n_pairs"].iloc[0])
    assert got == int(want), (got, want)


def test_logreg_actually_learns(spark):
    """The trainer must recover the planted label (more 'spark' than
    'scan' tokens): the learned weight on the pos token's bucket must
    exceed the neg token's bucket weight, and scoring every doc with
    the returned centered-margin model must beat chance on balanced
    accuracy. The scoring SQL normalizes mu by the TOKEN-BEARING doc
    count (lab), matching the trainer (ADVICE r8 #3: COUNT(*) FROM
    documents would scale margins inconsistently if the fixture had
    NULL-text docs)."""
    import hashlib

    train = scoring.train_quality_logreg(spark, SF_ORACLE).toPandas()
    w = dict(zip(train.bucket, train.weight))
    b_pos = int(
        hashlib.md5(scoring.LOGREG_POS_TOKEN.encode()).hexdigest()[:2], 16
    )
    b_neg = int(
        hashlib.md5(scoring.LOGREG_NEG_TOKEN.encode()).hexdigest()[:2], 16
    )
    assert w[b_pos] > 0 > w[b_neg], (b_pos, b_neg, w[b_pos], w[b_neg])
    con = _duck_conn(SF_ORACLE)
    con.execute("CREATE TEMP TABLE wts (bucket INT, weight DOUBLE)")
    con.executemany(
        "INSERT INTO wts VALUES (?, ?)",
        [(int(r.bucket), float(r.weight)) for r in train.itertuples()],
    )
    scored = con.execute(f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), ' +')) AS token
          FROM documents
        ),
        lab AS (
          SELECT doc_id,
                 SUM(CASE WHEN token = '{scoring.LOGREG_POS_TOKEN}' THEN 1 ELSE 0 END)
                  > SUM(CASE WHEN token = '{scoring.LOGREG_NEG_TOKEN}' THEN 1 ELSE 0 END)
                   AS y
          FROM tok GROUP BY doc_id
        ),
        feat AS (
          SELECT doc_id,
                 ((strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1))
                   AS bucket,
                 COUNT(*) AS cnt
          FROM tok GROUP BY doc_id, bucket
        ),
        mu AS (
          SELECT bucket,
                 SUM(cnt) * 1.0 / (SELECT COUNT(*) FROM lab) AS mu
          FROM feat GROUP BY bucket
        ),
        k AS (
          SELECT SUM(w.weight * mu.mu) AS k
          FROM wts w JOIN mu USING (bucket) WHERE w.bucket >= 0
        ),
        m AS (
          SELECT f.doc_id,
                 SUM(f.cnt * w.weight) - MAX((SELECT k FROM k))
                   + MAX((SELECT weight FROM wts WHERE bucket = -1)) AS margin
          FROM feat f JOIN wts w ON f.bucket = w.bucket
          GROUP BY f.doc_id
        )
        SELECT lab.y AS is_target,
               AVG(CASE WHEN (m.margin > 0) = lab.y
                   THEN 1.0 ELSE 0.0 END) AS acc
        FROM m JOIN lab USING (doc_id)
        GROUP BY 1
    """).df()
    by = scored.set_index("is_target")
    balanced = (by.loc[True, "acc"] + by.loc[False, "acc"]) / 2
    assert balanced > 0.7, scored  # planted signal recovered


def test_pq_training_reduces_distortion(spark):
    """The point of Lloyd training: total quantization error
    (min-distance to the nearest codebook entry, summed over vectors
    and subspaces) must be STRICTLY lower under the trained codebooks
    than under the seeded init."""
    import numpy as np

    from compendium_spark.plans.pq import (
        CODEBOOKS,
        K,
        M,
        SUB,
        train_pq_codebooks,
    )

    rows = train_pq_codebooks(spark, SF_ORACLE).toPandas()
    trained = np.zeros((M, K, SUB))
    for r in rows.itertuples():
        trained[r.m, r.k, r.pos - 1] = r.value
    init = np.array(CODEBOOKS)
    emb = (
        _duck_conn(SF_ORACLE)
        .execute("SELECT embedding FROM embeddings ORDER BY vec_id")
        .df()
    )
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)

    def distortion(cb):
        total = 0.0
        for m in range(M):
            xs = X[:, m * SUB : (m + 1) * SUB]
            d = ((xs[:, None, :] - cb[m][None, :, :]) ** 2).sum(axis=2)
            total += d.min(axis=1).sum()
        return total

    d_init, d_trained = distortion(init), distortion(trained)
    assert d_trained < d_init * 0.98, (d_init, d_trained)


def test_outer_join_emit_once_semantics(spark):
    """Every capped view emits ≥1 row; a view is EITHER null-extended
    (exactly once) OR matched — never both; and the unmatched tail
    near the cutoff actually flushed (the watermark-stall regression
    this plan's transform guards against)."""
    import compendium_spark.streaming.windows as sw

    rows = streaming_plans.streaming_interval_outer_join(
        spark, SF_ORACLE
    ).toPandas()
    views = _duck_conn(SF_ORACLE).execute(
        "SELECT event_id FROM events WHERE event_type = 'view'"
        f" AND ts < TIMESTAMP '{sw.OUTER_JOIN_CUTOFF}'"
    ).df()
    assert set(rows.view_id) == set(views.event_id)
    nulls = rows[rows.click_id.isna()]
    matched = rows[~rows.click_id.isna()]
    assert nulls.view_id.is_unique
    assert not set(nulls.view_id) & set(matched.view_id)
    # the last capped view must be present (tail flushed)
    last_view = _duck_conn(SF_ORACLE).execute(
        "SELECT MAX(event_id) FROM events WHERE event_type = 'view'"
        f" AND ts < TIMESTAMP '{sw.OUTER_JOIN_CUTOFF}'"
    ).fetchone()[0]
    assert last_view in set(rows.view_id)


def test_filtered_topk_respects_predicate(spark):
    """Every returned neighbor must share the query's label, and the
    filtered candidate count must be well below the unfiltered probe
    reach (the pre-filter is really pruning)."""
    rows = ivf.sim_filtered_topk(spark, SF_ORACLE).toPandas()
    labels = dict(
        _duck_conn(SF_ORACLE)
        .execute("SELECT vec_id, label FROM embeddings")
        .fetchall()
    )
    assert len(rows) > 0
    for r in rows.itertuples():
        assert labels[r.cand_id] == labels[r.query_id], r
        assert r.cand_id != r.query_id
    # ~10 labels → filtered candidates ≈ a tenth of the probed reach
    n_corpus = len(labels)
    assert rows.n_candidates.max() < n_corpus / 2


def test_heaps_curve_properties(spark):
    """The full-corpus row must reconcile exactly with the corpus
    (docs, tokens, distinct tokens), cumulative counts must be
    monotone, and vocabulary growth must be SUBLINEAR in tokens over
    the top interval (Heaps' law — the broadcast policy's premise)."""
    rows = text.text_heaps_curve(spark, SF_ORACLE).toPandas()
    assert list(rows.share) == text.HEAPS_SHARES
    for c in ["n_docs", "n_tokens", "n_distinct_tokens"]:
        assert rows[c].is_monotonic_increasing, c
    want = _duck_conn(SF_ORACLE).execute(
        "SELECT (SELECT COUNT(*) FROM documents),"
        " (SELECT SUM(len(string_split_regex(trim(lower(text)), ' +')))"
        "  FROM documents),"
        " (SELECT COUNT(DISTINCT tok) FROM"
        "  (SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS tok"
        "   FROM documents))"
    ).fetchone()
    last = rows.iloc[-1]
    assert int(last.n_docs) == int(want[0])
    assert int(last.n_tokens) == int(want[1])
    assert int(last.n_distinct_tokens) == int(want[2])
    # sublinear growth: vocab grows slower than tokens on the last leg
    prev = rows.iloc[-2]
    tok_ratio = last.n_tokens / prev.n_tokens
    vocab_ratio = last.n_distinct_tokens / prev.n_distinct_tokens
    assert vocab_ratio < tok_ratio, (vocab_ratio, tok_ratio)


def test_seasonal_identity_and_coverage(spark):
    """y == trend + seasonal + remainder (within quantization), and
    every (event_type, hour) cell of the raw table is present."""
    rows = timeseries.ts_seasonal_decompose(spark, SF_ORACLE).toPandas()
    resid = (rows.y - (rows.trend + rows.seasonal + rows.remainder)).abs()
    assert (resid <= 3e-6).all(), resid.max()
    n_cells = (
        _duck_conn(SF_ORACLE)
        .execute(
            "SELECT COUNT(*) FROM (SELECT DISTINCT event_type,"
            " date_trunc('hour', ts) FROM events)"
        )
        .fetchone()[0]
    )
    assert len(rows) == n_cells
