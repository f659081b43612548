"""Hash-strength parity for the round-9 ON-DECK plans.

These plans are complete but deliberately unregistered (round 8's
50-slot gate window closed full — see plans/ondeck_r9.py). This suite
holds them to the exact standard the driver gate will apply when they
register in round 9: Spark result ≡ DuckDB oracle, bitwise on floats,
at sf0.001 AND sf0.01 (the gate SF), plus semantic pins a value-hash
can't express (nested-probe monotonicity, decomposition identity).
"""

from __future__ import annotations

import pytest

from compendium_spark.plans import ondeck_r9 as od

from .conftest import SF_ORACLE, SF_SMOKE
from .test_parity import _assert_hash_equal, _duck_conn, _normalize

# derived from the module's single source of truth: a plan added to
# ONDECK enters this suite automatically (and register() in round 9)
CASES = {name: (fn, oracle) for name, fn, oracle in od.ONDECK}

# sf0.1 included on purpose: the round-7 embedding-cosine lesson is
# that sf0.01-only checks can hide scale behavior (recall knees, plan
# flips); the driver gates at sf0.01, this suite goes one SF further.
SF_FULL = "/root/testdata/sf0.1"


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE, SF_FULL])
@pytest.mark.parametrize("name", sorted(CASES))
def test_ondeck_parity(spark, name, sf_dir):
    fn, sql = CASES[name]
    got = _normalize(fn(spark, sf_dir).toPandas())
    want = _normalize(_duck_conn(sf_dir).execute(sql()).df())
    assert len(got) > 0, f"{name}: empty result is a vacuous parity check"
    _assert_hash_equal(got, want, name)


@pytest.mark.parametrize("name", sorted(CASES))
def test_ondeck_partition_invariance(spark, name, monkeypatch):
    """Distributed-correctness core property: the result must be
    bitwise identical at any shuffle-partition count (the round-8
    window's 50-plan partition sweep, applied to the on-deck set).
    The streaming plan pins shuffle partitions internally
    (_run_to_memory → STREAM_STATE_PARTITIONS), so for it the sweep
    varies THAT constant — otherwise both runs would silently execute
    at the same 8-partition state layout and the test would be
    vacuous for exactly the plan whose state distribution matters."""
    import compendium_spark.streaming.windows as sw

    fn, _ = CASES[name]
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


# on-deck mirror of tests/test_plan_shapes.py: keyless joins only
# where they are the documented design (exact-baseline sweeps against
# ≤10 broadcast queries, 1-row scalar totals, literal sweep frames)
ONDECK_KEYLESS_OK = {
    "curate_dsir_weights",  # 1-row (tot_t, tot_r) scalar broadcast
    "sim_ivf_tuning_curve",  # exact-baseline sweep + ≤8-row rank/sweep frames + 1-row totals
    "emb_dedup_threshold_curve",  # 1-row corpus-total broadcast into the shares
}
# plans whose RETURNED frame does not embody the computation, so its
# executed plan proves nothing about join strategy: the trainers run
# their joins eagerly inside the function and return a driver-built
# table; the streaming plan returns a memory-sink read. Their join
# hygiene is covered by the broadcast-policy lint (every hint site
# allowlisted with a bound) — asserting on their returned LocalTable-
# Scan here would be FALSE assurance, not coverage.
ONDECK_DRIVER_BUILT = {
    "train_quality_logreg",
    "train_pq_codebooks",
    "streaming_interval_outer_join",
}


@pytest.mark.parametrize(
    "name", sorted(set(CASES) - ONDECK_DRIVER_BUILT)
)
def test_ondeck_no_accidental_allpairs_join(spark, name):
    fn, _ = CASES[name]
    df = fn(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    if name in ONDECK_KEYLESS_OK:
        return  # documented
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_driver_built_exclusions_are_exact():
    """ONDECK_DRIVER_BUILT must list exactly the plans whose returned
    frame is a LocalTableScan/memory read — anything else must go
    through the real shape guard."""
    assert ONDECK_DRIVER_BUILT <= set(CASES)


def test_pq_assign_kernels_identical():
    """The parameterized long-form assign kernel is a forced COPY of
    pq._assign_codes (round-8 window: pq.py is untouchable). Pin the
    two bit-identical on the shared init so they cannot drift apart
    silently; fold into one kernel in round 9."""
    import inspect
    import re

    from compendium_spark.plans import pq

    # the numerically-load-bearing statements must be identical up to
    # the codebook variable name: slice, diff, accumulation, argmin
    def core(fn):
        out = []
        for line in inspect.getsource(fn).splitlines():
            t = line.strip()
            if t.startswith("#"):
                continue
            if re.match(r"(xs = x\[|diff = xs\[|dists = dists)", t):
                out.append(t.replace("cbs[", "cb["))
            elif "dists.argmin(axis=1)" in t:
                out.append("ARGMIN")
        return out

    got, want = core(od._assign_codes_long), core(pq._assign_codes)
    assert got and got == want, (got, want)


def test_register_hook_registers_everything():
    """The round-9 hook must register every ONDECK plan with its
    oracle attached — run in a SUBPROCESS so the live registry (and
    test_ondeck_not_registered's invariant) stays untouched."""
    import subprocess
    import sys

    code = (
        "from compendium_spark.plans import all_plans\n"
        "from compendium_spark.plans import ondeck_r9 as od\n"
        "before = len(all_plans())\n"
        "od.register()\n"
        "after = all_plans()\n"
        "assert len(after) == before + len(od.ONDECK), (before, len(after))\n"
        "for name, _, ob in od.ONDECK:\n"
        "    assert name in after and after[name].oracle == ob(), name\n"
        "print('OK', len(after))\n"
    )
    from pathlib import Path

    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.startswith("OK"), out.stdout


def test_ondeck_not_registered():
    """Round-8 invariant: the gate window is full, so these names must
    NOT be in the live registry (registering one would strand a 51st
    stale plan outside the 50-slot window). Round 9 flips this test:
    delete it when ondeck_r9.register() is wired in."""
    from compendium_spark.plans import all_plans

    live = set(all_plans())
    for name in CASES:
        assert name not in live, (
            f"{name} registered while round-8 window is full — "
            "see plans/ondeck_r9.py docstring"
        )


def test_dsir_target_slice_scores_higher(spark):
    """DSIR's defining property: documents FROM the target domain
    (lang='en') must average a higher importance weight than the rest
    of the raw corpus — the weight is the target-vs-raw log-ratio."""
    import pandas as pd

    got = od.curate_dsir_weights(spark, SF_ORACLE).toPandas()
    langs = (
        _duck_conn(SF_ORACLE)
        .execute("SELECT doc_id, lang FROM documents")
        .df()
    )
    m = pd.merge(got, langs, on="doc_id")
    mean_en = m.loc[m.lang == od.DSIR_TARGET_LANG, "dsir_weight"].mean()
    mean_rest = m.loc[m.lang != od.DSIR_TARGET_LANG, "dsir_weight"].mean()
    assert mean_en > mean_rest, (mean_en, mean_rest)


def test_tuning_curve_monotone(spark):
    """Nested probes ⇒ candidates and recall are non-decreasing in
    nprobe, and cand_share stays a proper fraction."""
    rows = od.sim_ivf_tuning_curve(spark, SF_ORACLE).toPandas()
    assert list(rows.nprobe) == od.PROBE_SWEEP
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
    count at cosine ≥ 0.5."""
    rows = od.emb_dedup_threshold_curve(spark, SF_ORACLE).toPandas()
    assert list(rows.threshold) == od.EMB_TAU_SWEEP
    for c in ["n_pairs", "n_docs_affected", "n_dropped_greedy"]:
        assert rows[c].is_monotonic_decreasing, c
    assert rows.n_pairs.iloc[0] > 0
    from compendium_spark.plans.extended import COSINE_ALLPAIRS_SQL

    brute = _duck_conn(SF_ORACLE).execute(COSINE_ALLPAIRS_SQL).df()
    want = int((brute.cosine >= 0.5).sum())
    got = int(rows.loc[rows.threshold == 0.5, "n_pairs"].iloc[0])
    assert got == want, (got, want)


def test_logreg_actually_learns(spark):
    """The trainer must recover the planted label (more 'spark' than
    'scan' tokens): the learned weight on the pos token's bucket must
    exceed the neg token's bucket weight, and scoring every doc with
    the returned centered-margin model must beat chance on balanced
    accuracy."""
    import hashlib

    train = od.train_quality_logreg(spark, SF_ORACLE).toPandas()
    w = dict(zip(train.bucket, train.weight))
    b_pos = int(hashlib.md5(od.LOGREG_POS_TOKEN.encode()).hexdigest()[:2], 16)
    b_neg = int(hashlib.md5(od.LOGREG_NEG_TOKEN.encode()).hexdigest()[:2], 16)
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
                 SUM(CASE WHEN token = '{od.LOGREG_POS_TOKEN}' THEN 1 ELSE 0 END)
                  > SUM(CASE WHEN token = '{od.LOGREG_NEG_TOKEN}' THEN 1 ELSE 0 END)
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
                 SUM(cnt) * 1.0 / (SELECT COUNT(*) FROM documents) AS mu
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

    from compendium_spark.plans.pq import CODEBOOKS, K, M, SUB

    rows = od.train_pq_codebooks(spark, SF_ORACLE).toPandas()
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
    rows = od.streaming_interval_outer_join(spark, SF_ORACLE).toPandas()
    views = _duck_conn(SF_ORACLE).execute(
        "SELECT event_id FROM events WHERE event_type = 'view'"
        f" AND ts < TIMESTAMP '{od.OUTER_JOIN_CUTOFF}'"
    ).df()
    assert set(rows.view_id) == set(views.event_id)
    nulls = rows[rows.click_id.isna()]
    matched = rows[~rows.click_id.isna()]
    assert nulls.view_id.is_unique
    assert not set(nulls.view_id) & set(matched.view_id)
    # the last capped view must be present (tail flushed)
    last_view = _duck_conn(SF_ORACLE).execute(
        "SELECT MAX(event_id) FROM events WHERE event_type = 'view'"
        f" AND ts < TIMESTAMP '{od.OUTER_JOIN_CUTOFF}'"
    ).fetchone()[0]
    assert last_view in set(rows.view_id)


def test_filtered_topk_respects_predicate(spark):
    """Every returned neighbor must share the query's label, and the
    filtered candidate count must be well below the unfiltered probe
    reach (the pre-filter is really pruning)."""
    rows = od.sim_filtered_topk(spark, SF_ORACLE).toPandas()
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
    rows = od.text_heaps_curve(spark, SF_ORACLE).toPandas()
    assert list(rows.share) == od.HEAPS_SHARES
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
    rows = od.ts_seasonal_decompose(spark, SF_ORACLE).toPandas()
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
