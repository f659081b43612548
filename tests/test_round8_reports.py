"""Hand-computed semantics for the round-8 training-report plans
(text_bpe_merge_candidates, curate_pack_efficiency,
dedup_impact_report) — the parity suite proves Spark==DuckDB; these
pin that BOTH engines compute the intended numbers on corpora small
enough to verify by hand.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from compendium_spark.plans import all_plans
from compendium_spark.plans.curation import SEQ_BUDGET

PLANS = all_plans()

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """freqs: aa=3, ab=2, b=1 -> pairs (a,a)=3 (from 'aa'), (a,b)=2."""
    d = tmp_path_factory.mktemp("bpe")
    rows = {
        "doc_id": [0, 1],
        "text": ["aa ab aa", "ab b aa"],
        "lang": ["en", "en"],
        "source": ["s0", "s0"],
        "n_chars": [8, 7],
    }
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_bpe_merge_counts_by_hand(spark, bpe_dir):
    rows = PLANS["text_bpe_merge_candidates"].fn(spark, bpe_dir).collect()
    got = [(r.c1, r.c2, r.merge_count) for r in rows]
    # 'b' is a 1-char token: emits no pair (and must not crash)
    assert got == [("a", "a", 3), ("a", "b", 2)]


@pytest.fixture(scope="module")
def pack_dir(tmp_path_factory):
    """en doc token counts 200, 100, 300 in doc_id order (budget 256):
    d0 spans [0,199] seq 0 only; d1 [200,299] straddles 0->1;
    d2 [300,599] straddles 1->2. 3 seqs, 600 tokens, padding 168."""
    d = tmp_path_factory.mktemp("pack")
    texts = [" ".join(["w"] * n) for n in (200, 100, 300)]
    rows = {
        "doc_id": [0, 1, 2],
        "text": texts,
        "lang": ["en"] * 3,
        "source": ["s0"] * 3,
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_pack_efficiency_by_hand(spark, pack_dir):
    assert SEQ_BUDGET == 256  # the hand numbers below assume it
    [r] = PLANS["curate_pack_efficiency"].fn(spark, pack_dir).collect()
    assert (r.lang, r.n_docs, r.n_tokens) == ("en", 3, 600)
    assert r.n_seqs == 3
    assert r.n_straddling == 2
    assert r.tail_padding == 3 * 256 - 600
    assert r.fill_rate == pytest.approx(600 / 768, abs=1e-6)
    assert r.straddle_share == pytest.approx(2 / 3, abs=1e-6)


def test_dedup_impact_consistency(spark):
    """At sf0.001: per-source totals reconcile with the documents
    table, kept <= total, and the corpus-wide dropped count equals the
    non-canonical member count from dedup_cluster_labels."""
    rows = PLANS["dedup_impact_report"].fn(spark, SF_SMOKE).collect()
    from compendium_spark.tables import load

    docs = load(spark, SF_SMOKE, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.kept_docs <= r.n_docs
        assert 0 <= r.kept_tokens <= r.n_tokens
        assert 0.0 <= r.doc_reduction <= 1.0
        assert 0.0 <= r.token_reduction <= 1.0
    labels = PLANS["dedup_cluster_labels"].fn(spark, SF_SMOKE).collect()
    n_noncanonical = sum(1 for x in labels if x.cluster_id != x.doc_id)
    dropped = sum(r.n_docs - r.kept_docs for r in rows)
    assert dropped == n_noncanonical


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Tiny events table WITH nulls (the sf fixtures have none), so
    n_nulls is pinned on a corpus where it is actually non-zero."""
    d = tmp_path_factory.mktemp("events")
    rows = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 60_000_000 for i in range(4)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([10, None, 10, None], pa.int64()),
            "event_type": pa.array(["a", "b", None, "a"]),
            "value": pa.array([1.5, None, 2.5, 4.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}", None]),
        }
    )
    pq.write_table(rows, str(d / "events.parquet"))
    return str(d)


def test_schema_profile_by_hand(spark, events_dir):
    rows = {
        r.col_name: r
        for r in PLANS["dq_schema_profile"].fn(spark, events_dir).collect()
    }
    assert set(rows) == {
        "event_id", "ts", "user_id", "event_type", "value", "props",
    }
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["user_id"].n_nulls == 2 and rows["user_id"].n_distinct == 1
    assert rows["event_type"].n_nulls == 1 and rows["event_type"].n_distinct == 2
    assert rows["value"].n_nulls == 1
    assert rows["value"].min_num == 1.5 and rows["value"].max_num == 4.0
    assert rows["event_id"].min_num == 1.0 and rows["event_id"].max_num == 4.0
    assert rows["event_type"].min_txt == "a" and rows["event_type"].max_txt == "b"
    assert rows["ts"].min_ts is not None and rows["ts"].max_ts is not None
    # typed slots stay NULL outside their type
    assert rows["event_id"].min_txt is None and rows["ts"].min_num is None


def test_lsh_tuning_curve_invariants(spark):
    """S-curve sanity at sf0.001: capture_prob strictly increases with
    the bin, est_missed is non-negative and shrinks as p -> 1, and the
    bin counts add up to the full LSH candidate count."""
    rows = PLANS["dedup_lsh_tuning_curve"].fn(spark, SF_SMOKE).collect()
    assert rows == sorted(rows, key=lambda r: r.jaccard_bin)
    probs = [r.capture_prob for r in rows]
    assert probs == sorted(probs) and len(set(probs)) == len(probs)
    for r in rows:
        assert 0.0 < r.capture_prob <= 1.0
        assert r.est_missed >= 0.0
        assert r.above_threshold == (1 if r.jaccard_bin >= 20 else 0)
    n_cand = PLANS["dedup_minhash_lsh"].fn(spark, SF_SMOKE).count()
    assert sum(r.n_candidates for r in rows) == n_cand


def test_recall_report_invariants(spark):
    """Multi-probe dominates single-probe per query (superset of
    candidates => recall and candidate count can only grow), 2 rows
    per query, hits bounded by k."""
    rows = PLANS["sim_recall_report"].fn(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_k - r.n_hits / 5) < 1e-6
        by_q.setdefault(r.query_id, {})[r.method] = r
    assert len(by_q) == 10 and all(len(v) == 2 for v in by_q.values())
    for v in by_q.values():
        sp, mp = v["lsh_single"], v["lsh_multiprobe"]
        assert mp.n_candidates >= sp.n_candidates
        assert mp.n_hits >= sp.n_hits


def test_lang_confusion_reconciles(spark):
    """Cells sum to the corpus; row shares sum to 1 per language; the
    matrix aggregates exactly the per-doc text_lang_id output."""
    rows = PLANS["text_lang_confusion"].fn(spark, SF_SMOKE).collect()
    from compendium_spark.tables import load

    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, 0.0)
        per_lang[r.lang] += r.row_share
    assert all(abs(s - 1.0) < 1e-4 for s in per_lang.values())
    perdoc = PLANS["text_lang_id"].fn(spark, SF_SMOKE).collect()
    from collections import Counter

    counted = Counter((d.lang, d.lang_pred) for d in perdoc)
    assert {(r.lang, r.lang_pred): r.n_docs for r in rows} == dict(counted)
