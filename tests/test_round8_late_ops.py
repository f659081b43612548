"""Semantic invariants for the round-8 late additions, beyond the
hash gate: the parity test proves Spark == DuckDB; these prove the
shared answer means what the docstrings claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans.curation import (
    curate_yield_curve,
    dedup_cross_source_rate,
)
from compendium_spark.plans.extended import (
    curate_quality_dedup,
    dedup_cluster_labels,
    dedup_neardup_pipeline,
)
from compendium_spark.plans.olap_ext import o12_zonemap_prune
from compendium_spark.plans.text import BOILERPLATE_TOPK, text_boilerplate_shingles
from compendium_spark.tables import load

from .conftest import SF_ORACLE


class TestQualityDedup:
    def test_kept_member_maximizes_quality_key(self, spark):
        out = {r.cluster_id: r for r in curate_quality_dedup(spark, SF_ORACLE).collect()}
        labels = dedup_cluster_labels(spark, SF_ORACLE)
        docs = load(spark, SF_ORACLE, "documents")
        toks = F.split(F.trim(F.col("text")), " +")
        scored = docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.filter(toks, lambda x: x.isin("a", "the"))).alias("n_stop"),
        )
        members = labels.join(scored, "doc_id").collect()
        by_cluster: dict[int, list] = {}
        for m in members:
            by_cluster.setdefault(m.cluster_id, []).append(m)
        assert set(out) == set(by_cluster)
        for cid, mem in by_cluster.items():
            # ranking key: gate DESC, n_tokens DESC, doc_id ASC
            def key(m):
                gate = 1 if (m.n_tokens >= 50 and m.n_stop > 0) else 0
                return (-gate, -m.n_tokens, m.doc_id)

            best = min(mem, key=key)
            row = out[cid]
            assert row.kept_doc == best.doc_id
            assert row.kept_tokens == best.n_tokens
            assert row.n_members == len(mem)
            assert row.n_dropped == len(mem) - 1
            assert len(mem) >= 2  # clusters are real dup groups

    def test_policy_differs_from_min_id_when_quality_does(self, spark):
        """The operator exists because argmax-quality != min-id; on the
        fixture at least one cluster must pick a non-minimum doc (else
        the plan is indistinguishable from curate_corpus's rule)."""
        out = curate_quality_dedup(spark, SF_ORACLE).collect()
        assert any(r.kept_doc != r.cluster_id for r in out)


class TestZonemapPrune:
    def test_layout_invariants(self, spark):
        rows = {r.layout: r for r in o12_zonemap_prune(spark, SF_ORACLE).collect()}
        assert set(rows) == {"bydate", "natural"}
        bd, nat = rows["bydate"], rows["natural"]
        # the answer (matching rows) is layout-invariant
        assert bd.rows_matched == nat.rows_matched > 0
        assert bd.rows_total == nat.rows_total
        for r in rows.values():
            assert r.files_scanned <= r.files_total
            assert r.rows_matched <= r.rows_scanned <= r.rows_total
            assert r.scan_amplification >= 1.0
        # date partitioning must prune strictly better than the
        # uncorrelated natural layout
        assert bd.scan_amplification < nat.scan_amplification
        assert bd.files_scanned < bd.files_total


class TestCrossSourceRate:
    def test_pair_accounting(self, spark):
        out = dedup_cross_source_rate(spark, SF_ORACLE).collect()
        n_pairs_total = dedup_neardup_pipeline(spark, SF_ORACLE).count()
        assert sum(r.n_pairs for r in out) == n_pairs_total > 0
        for r in out:
            assert r.source_lo <= r.source_hi
            assert r.within_source == (1 if r.source_lo == r.source_hi else 0)
        # the fixture has cross-source dup pairs (the signal the
        # operator exists to surface)
        assert any(r.within_source == 0 for r in out)


class TestBoilerplateShingles:
    def test_watchlist_semantics(self, spark):
        rows = text_boilerplate_shingles(spark, SF_ORACLE).collect()
        assert len(rows) == BOILERPLATE_TOPK
        freqs = [r.doc_freq for r in rows]
        assert freqs == sorted(freqs, reverse=True)
        n_docs = load(spark, SF_ORACLE, "documents").count()
        for r in rows:
            assert len(r.shingle.split(" ")) == 3  # 3-gram shingles
            assert 1 <= r.doc_freq <= n_docs
            assert 0.0 < r.doc_share <= 1.0
        # the top entry really is the corpus-wide argmax doc-frequency:
        # recount it independently (distinct docs containing the shingle)
        top = rows[0]
        docs = load(spark, SF_ORACLE, "documents")
        recount = docs.filter(
            F.col("text").contains(top.shingle)
        ).count()
        # containment is a superset of shingle presence (substring can
        # straddle token boundaries), so it bounds the watchlist count
        assert recount >= top.doc_freq


class TestYieldCurve:
    def test_monotone_and_bounded(self, spark):
        rows = sorted(
            curate_yield_curve(spark, SF_ORACLE).collect(),
            key=lambda r: r.threshold,
        )
        docs_total = load(spark, SF_ORACLE, "documents").count()
        kept = [r.docs_kept for r in rows]
        toks = [r.tokens_kept for r in rows]
        assert kept == sorted(kept, reverse=True)  # raising cutoff drops docs
        assert toks == sorted(toks, reverse=True)
        for r in rows:
            assert 0 <= r.docs_kept <= docs_total
            assert 0.0 <= r.doc_share <= 1.0
            assert 0.0 <= r.token_share <= 1.0
            # dropping short docs always costs a smaller share of
            # tokens than of docs
            assert r.token_share >= r.doc_share or r.docs_kept == 0
        # the sweep spans a real decision range on the fixture
        assert rows[0].docs_kept > rows[-1].docs_kept
