"""r15: the LSH candidate-doc semi-join prefilter must size-gate its
broadcast hint (r14 verdict #3) — forced under the budget (bench SFs:
map-side probe, zero new exchanges), unhinted above it (100 TB: the
candidate volume grows with the corpus, so the planner must decide
from runtime statistics). Both regimes return identical rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark import tables
from compendium_spark.plans.extended import _cand_doc_filter

from .conftest import SF_SMOKE


def _cand(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    ).localCheckpoint(eager=False)


def _has_broadcast_hint(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_hinted_under_the_gate(spark):
    out = _cand_doc_filter(spark, SF_SMOKE, _cand(spark), "doc_a", "doc_b")
    assert _has_broadcast_hint(out)


def test_unhinted_above_the_gate(spark, monkeypatch):
    monkeypatch.setattr(tables, "BROADCAST_BUDGET_BYTES", 0)
    out = _cand_doc_filter(spark, SF_SMOKE, _cand(spark), "doc_a", "doc_b")
    assert not _has_broadcast_hint(out)


def test_both_regimes_identical_rows(spark, monkeypatch):
    hinted = _cand_doc_filter(
        spark, SF_SMOKE, _cand(spark), "doc_a", "doc_b"
    )
    rows_hinted = sorted(r.doc_id for r in hinted.select("doc_id").collect())
    monkeypatch.setattr(tables, "BROADCAST_BUDGET_BYTES", 0)
    plain = _cand_doc_filter(
        spark, SF_SMOKE, _cand(spark), "doc_a", "doc_b"
    )
    rows_plain = sorted(r.doc_id for r in plain.select("doc_id").collect())
    assert rows_hinted == rows_plain == [1, 2, 3]
