"""Misra-Gries sketch invariants, property-tested without Spark: the
partition-split + row-at-a-time merge used by `a18_freq_items_sketch`
must honor est <= true and true - est <= 2n/(k+1) for EVERY item on
EVERY stream and split."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from compendium_spark.plans.olap_ext import _mg_merge


def _mg_stream(tokens: list[str], k: int) -> dict:
    """The per-partition fold from a18's `partials` kernel."""
    summary: dict = {}
    for t in tokens:
        if t in summary:
            summary[t] += 1
        elif len(summary) < k:
            summary[t] = 1
        else:
            drop = [u for u in summary if summary[u] == 1]
            for u in summary:
                summary[u] -= 1
            for u in drop:
                del summary[u]
    return summary


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from([f"t{i}" for i in range(40)]), min_size=0, max_size=400
    ),
    k=st.integers(2, 16),
    n_parts=st.integers(1, 5),
)
def test_mg_bound_holds_under_split_and_merge(tokens, k, n_parts):
    # split the stream into contiguous partitions, fold each, then
    # merge row-at-a-time exactly as the plan's driver loop does
    n = len(tokens)
    bounds = [round(i * n / n_parts) for i in range(n_parts + 1)]
    merged: dict = {}
    for lo, hi in zip(bounds, bounds[1:]):
        part = _mg_stream(tokens[lo:hi], k)
        for t, c in part.items():
            merged = _mg_merge(merged, {t: c}, k)
    true = Counter(tokens)
    err = 2.0 * n / (k + 1)
    for t, tc in true.items():
        est = merged.get(t, 0)
        assert est <= tc, (t, est, tc)
        assert tc - est <= err, (t, est, tc, err)
    # no phantom items: everything in the summary really occurred
    for t in merged:
        assert t in true


def test_mg_merge_respects_capacity():
    acc: dict = {}
    for i in range(100):
        acc = _mg_merge(acc, {f"x{i}": 1}, 8)
    assert len(acc) <= 8
