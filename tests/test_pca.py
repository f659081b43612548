"""emb_covariance / emb_pca_variance_check vs NumPy ground truth.

The DuckDB oracle proves cross-engine SQL parity; this file checks the
distributed tree-aggregate against an INDEPENDENT dense computation
(np.cov-style, whole matrix in memory) — the two make different
errors, so agreement pins the math, not just the SQL translation.
"""

from __future__ import annotations

import numpy as np
import pytest

from compendium_spark.plans.quality import (
    _covariance_unrounded,
    emb_pca_variance_check,
)
from compendium_spark.tables import load

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def dense(spark):
    rows = (
        load(spark, SF_SMOKE, "embeddings")
        .select("embedding")
        .collect()
    )
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_covariance_matches_numpy(spark, dense):
    got = {
        (r.i, r.j): r.cov
        for r in _covariance_unrounded(spark, SF_SMOKE).collect()
    }
    # population covariance (divide by n), matching the plan's /n
    want = np.cov(dense, rowvar=False, bias=True)
    d = dense.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i - 1, j - 1], abs=1e-9)


def test_pca_invariant_holds(spark, dense):
    row = emb_pca_variance_check(spark, SF_SMOKE).collect()[0]
    assert row.eig_sum_ok is True
    want_trace = float(np.cov(dense, rowvar=False, bias=True).trace())
    assert row.trace_cov == pytest.approx(want_trace, abs=1e-5)
