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


def test_exact_covariance_overflow_guard(spark):
    """Values outside the int64-exact quantization bound must raise
    loudly, never wrap silently into corrupt sums."""
    import pytest as _pytest

    from compendium_spark.plans.quality import _covariance_exact

    big = spark.createDataFrame(
        [(1, [float(1 << 22), 0.0])], "vec_id long, e array<double>"
    ).selectExpr(
        "vec_id",
        "transform(e, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS q",
    )
    with _pytest.raises(Exception, match="exceeds|2\\^21"):
        _covariance_exact(big).collect()


def test_exact_covariance_matches_unrounded(spark):
    """The integer-exact path and the float path agree to 6dp on real
    data — quantization to micro-units is below the rounding scale
    except at boundaries, where the exact path is the defined value."""
    from .conftest import SF_SMOKE
    from pyspark.sql import functions as F

    from compendium_spark.plans.quality import (
        _covariance_exact,
        _covariance_unrounded,
    )
    from compendium_spark.tables import load

    emb_q = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)),
        ).alias("q"),
    )
    exact = {
        (r.i, r.j): r.cov for r in _covariance_exact(emb_q).collect()
    }
    flt = {
        (r.i, r.j): r.cov
        for r in _covariance_unrounded(spark, SF_SMOKE).collect()
    }
    assert exact.keys() == flt.keys()
    worst = max(abs(exact[k] - flt[k]) for k in exact)
    assert worst < 1e-6, worst
