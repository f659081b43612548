"""Local mirror of the driver's correctness gate.

For every registered plan with an oracle: run the Spark query and the
DuckDB SQL on the same sf0.01 parquet, normalize (sort columns by
name, sort rows), and require value equality. Strict by design — the
plans are written for cross-engine bit-parity (decimal aggregation,
md5 hashing, fixed rounding), so any diff is a real defect.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from compendium_spark.plans import all_plans
from compendium_spark.tables import TABLE_NAMES

from .conftest import SF_ORACLE

PLANS = all_plans()
WITH_ORACLE = sorted(n for n, p in PLANS.items() if p.oracle is not None)
ROWS_ONLY = sorted(n for n, p in PLANS.items() if p.oracle is None)


def _duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def _assert_hash_equal(got: pd.DataFrame, want: pd.DataFrame, name: str) -> None:
    """Assert equality at the strength of the driver's value hash.

    ``assert_frame_equal(check_exact=True)`` still treats ``-0.0 ==
    0.0`` — but the driver serializes cell bytes, so a signed zero on
    one engine only IS a hash mismatch (the round-4 ``emb_covariance``
    red row, cell (6,10)). Float columns are therefore compared
    BITWISE via an int64 view; NaN==NaN is accepted (both engines
    serialize the canonical quiet NaN).
    """
    import numpy as np

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    # dtype KIND must agree (int vs float): the driver's value hash
    # serializes cells, so int 50917 vs float 50917.0 hash-mismatch even
    # when numerically equal (the round-1 mm_feature_pipeline red row —
    # DuckDB HUGEINT→float). Width (int32 vs int64) and datetime unit
    # differences serialize identically and are allowed.
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        norm = lambda k: "i" if k in "iu" else k
        assert norm(gk) == norm(wk), (
            f"{name}.{c}: dtype kind {got[c].dtype} vs {want[c].dtype} — "
            f"would hash-mismatch in the driver gate"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            g = got[c].to_numpy(dtype="float64")
            w = want[c].to_numpy(dtype="float64")
            bit_same = g.view("int64") == w.view("int64")
            both_nan = np.isnan(g) & np.isnan(w)
            bad = ~(bit_same | both_nan)
            if bad.any():
                i = int(np.argmax(bad))
                raise AssertionError(
                    f"{name}.{c}[{i}]: bitwise float mismatch {g[i]!r} vs "
                    f"{w[i]!r} (e.g. -0.0 vs 0.0, or last-ulp drift) — "
                    f"numerically equal values can still hash-mismatch "
                    f"in the driver gate"
                )


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    p = PLANS[name]
    got = _normalize(p.fn(spark, SF_ORACLE).toPandas())
    con = _duck_conn(SF_ORACLE)
    want = _normalize(con.execute(p.oracle).df())
    _assert_hash_equal(got, want, name)


def test_gate_rejects_signed_zero():
    """The hardened gate must fail a frame differing ONLY by a signed
    zero — the exact failure class assert_frame_equal cannot see."""
    got = pd.DataFrame({"v": [1.5, 0.0]})
    want = pd.DataFrame({"v": [1.5, -0.0]})
    with pytest.raises(AssertionError, match="bitwise float mismatch"):
        _assert_hash_equal(got, want, "signed_zero_probe")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_plans_run(spark, name):
    p = PLANS[name]
    df = p.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
