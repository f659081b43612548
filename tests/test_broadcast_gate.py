"""Size-gated broadcast hints (tables.maybe_broadcast).

The round-1 audit flagged forced F.broadcast() on SF-scaling tables
(customer/part/supplier) as a 100 TB scale hazard: right at sf0.1,
an executor OOM at large SF. maybe_broadcast gates the hint on the
table's on-disk footprint; these tests pin both sides of the gate.
"""

from __future__ import annotations

import pytest

from compendium_spark import tables
from compendium_spark.tables import maybe_broadcast

from .conftest import SF_SMOKE


def _has_broadcast_hint(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_small_table_gets_hint(spark):
    df = maybe_broadcast(spark, SF_SMOKE, "supplier")
    assert _has_broadcast_hint(df)


def test_oversize_table_falls_back_to_aqe(spark, monkeypatch):
    monkeypatch.setattr(tables, "BROADCAST_BUDGET_BYTES", 0)
    df = maybe_broadcast(spark, SF_SMOKE, "supplier")
    assert not _has_broadcast_hint(df)


def test_missing_stats_means_no_hint(spark):
    # unknown on-disk footprint (no such file) → never force a broadcast
    df = maybe_broadcast(
        spark, "/nonexistent", "supplier", tables.load(spark, SF_SMOKE, "supplier")
    )
    assert not _has_broadcast_hint(df)


def test_prefiltered_df_is_preserved(spark):
    from pyspark.sql import functions as F

    base = tables.load(spark, SF_SMOKE, "supplier").filter(F.col("s_acctbal") > 0)
    df = maybe_broadcast(spark, SF_SMOKE, "supplier", base)
    assert df.count() == base.count()


@pytest.mark.parametrize("name", ["nation", "region"])
def test_constant_size_dims_always_qualify(spark, name):
    assert _has_broadcast_hint(maybe_broadcast(spark, SF_SMOKE, name))
