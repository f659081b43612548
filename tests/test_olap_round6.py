"""Behavioral checks for the round-6 OLAP operators (parity is
tests/test_parity.py's job; these pin the semantic claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans.olap_ext import (
    N_SHARDS,
    W_CENTS,
    e_pivot_wide,
    o7_shard_assign,
    o9_weighted_sample,
)
from compendium_spark.tables import load

from .conftest import SF_ORACLE


def test_pivot_counts_conserve_total(spark):
    wide = e_pivot_wide(spark, SF_ORACLE)
    total = wide.select(
        sum(F.sum(f"n_{t}") for t in ["click", "error", "purchase", "signup", "view"])
    ).collect()[0][0]
    assert total == load(spark, SF_ORACLE, "events").count()


def test_shard_assignment_is_balanced_and_total(spark):
    shards = o7_shard_assign(spark, SF_ORACLE).collect()
    n_total = load(spark, SF_ORACLE, "orders").count()
    assert sum(r["n_rows"] for r in shards) == n_total
    assert len(shards) == N_SHARDS
    mean = n_total / N_SHARDS
    worst = max(r["n_rows"] for r in shards)
    # content-hash uniformity: the hottest shard stays near the mean
    assert worst <= 1.5 * mean, (worst, mean)


def test_weighted_sample_rate_tracks_expectation(spark):
    orders = load(spark, SF_ORACLE, "orders")
    expected = orders.select(
        F.sum(
            F.least(
                F.lit(1.0),
                F.floor(F.col("o_totalprice") * 100.0 + 0.5) / F.lit(W_CENTS),
            )
        ).alias("e")
    ).collect()[0]["e"]
    got = o9_weighted_sample(spark, SF_ORACLE).count()
    # binomial concentration: ~sqrt(E) noise; 15% is a loose alarm bound
    assert abs(got - expected) <= max(0.15 * expected, 25), (got, expected)
    # and high-value rows are certainties: every order past the cap is kept
    capped = orders.filter(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5) >= W_CENTS
    ).count()
    kept_keys = {
        r["o_orderkey"] for r in o9_weighted_sample(spark, SF_ORACLE).collect()
    }
    cap_keys = {
        r["o_orderkey"]
        for r in orders.filter(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5) >= W_CENTS
        ).collect()
    }
    assert cap_keys <= kept_keys, capped
