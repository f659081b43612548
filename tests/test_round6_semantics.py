"""Semantic pins for the round-6 operators — parity proves Spark ==
DuckDB; these prove both match the INTENDED behavior on constructed
fixtures (the same role test_graph_cap plays for the wedge cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_asof_nearest_picks_closer_side_and_respects_tau(spark):
    from compendium_spark.plans.history import ASOF_TAU_S, j20_asof_nearest

    rows = {r["purchase_id"]: r for r in j20_asof_nearest(spark, SF_ORACLE).collect()}
    assert rows
    matched = [r for r in rows.values() if r["click_id"] is not None]
    assert matched, "tau too tight: no purchase matched any click"
    # every emitted delta respects tau and is the true |dt| to SOME click
    assert all(0 <= r["delta_us"] <= ASOF_TAU_S * 1_000_000 for r in matched)
    # cross-check one user end-to-end against a brute-force nearest
    u = matched[0]["user_id"]
    from compendium_spark.tables import load

    ev = load(spark, SF_ORACLE, "events").filter(F.col("user_id") == u)
    clicks = [
        (r["event_id"], r["ts"])
        for r in ev.filter(F.col("event_type") == "click").collect()
    ]
    for r in (x for x in rows.values() if x["user_id"] == u):
        if not clicks:
            assert r["click_id"] is None
            continue
        best = min(
            abs((c_ts - r["ts"]).total_seconds()) for _, c_ts in clicks
        )
        if r["click_id"] is None:
            assert best > ASOF_TAU_S
        else:
            assert abs(r["delta_us"] / 1e6 - best) < 1e-6


def test_cdc_apply_drops_delete_final_entities(spark):
    from compendium_spark.plans.history import j21_cdc_apply
    from compendium_spark.tables import load
    from pyspark.sql import Window

    snap = {r["entity_id"]: r for r in j21_cdc_apply(spark, SF_ORACLE).collect()}
    ev = load(spark, SF_ORACLE, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
        .collect()
    )
    for r in last:
        if r["event_type"] == "error":  # mapped to D
            assert r["user_id"] not in snap
        else:
            assert r["user_id"] in snap


def test_url_canonical_collapses_all_variants(spark):
    from compendium_spark.plans.curation import curate_url_canonical

    rows = curate_url_canonical(spark, SF_ORACLE).collect()
    # every canonical URL is fully normalized
    for r in rows:
        u = r["canonical_url"]
        assert u.startswith("http://")
        assert "#" not in u and "utm_" not in u
        assert ":80" not in u and ":443" not in u
        assert not u.endswith("/")
        assert u == u.lower()
    # doc_id % 100 defines the logical resource: 500 docs / 100 keys
    # with 4 surface forms each must collapse to exactly 100 groups of 5
    assert len(rows) == 100
    assert all(r["n_variants"] == 5 for r in rows)


def test_pivot_wide_matches_long_counts(spark):
    from compendium_spark.plans.olap_ext import e_pivot_wide
    from compendium_spark.tables import load

    wide = {r["user_id"]: r for r in e_pivot_wide(spark, SF_ORACLE).collect()}
    long = (
        load(spark, SF_ORACLE, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    )
    for r in long:
        assert wide[r["user_id"]][f"n_{r['event_type']}"] == r["count"]
