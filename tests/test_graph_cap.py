"""Wedge-join skew guard: capped_neighbor_lists must bound every
center's member list (and therefore the wedge join's per-center pair
count) regardless of hub degree, and graph_common_neighbors' gate
check must be non-vacuous (rows > 0) on the driver's own parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans.graph import (
    CN_CENTER_CAP,
    capped_neighbor_lists,
    graph_common_neighbors,
)

from .conftest import SF_ORACLE


def test_cap_bounds_per_center_pairs(spark):
    # star graph: hub "h" adjacent to 40 spokes (degree 40 >> cap),
    # plus a small clique so non-hub centers exist too
    edges = [("h", f"s{i:02d}") for i in range(40)]
    edges += [("s00", "s01"), ("s01", "s02"), ("s00", "s02")]
    und = spark.createDataFrame(edges, "a string, b string")
    capped = capped_neighbor_lists(und, CN_CENTER_CAP)
    sizes = {
        r["center"]: r["n"]
        for r in capped.groupBy("center")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the hub's 40-member list is capped; every list is <= CAP
    assert sizes["h"] == CN_CENTER_CAP
    assert all(n <= CN_CENTER_CAP for n in sizes.values())
    # therefore the wedge join emits at most CAP*(CAP-1)/2 pairs per
    # center — the quadratic-blowup guard the docstring claims
    c2 = capped.select(F.col("center").alias("c2"), F.col("member").alias("m2"))
    pairs = (
        capped.join(
            c2, (F.col("center") == F.col("c2")) & (F.col("member") < F.col("m2"))
        )
        .groupBy("center")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    bound = CN_CENTER_CAP * (CN_CENTER_CAP - 1) // 2
    assert all(r["n_pairs"] <= bound for r in pairs.collect())


def test_cap_prefers_low_degree_members(spark):
    # center c has members: 3 low-degree leaves + 1 hub; cap=3 must
    # keep the leaves (lowest (degree, id)) and drop the hub
    edges = [("c", "leaf1"), ("c", "leaf2"), ("c", "leaf3"), ("c", "hub")]
    edges += [("hub", f"x{i}") for i in range(10)]
    und = spark.createDataFrame(edges, "a string, b string")
    capped = capped_neighbor_lists(und, 3)
    members = {
        r["member"]
        for r in capped.filter(F.col("center") == "c").collect()
    }
    assert members == {"leaf1", "leaf2", "leaf3"}


def test_common_neighbors_nonvacuous(spark):
    # the r05 gate row was 0==0 rows — an all-green check exercising
    # zero arithmetic. The sparsified graph must actually emit rows.
    df = graph_common_neighbors(spark, SF_ORACLE)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["cn"] >= 1 and 0 < r["jaccard"] <= 1 for r in rows)


def test_wedge_cap_decision_fires_on_hub_not_on_ring(spark):
    from compendium_spark.plans.graph import (
        WEDGE_SKEW_THRESHOLD,
        wedge_cap_decision,
    )

    hub = spark.createDataFrame(
        [("h", f"s{i:02d}") for i in range(40)], "a string, b string"
    )
    ratio, cap = wedge_cap_decision(hub)
    assert ratio > WEDGE_SKEW_THRESHOLD and cap == CN_CENTER_CAP
    # ring: every node degree 2 — perfectly level, no cap, no bias
    ring = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 12}") for i in range(12)],
        "a string, b string",
    )
    ratio2, cap2 = wedge_cap_decision(ring)
    assert abs(ratio2 - 1.0) < 1e-9 and cap2 is None
    # end-to-end: applying the decided cap on the hub graph bounds the
    # per-center (= per-task) pair count at cap^2/2
    capped = capped_neighbor_lists(hub, cap)
    c2 = capped.select(F.col("center").alias("c2"), F.col("member").alias("m2"))
    worst = (
        capped.join(
            c2, (F.col("center") == F.col("c2")) & (F.col("member") < F.col("m2"))
        )
        .groupBy("center")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert worst <= cap * (cap - 1) // 2
