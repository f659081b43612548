"""Bucketed co-located join: the 100 TB fact-fact join strategy.

q12-style orders ⋈ lineitem joins shuffle both fact tables on the
join key every query. Bucketing both tables by that key at write time
(`bucketBy`) pre-shuffles ONCE: every later join reads matching
buckets and sort-merge-joins with NO exchange on either side. This
test materializes bucketed copies of the testdata facts and asserts
the join plan is exchange-free — the property that makes repeated
fact joins affordable at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from compendium_spark.tables import load

from .conftest import SF_SMOKE

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh_dir = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        load(spark, SF_SMOKE, "orders")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .option("path", f"{wh_dir}/b_orders")
        .saveAsTable("b_orders")
    )
    (
        load(spark, SF_SMOKE, "lineitem")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .option("path", f"{wh_dir}/b_lineitem")
        .saveAsTable("b_lineitem")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(bucketed):
    spark = bucketed
    joined = (
        spark.table("b_orders")
        .hint("merge")  # pin SMJ: the point is bucket co-location, not
        # the tiny-SF broadcast AQE would otherwise pick
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan
    # the join subtree (below the partial aggregate) must be
    # exchange-free: both sides stream straight from bucketed files
    join_part = plan.split("HashAggregate")[-1]
    assert "Exchange" not in join_part, f"join shuffled:\n{join_part}"


def test_bucketed_join_matches_unbucketed(bucketed):
    spark = bucketed
    got = {
        r.o_orderpriority: r.n
        for r in spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        r.o_orderpriority: r.n
        for r in load(spark, SF_SMOKE, "orders")
        .join(
            load(spark, SF_SMOKE, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
