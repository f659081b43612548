"""Bucketed co-located join: the pre-shuffled table layout.

tools/bucket_bench.py measures the A/B at sf0.1; this test pins the
PLAN-SHAPE contract at the smoke SF so a regression (bucket spec not
honored, config drift re-enabling the shuffle) fails the suite: both
sides written `bucketBy(join key)` must sort-merge-join with ZERO
join-key Exchange, and the result must equal the plain-layout join.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from compendium_spark.tables import load

from .conftest import SF_SMOKE


def _join_agg(orders, lineitem):
    return (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def test_bucketed_join_has_no_join_key_exchange(spark, tmp_path):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.sql("CREATE DATABASE IF NOT EXISTS btest LOCATION '"
              + str(tmp_path / "btest.db") + "'")
    try:
        orders = load(spark, SF_SMOKE, "orders")
        lineitem = load(spark, SF_SMOKE, "lineitem")
        for name, df, key in [
            ("btest.orders_b", orders, "o_orderkey"),
            ("btest.lineitem_b", lineitem, "l_orderkey"),
        ]:
            (
                df.write.mode("overwrite")
                .bucketBy(4, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(name)
            )
        plain = _join_agg(orders, lineitem)
        bucketed = _join_agg(
            spark.table("btest.orders_b"), spark.table("btest.lineitem_b")
        )
        want = [tuple(r) for r in plain.collect()]
        got = [tuple(r) for r in bucketed.collect()]
        assert got == want  # layout must not change values
        ex = re.findall(
            r"Exchange hashpartitioning\((?:o_orderkey|l_orderkey)",
            bucketed._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0],
        )
        assert not ex, f"bucketed join still shuffles: {ex}"
    finally:
        spark.sql("DROP TABLE IF EXISTS btest.orders_b")
        spark.sql("DROP TABLE IF EXISTS btest.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS btest")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
