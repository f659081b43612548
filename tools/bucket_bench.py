"""Measured bucketed-join A/B: shuffle join vs bucket-co-located join.

The one scale technique in the engine's toolbox without an artifact:
pre-bucketing both sides of a recurring join key (Hive-format
`bucketBy` tables) lets Spark plan a SortMergeJoin with ZERO Exchange
— the co-location is baked into the table layout, so a 100 TB join
that would shuffle both sides every run pays the shuffle ONCE at
write time and never again. This tool writes `orders` and `lineitem`
bucketed by the join key, runs the same aggregation join both ways,
asserts the bucketed physical plan contains no Exchange upstream of
the join, and prints the measured wall times as one JSON line.

Usage: python tools/bucket_bench.py  [prints one JSON line]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       BUCKET_N (default 16), BUCKET_WAREHOUSE (default a temp dir).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from compendium_spark.session import get_session  # noqa: E402
from compendium_spark.tables import load  # noqa: E402


def _join_agg(orders, lineitem):
    """The recurring join this layout exists for: per-order-priority
    revenue — orders ⋈ lineitem on the orderkey, then a small agg."""
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


def _join_key_exchanges(df) -> int:
    """Exchange nodes partitioned on the JOIN key in the executed
    (AQE-final) plan — the shuffles bucketing exists to remove. The
    post-join aggregation exchange (hashpartitioning on the group key)
    is NOT counted: it is tiny (priority cardinality) and present in
    both arms."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return len(
        re.findall(r"Exchange hashpartitioning\((?:o_orderkey|l_orderkey)", plan)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_buckets = int(os.environ.get("BUCKET_N", "16"))
    wh = os.environ.get("BUCKET_WAREHOUSE") or tempfile.mkdtemp(
        prefix="bucket_bench_"
    )
    cleanup = "BUCKET_WAREHOUSE" not in os.environ
    spark = get_session(
        "bucket_bench",
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )  # force SMJ both arms: the technique under test is shuffle removal
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bb LOCATION '{wh}/bb.db'")
    spark.sql("USE bb")

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    # one-time layout cost (the amortized shuffle)
    t0 = time.perf_counter()
    for name, df, key in [
        ("orders_b", orders, "o_orderkey"),
        ("lineitem_b", lineitem, "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    t_write = time.perf_counter() - t0

    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    plain = _join_agg(orders, lineitem)
    bucketed = _join_agg(spark.table("orders_b"), spark.table("lineitem_b"))

    ex_plain = _join_key_exchanges(plain)
    ex_bucketed = _join_key_exchanges(bucketed)
    assert ex_bucketed == 0, (
        f"bucketed join still shuffles ({ex_bucketed} join-key exchanges)"
        " — bucket spec not picked up"
    )
    assert ex_plain == 2, f"plain join should shuffle both sides, saw {ex_plain}"

    # value parity between the two layouts
    a = [tuple(r) for r in plain.collect()]
    b = [tuple(r) for r in bucketed.collect()]
    assert a == b, "bucketed layout changed the join result"

    t_plain = best_of(lambda: _join_agg(orders, lineitem).collect())
    t_bucketed = best_of(
        lambda: _join_agg(
            spark.table("orders_b"), spark.table("lineitem_b")
        ).collect()
    )

    print(
        json.dumps(
            {
                "metric": "bucketed_join_ab",
                "sf_dir": sf_dir,
                "n_buckets": n_buckets,
                "exchanges_plain": ex_plain,
                "exchanges_bucketed": ex_bucketed,
                "write_once_sec": round(t_write, 2),
                "join_plain_sec": round(t_plain, 3),
                "join_bucketed_sec": round(t_bucketed, 3),
                "speedup": round(t_plain / t_bucketed, 2),
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bb")
    if cleanup:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
