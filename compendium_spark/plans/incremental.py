"""Incremental computation: materialized-view maintenance by
partial-aggregate merge.

The reference's incremental loop is "SLURM re-runs the whole sweep and
diffs state" (SURVEY §3.3) — at 100 TB a full re-aggregation per
refresh is the single most expensive habit to break. The Spark-native
replacement: keep the MV as merge-able partial aggregates (sums and
counts, never averages), aggregate ONLY the delta partition, and
combine. Refresh cost becomes O(delta + |MV|), independent of history
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

DEC = "decimal(18,4)"

# History/delta split: everything before the cut is the "already
# materialized" half; the rest is the newly-arrived partition. The cut
# is deliberately MID-month so January 1999 exists in BOTH halves —
# the merge must fold the delta's partial into an existing MV row
# (the late/out-of-order-data path), not just append new months. A
# month-boundary cut would leave that core path untested.
MV_SPLIT = "1999-01-15"

MV_REFRESH_SQL = f"""
SELECT o_orderstatus AS status,
       date_trunc('month', o_orderdate) AS month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders,
       CAST(CAST(FLOOR(CAST((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) / 10000.0
            AS DOUBLE) AS avg_price
FROM orders
GROUP BY status, month
ORDER BY status, month
"""


def _partial(df: DataFrame) -> DataFrame:
    """Mergeable partial aggregate: DECIMAL sum + count per key.

    Only algebraic aggregates go in an MV — sum/count/min/max merge;
    avg does NOT (it's derived at read time as sum/count). DECIMAL
    sums are exactly associative, so merge order can't change values.
    """
    return (
        df.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@plan("mv_incremental_refresh", oracle=MV_REFRESH_SQL)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV refresh: merge the stored aggregate with the
    delta partition's partial aggregate — scan the delta, never the
    history.

    Here the "stored" MV half is computed from the pre-split rows for
    verifiability (the oracle proves merge(old, partial(delta)) equals
    a full recompute value-for-value); in production `mv_old` is a
    parquet/Delta table read back as-is, so refresh cost is
    O(delta + |MV|). The merge itself is a union + re-aggregate on the
    MV key — one shuffle of MV-sized data. Per-key merge is what makes
    late/out-of-order deltas safe: a delta overlapping existing months
    folds into those rows instead of duplicating them."""
    orders = load(spark, sf_dir, "orders")
    split = F.lit(MV_SPLIT).cast("timestamp")
    mv_old = _partial(orders.where(F.col("o_orderdate") < split))
    delta = _partial(orders.where(F.col("o_orderdate") >= split))
    merged = (
        mv_old.unionByName(delta)
        .groupBy("status", "month")
        .agg(
            F.sum("sum_price").alias("sum_price"),
            F.sum("n_orders").alias("n_orders"),
        )
    )
    return merged.select(
        "status",
        "month",
        F.col("sum_price").cast("double").alias("total_price"),
        "n_orders",
        quantize(F.col("sum_price").cast("double") / F.col("n_orders"), 4)
        .cast("double")
        .alias("avg_price"),
    ).orderBy("status", "month")
