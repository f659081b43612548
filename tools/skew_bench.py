"""Measured skew-join A/B: plain shuffle join vs salted join vs AQE.

The round-3 verdict's ask: the salted plans (j12_salted_skew_join,
a11_salted_twostage_agg) prove VALUE parity, but their benefit was
asserted, not measured. This tool measures it.

The stock sf0.1 events table is only mildly zipf (hot key = 99 of
100k rows — 0.1%), which is stage-overhead territory on local[32], so
the fact side is amplified into the regime salting exists for: rows
are replicated REP× and half of them remapped onto ONE hot key
(deterministic `pmod(event_id, 2)` — no randomness, rerunnable).
With AQE and broadcast disabled, a plain shuffle join then puts ~50%
of all probe work in a single task; the salt spreads it over N_SALT
tasks. AQE's runtime skew-split is measured as the third arm since
it's the production default for sort-merge joins.

Usage: python tools/skew_bench.py  [prints one JSON line]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SKEW_REP.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from compendium_spark.session import get_session  # noqa: E402
from compendium_spark.tables import load  # noqa: E402

N_SALT = 8
DEC = "decimal(18,4)"


def _skewed_fact(spark: SparkSession, sf_dir: str, rep: int) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    hot = F.when(F.pmod("event_id", F.lit(2)) == 0, F.lit(1)).otherwise(
        F.col("user_id")
    )
    return (
        ev.withColumn("user_id", hot)
        .withColumn("r", F.explode(F.array_repeat(F.lit(1), rep)))
        .drop("r")
    )


def _plain(fact: DataFrame, dim: DataFrame) -> DataFrame:
    return (
        fact.join(dim, fact.user_id == dim.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


def _salted(fact: DataFrame, dim: DataFrame) -> DataFrame:
    f = fact.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALT)))
    d = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    return (
        f.join(d, (f.user_id == d.c_custkey) & (f.salt == d.salt))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


def _time(df_builder, reps: int = 3) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = df_builder().count()
        best = min(best, time.perf_counter() - t0)
    return best, rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = int(os.environ.get("SKEW_REP", "25"))
    spark = get_session("skew_bench")
    # force the skew to matter: no broadcast escape hatch, no AQE
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    fact = _skewed_fact(spark, sf_dir, rep).localCheckpoint()  # materialize once
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).localCheckpoint()
    n = fact.count()
    hot_share = fact.filter(F.col("user_id") == 1).count() / n

    # correctness first: both shapes must agree before timing means anything
    a = {r.segment: (r.n_events, r.total_value) for r in _plain(fact, dim).collect()}
    b = {r.segment: (r.n_events, r.total_value) for r in _salted(fact, dim).collect()}
    assert a == b, "salted join changed values"

    t_plain, _ = _time(lambda: _plain(fact, dim))
    t_salted, _ = _time(lambda: _salted(fact, dim))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe, _ = _time(lambda: _plain(fact, dim))

    print(
        json.dumps(
            {
                "metric": "skew_join_ab",
                "fact_rows": n,
                "hot_key_share": round(hot_share, 4),
                "n_salt": N_SALT,
                "plain_sec": round(t_plain, 3),
                "salted_sec": round(t_salted, 3),
                "aqe_skewjoin_sec": round(t_aqe, 3),
                "salted_speedup_vs_plain": round(t_plain / t_salted, 2),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
