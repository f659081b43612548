"""sf1.0 decade probe (VERDICT r12 #7).

SCALING.md's sweeps stop at sf0.1; this tool adds one more decade for
the highest-slope plans by GENERATING a distribution-faithful sf1.0
(10x sf0.1) under /tmp and timing the plans on both.

The driver's testdata is read-only and its generator private, so the
sf1.0 tables are re-derived here from the measured sf0.1
distributions (profiled 2026-08-16): fixed 31-word document vocab,
10..100 words/doc, lang mix en~40%/others~15%, 20 sources, ~0.16%
exact dups; TPC-H-ish customer/orders/lineitem with 10 customers per
100 orders, ~4.07 lines/order, the same date windows, segments,
priorities and price ranges. Every value is a pure function of the
row key (xxhash64), so generation is deterministic, distributed, and
RNG-free. Distribution fidelity is what a SLOPE needs; the absolute
numbers are not comparable to the driver tables row-for-row.

Tables the probed plans do not scale on (region, nation, supplier,
part, events, embeddings) are copied from sf0.1 byte-for-byte.

Usage: python tools/decade_probe.py [--mult 10] [--reps 2]
Prints one JSON line {plan: {sf01, sf1, decade_slope}}; paste into
SCALING.md. Run UNCONTENDED.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PROBED = [
    "text_bpe_apply",
    "text_bigram_lm_score",
    "dedup_winnowing",
    # dedup_containment probed +1.21 in r13; since r14 its regime
    # guard raises above 10^4 docs, so the exhaustive oracle can no
    # longer be probed at sf1.0 (that is the point of the guard)
    "q3_shipping_priority",
    "curate_decontaminate",
    # r14 (VERDICT r13 #5): iterative peel — convergence rounds may
    # grow with graph size, the slope says whether they do
    "graph_kcore",
]

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]  # ~43% en
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _h(col, salt: int):
    """Non-negative deterministic 63-bit hash of (key, salt)."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def generate(spark, out: Path, mult: int) -> None:
    n_cust, n_ord, n_doc = 15_000 * mult, 150_000 * mult, 5_000 * mult
    ids = lambda n: spark.range(0, n, 1, 64)  # noqa: E731

    cust = ids(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        (_h("id", 1) % 25).cast("int").alias("c_nationkey"),
        ((_h("id", 2) % 1_000_000) / 100.0).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in SEGMENTS]),
            ((_h("id", 3) % 5) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    cust.write.mode("overwrite").parquet(str(out / "customer.parquet"))

    base = F.lit("1995-01-01 00:00:00").cast("timestamp")
    orders = ids(n_ord).select(
        F.col("id").alias("o_orderkey"),
        (_h("id", 4) % n_cust).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("P"), F.lit("F")),
            ((_h("id", 5) % 3) + 1).cast("int"),
        ).alias("o_orderstatus"),
        ((_h("id", 6) % 45_000_000) / 100.0 + 900.0).alias("o_totalprice"),
        F.timestamp_add(
            "DAY", (_h("id", 7) % 2404).cast("int"), base
        ).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(p) for p in PRIORITIES]),
            ((_h("id", 8) % 5) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    orders.write.mode("overwrite").parquet(str(out / "orders.parquet"))

    # ~4.07 lines per order: 1 + h%7 averages 4.0 with max 7 (the
    # sf0.1 max of 17 is a tail the slope does not hinge on)
    li = (
        orders.select(
            "o_orderkey",
            "o_orderdate",
            F.explode(
                F.sequence(
                    F.lit(1), ((_h("o_orderkey", 9) % 7) + 1).cast("int")
                )
            ).alias("l_linenumber"),
        )
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            (_h("o_orderkey", 10) % (20_000 * 10)).alias("l_partkey"),
            (_h("o_orderkey", 11) % (1_000 * 10)).alias("l_suppkey"),
            "l_linenumber",
            ((_h("l_linenumber", 12) % 50) + 1).cast("double").alias(
                "l_quantity"
            ),
            ((_h("l_linenumber", 13) % 10_400_000) / 100.0 + 900.0).alias(
                "l_extendedprice"
            ),
            ((_h("l_linenumber", 14) % 11) / 100.0).alias("l_discount"),
            ((_h("l_linenumber", 15) % 9) / 100.0).alias("l_tax"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                ((_h("l_linenumber", 16) % 3) + 1).cast("int"),
            ).alias("l_returnflag"),
            F.element_at(
                F.array(F.lit("O"), F.lit("F")),
                ((_h("l_linenumber", 17) % 2) + 1).cast("int"),
            ).alias("l_linestatus"),
            F.timestamp_add(
                "DAY",
                ((_h("l_linenumber", 18) % 95) + 1).cast("int"),
                F.col("o_orderdate"),
            ).alias("l_shipdate"),
        )
    )
    li.write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    # documents: ~0.16% of docs duplicate their predecessor's text
    text_seed = F.when(
        (_h("id", 19) % 600 == 0) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    n_words = ((_h("id", 20) % 91) + 10).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            ((F.abs(F.xxhash64(text_seed, i, F.lit(21))) % len(VOCAB)) + 1)
            .cast("int"),
        ),
    )
    docs = ids(n_doc).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        F.element_at(
            F.array(*[F.lit(lg) for lg in LANGS]),
            ((_h("id", 22) % len(LANGS)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), (_h("id", 23) % 20)).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    # embeddings: 64-dim unit vectors, near-random with a slight label
    # tilt (measured sf0.1: mean cos to own label centroid 0.07, ~0 to
    # others; labels 0..9). Gaussians via Box-Muller over hash
    # uniforms; tilt = 0.07 x a label-keyed gaussian; L2-normalized.
    n_emb = 2_000 * mult
    two24 = float(1 << 24)

    def gauss(*cols):
        h1 = F.abs(F.xxhash64(*cols, F.lit(31)))
        h2 = F.abs(F.xxhash64(*cols, F.lit(32)))
        u1 = ((h1 % (1 << 24)) + 0.5) / two24
        u2 = ((h2 % (1 << 24)) + 0.5) / two24
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    raw = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: gauss(F.col("vec_id"), d)
        + 0.07 * gauss(F.col("label"), d, F.lit(99)),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x)
    )
    emb = (
        ids(n_emb)
        .select(
            F.col("id").alias("vec_id"),
            (_h("id", 30) % 10).cast("int").alias("label"),
        )
        .select(
            "vec_id",
            F.transform(raw, lambda x: x / norm)
            .cast("array<float>")
            .alias("embedding"),
            "label",
        )
    )
    emb.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    for t in ("region", "nation", "supplier", "part", "events"):
        src = Path("/root/testdata/sf0.1") / f"{t}.parquet"
        if src.exists():
            shutil.copy(src, out / f"{t}.parquet")


def probe_cdf(spark, mult: int, reps: int) -> dict:
    """O(changed data) probe for the CDF/lakehouse claims (VERDICT
    r13 #5): mv_cdf_incremental and the sink_* roundtrips assert that
    a FIXED-SIZE change costs the same no matter how big the table
    is. This builds the same warehouse table at 1x and {mult}x rows
    (rows-per-file held constant, so the file count scales with the
    data — the honest layout), applies an identical 10-key upsert +
    1-key delete at both scales, and times the three O(changed)
    surfaces: the upsert merge itself (hint-pruned rewrite set), the
    table_changes feed (manifest diff -> changed files only), and the
    MV delta fold (feed + group join against a pinned MV). Slopes
    near 0 prove the claim; slopes near 1 would mean a hidden rescan.
    """
    from pyspark.sql import types as T  # noqa: PLC0415

    from compendium_spark.plans.sinks import _one_slice_df  # noqa: PLC0415
    from compendium_spark.storage_versioned import (  # noqa: PLC0415
        VersionedWarehouse,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("day", T.IntegerType()),
            T.StructField("taxon", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    rows_per_file = 2_500
    base_rows = 40_000

    def one_scale(scale: int) -> dict[str, float]:
        root = Path(f"/tmp/compendium_cdfprobe_{os.getuid()}_{scale}x")
        shutil.rmtree(root, ignore_errors=True)
        n = base_rows * scale
        # partition count scales WITH the data (time-partitioned
        # layout: each day dir ~rows_per_file rows at every scale) —
        # this is the layout the O(changed) claim is about. An
        # UNPARTITIONED table full-rewrites by documented design (its
        # COW unit is the table) and would measure ~linear here.
        n_days = n // rows_per_file
        wh = VersionedWarehouse(
            spark, str(root), extra_tables={"ev": schema},
            hint_columns={"ev": ["id"]},
        )
        base = spark.range(n).select(
            F.concat(F.lit("K"), F.col("id")).alias("id"),
            (F.col("id") % n_days).cast("int").alias("day"),
            F.concat(F.lit("tx"), F.col("id") % 50).alias("taxon"),
            (F.col("id") * 1.0).alias("val"),
        )
        wh.write("ev", base)  # untimed: seeding is legitimately O(n)
        wh.set_partition_spec("ev", "day")
        wh.compact("ev")  # migrate into day=N dirs (untimed, one-off)
        v0 = wh.latest("ev")
        t_upsert = []
        for r in range(reps):
            ks = [r * 1000 + i for i in range(10)]
            ups = _one_slice_df(
                spark,
                [(f"K{k}", k % n_days, "txZ", -1.0) for k in ks],
                schema,
            )
            t0 = time.perf_counter()
            wh.upsert("ev", ups, "id")
            t_upsert.append(time.perf_counter() - t0)
        wh.delete("ev", [("id", "=", f"K{n - 1}")])
        v1 = wh.latest("ev")
        t_feed, t_fold = [], []
        mv = (
            wh.read("ev", v0)
            .groupBy("taxon")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .localCheckpoint(eager=True)  # pin: time the FOLD, not the seed
        )
        for _ in range(reps):
            t0 = time.perf_counter()
            wh.table_changes("ev", v0, v1, "id").count()
            t_feed.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            feed = wh.table_changes("ev", v0, v1, "id")
            delta = (
                feed.select(
                    "taxon",
                    F.when(
                        F.col("_change_type").isin(
                            "insert", "update_postimage"
                        ),
                        F.lit(1),
                    ).otherwise(F.lit(-1)).alias("d"),
                )
                .groupBy("taxon")
                .agg(F.sum("d").cast("long").alias("d"))
            )
            (
                mv.join(delta, "taxon", "full_outer")
                .select(
                    "taxon",
                    (
                        F.coalesce("n_rows", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("n_rows"),
                )
                .filter(F.col("n_rows") > 0)
                .count()
            )
            t_fold.append(time.perf_counter() - t0)
        shutil.rmtree(root, ignore_errors=True)
        return {
            "cdf_upsert_fixed": min(t_upsert),
            "cdf_table_changes": min(t_feed),
            "cdf_mv_fold": min(t_fold),
        }

    one = one_scale(1)
    ten = one_scale(mult)
    out = {}
    for k in one:
        slope = math.log10(ten[k] / one[k]) / math.log10(mult) if mult > 1 else 0
        # normalize to per-decade so --mult other than 10 still reads
        out[k] = {
            "1x": round(one[k], 3),
            f"{mult}x": round(ten[k], 3),
            "decade_slope": round(slope, 2),
        }
        print(
            f"# {k}: {one[k]:.2f}s -> {ten[k]:.2f}s  slope {slope:+.2f}",
            file=sys.stderr,
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--cdf-only", action="store_true")
    ap.add_argument(
        "--plans", nargs="*", default=None,
        help="probe only these plan names (default: the PROBED list); "
        "skips the CDF probe when given",
    )
    args = ap.parse_args()

    from compendium_spark.plans import all_plans  # noqa: PLC0415
    from compendium_spark.session import get_session  # noqa: PLC0415

    spark = get_session("decade-probe")
    if args.cdf_only:
        print(json.dumps(probe_cdf(spark, args.mult, args.reps)))
        return 0
    out = Path(f"/tmp/compendium_decade_{os.getuid()}_sf{args.mult}")
    t0 = time.perf_counter()
    generate(spark, out, args.mult)
    print(f"# generated {out} in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    plans = all_plans()
    result = {}
    for name in (args.plans if args.plans is not None else PROBED):
        fn = plans[name].fn
        t01 = min(
            _timed(fn, spark, "/root/testdata/sf0.1")
            for _ in range(args.reps)
        )
        t1 = min(_timed(fn, spark, str(out)) for _ in range(args.reps))
        slope = math.log10(t1 / t01)  # decade slope: 1.0 == linear
        result[name] = {
            "sf0.1": round(t01, 3),
            f"sf{args.mult / 10:g}": round(t1, 3),
            "decade_slope": round(slope, 2),
        }
        print(f"# {name}: {t01:.2f}s -> {t1:.2f}s  slope {slope:+.2f}",
              file=sys.stderr)
    if args.plans is None:
        result.update(probe_cdf(spark, args.mult, args.reps))
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(out, ignore_errors=True)
    return 0


def _timed(fn, spark, sf_dir) -> float:
    t = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - t


if __name__ == "__main__":
    raise SystemExit(main())
