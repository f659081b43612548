"""OLAP extensions: rollup/cube/grouping sets, approximate aggregates,
sampling.

None of these exist in the reference (its aggregation surface is
SURVEY §2.4); they complete the analytics side of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize, quantize6, sql_quantize
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

DEC = "decimal(18,4)"

ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@plan("a_rollup", oracle=ROLLUP_SQL)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total).
    Spark expands grouping sets in one pass (Expand node) — still a
    single scan + single shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


CUBE_SQL = """
SELECT COALESCE(o_orderstatus, '<all>') AS orderstatus,
       COALESCE(o_orderpriority, '<all>') AS orderpriority,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
"""


@plan("a_cube", oracle=CUBE_SQL)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n",
        )
        .orderBy("orderstatus", "orderpriority")
    )


# Round 8: the former `a_approx_aggregates` (rows-only — HLL++ /
# KLL sketch internals are engine-specific, so it could never
# hash-verify) is retired. Its operator surface lives on in
# `a_approx_error_bound` below, which computes the SAME
# approx_count_distinct / percentile_approx sketches and is
# oracle-verified via error-bound booleans — the registry now has no
# permanently-unverifiable rows.


APPROX_BOUND_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       CAST(CAST(FLOOR(CAST((CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS DOUBLE)) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) / 100.0 AS DOUBLE)
           AS exact_q50,
       TRUE AS distinct_ok,
       TRUE AS q50_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@plan("a_approx_error_bound", oracle=APPROX_BOUND_SQL)
def a_approx_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verified sketch aggregates (formerly the twin of the
    retired rows-only ``a_approx_aggregates``): sketch values are
    engine-specific (no hash oracle possible), but their *error bounds*
    are checkable. Computes exact count-distinct / exact median
    alongside the HLL++ / KLL approximations in ONE aggregate pass and
    emits booleans asserting the approximations sit within their
    documented relative error (HLL rsd=0.02 → allow 5x margin; KLL at
    accuracy 10000 is near-exact → 1% bound). The oracle computes the
    exact values and TRUE literals — a hash match therefore proves the
    sketches were within bound. Exact aggregates here are the
    verification cost; production uses the sketch-only sibling."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile("l_extendedprice", 0.5).cast("double").alias("exact_q50_raw"),
        F.percentile_approx("l_extendedprice", 0.5, 10000)
        .cast("double")
        .alias("approx_q50"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        quantize("exact_q50_raw", 2).cast("double").alias("exact_q50"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.10 * F.col("exact_orders")
        ).alias("distinct_ok"),
        (
            F.abs(F.col("approx_q50") - F.col("exact_q50_raw"))
            <= 0.01 * F.abs(F.col("exact_q50_raw"))
        ).alias("q50_ok"),
    ).orderBy("l_returnflag")


# per-stratum keep fractions as md5-hex prefix thresholds (the
# curate_mixture_sample idiom): keep iff md5(key)[:8] < threshold.
# floor(fraction * 2^32) in hex — 0.1 -> 0x19999999, 0.5 -> 0x80000000.
STRATA_THRESHOLDS = {"O": "19999999", "F": "19999999", "P": "80000000"}

_STRATA_CASE = (
    "CASE o_orderstatus "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in STRATA_THRESHOLDS.items())
    + " ELSE '00000000' END"
)

O2_STRAT_SQL = f"""
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < {_STRATA_CASE}
ORDER BY o_orderkey
"""


@plan("o2_stratified_sample", oracle=O2_STRAT_SQL)
def o2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling per key — the distributed form of the
    reference's ORDER BY RANDOM() work-queue batching (O1). Round 8
    re-form: the per-stratum Bernoulli trial is an md5-prefix
    threshold compare instead of sampleBy(seed) — identical
    per-row-filter shape (no shuffle, no sort, linear at 100 TB), but
    deterministic across engines AND runs, so the driver can
    hash-verify it (sampleBy's XORShift stream is Spark-private).
    The hex thresholds encode keep fractions: md5's first 8 hex chars
    are uniform on [0, 2^32), so prefix < floor(f * 2^32) keeps ~f of
    each stratum."""
    orders = load(spark, sf_dir, "orders")
    threshold = F.lit("00000000")
    for k, v in STRATA_THRESHOLDS.items():
        threshold = F.when(F.col("o_orderstatus") == k, F.lit(v)).otherwise(
            threshold
        )
    keep = (
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8) < threshold
    )
    return (
        orders.filter(keep)
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


SALTED_AGG_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@plan("a11_salted_twostage_agg", oracle=SALTED_AGG_SQL)
def a11_salted_twostage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe aggregation: salt → partial agg → final agg.

    The manual form of skew mitigation for a groupBy whose key
    distribution has whales (one user = 10% of 100 TB): stage 1
    aggregates on (key, salt) so a hot key's rows spread over SALT
    partial groups on different cores; stage 2 combines the partials —
    it processes at most SALT rows per key, so no task ever sees a
    whale. Decimal partial sums are exactly associative, which is why
    the result is bit-identical to the plain groupBy the oracle runs
    (never do this with float partials). Complements AQE skew-join
    handling, which only covers joins, not aggregations.
    """
    ev = load(spark, sf_dir, "events")
    SALT = 16
    partial = (
        ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)))
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast(DEC)).alias("pv"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


MEDIAN_SQL = """
SELECT l_returnflag,
       CAST(FLOOR(CAST((quantile_cont(l_quantity, 0.5)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS qty_median,
       CAST(FLOOR(CAST((quantile_cont(l_extendedprice, [0.25, 0.75])[1]) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS price_q1,
       CAST(FLOOR(CAST((quantile_cont(l_extendedprice, [0.25, 0.75])[2]) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS price_q3
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@plan("a13_exact_quantiles", oracle=MEDIAN_SQL)
def a13_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — both engines use the
    same definition). Exact quantiles need the full sorted group in
    one place: fine per-group here, but the 100 TB path is
    a_approx_error_bound's sketch-mergeable percentile_approx."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            quantize6(F.percentile("l_quantity", F.lit(0.5))).alias("qty_median"),
            quantize6(F.percentile("l_extendedprice", F.lit(0.25))).alias("price_q1"),
            quantize6(F.percentile("l_extendedprice", F.lit(0.75))).alias("price_q3"),
        )
        .orderBy("l_returnflag")
    )


STRING_AGG_SQL = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@plan("a14_string_agg", oracle=STRING_AGG_SQL)
def a14_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per-priority sorted
    distinct status list. collect_set → array_sort → array_join keeps
    the result deterministic regardless of partition arrival order —
    the only safe way to string-agg in a distributed engine."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# per-status md5-prefix keep thresholds (~10% / ~10% / ~50%)
_O2B_THRESHOLDS = {"O": "19999999", "F": "19999999", "P": "80000000"}

_O2B_CASE = (
    "CASE o_orderstatus "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _O2B_THRESHOLDS.items())
    + " ELSE '00000000' END"
)

O2B_SQL = f"""
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < {_O2B_CASE}
ORDER BY o_orderkey
"""


@plan("o2_stratified_deterministic", oracle=O2B_SQL)
def o2_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed stratified sampling: per-stratum keep
    fractions expressed as md5-prefix thresholds — the same per-row
    scan-stage filter as o2_stratified_sample's Bernoulli sampleBy,
    but reproducible across engines, runs, and reshards (and therefore
    value-hash-checked, where the seeded variant is rows-only). The
    trade: rates tied to a hash of the key, so resampling with a new
    "seed" means salting the hash input, not changing a seed int.
    """
    orders = load(spark, sf_dir, "orders")
    threshold = F.lit("00000000")
    for k, v in _O2B_THRESHOLDS.items():
        threshold = F.when(F.col("o_orderstatus") == k, F.lit(v)).otherwise(
            threshold
        )
    keep = (
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8)
        < threshold
    )
    return (
        orders.filter(keep)
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


GROUPING_SETS_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY returnflag, linestatus
"""


@plan("a16_grouping_sets", oracle=GROUPING_SETS_SQL)
def a16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((flag), (status)) — two independent
    one-dimensional reports in ONE scan + ONE shuffle.

    The set list here is deliberately NOT a rollup/cube prefix (those
    are a_rollup / a_cube): two disjoint single-column groupings is the
    multi-report shape where GROUPING SETS actually saves work — Spark's
    Expand node emits one row per set per input row, so the corpus is
    read once instead of once per report; at 100 TB that halves the
    scan bytes vs two separate queries. DECIMAL sums keep it exact.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Misra-Gries frequent-items sketch (mergeable summaries)
# ---------------------------------------------------------------------------

MG_COUNTERS = 64  # k: summary size per partition; error <= n/(k+1)
MG_TOPN = 10

FREQ_SKETCH_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS token
  FROM documents
),
cnt AS (SELECT token, COUNT(*) AS true_count FROM tok GROUP BY token)
SELECT token, true_count, TRUE AS bound_ok
FROM cnt
ORDER BY true_count DESC, token
LIMIT {MG_TOPN}
"""


def _mg_merge(acc: dict, other: dict, k: int) -> dict:
    """Merge two Misra-Gries summaries into one with <= k counters.

    Union-sum, then if over k entries decrement everything by the
    (k+1)-th largest count and drop the non-positive — the standard
    mergeable-summaries reduction whose total underestimate stays
    <= n/(k+1) over the whole stream (Agarwal et al. 2012)."""
    for t, c in other.items():
        acc[t] = acc.get(t, 0) + c
    if len(acc) > k:
        d = sorted(acc.values(), reverse=True)[k]
        acc = {t: c - d for t, c in acc.items() if c - d > 0}
    return acc


@plan("a18_freq_items_sketch", oracle=FREQ_SKETCH_SQL)
def a18_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items (heavy hitters) via a distributed Misra-Gries
    sketch, verified against exact counts — the custom mergeable
    sketch the approx family (`a_approx_aggregates`) doesn't cover:
    HLL/quantile sketches ship with Spark, a frequency summary does
    not.

    Each partition folds its token stream into ONE k-counter summary
    (an Arrow pass, O(k) state); the <= partitions x k summary rows
    are merged associatively driver-side (mergeable-summaries
    property — on a cluster this is a treeAggregate). `bound_ok`
    asserts the MG guarantee per emitted top token: true - 2n/(k+1)
    <= estimate <= true (see the inline bound note). The exact
    counts come from the one token groupBy
    BOTH engines run (that is the output's value surface; the sketch
    contributes the verified booleans). At 100 TB the exact pass is
    the expensive one — production keeps only the sketch and drops
    the verification join, the exact side here is what makes the
    operator oracle-checkable.
    """
    import pandas as pd  # noqa: PLC0415

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("token")
    )

    def partials(batches):
        summary: dict = {}
        n_seen = 0
        for pdf in batches:
            for t in pdf["token"]:
                n_seen += 1
                if t in summary:
                    summary[t] += 1
                elif len(summary) < MG_COUNTERS:
                    summary[t] = 1
                else:
                    drop = [u for u in summary if summary[u] == 1]
                    for u in summary:
                        summary[u] -= 1
                    for u in drop:
                        del summary[u]
        yield pd.DataFrame(
            {
                "token": list(summary.keys()) + [None],
                "est": list(summary.values()) + [0],
                "n_seen": [0] * len(summary) + [n_seen],
            }
        )

    rows = tok.mapInPandas(
        partials, schema="token string, est long, n_seen long"
    ).collect()
    merged: dict = {}
    n_total = 0
    for r in rows:
        if r.token is None:
            n_total += r.n_seen
        else:
            merged = _mg_merge(merged, {r.token: r.est}, MG_COUNTERS)
    # asserted bound: the streaming phase underestimates by <=
    # n/(k+1) and the row-at-a-time driver fold adds at most another
    # n/(k+1) of subtractions (each reduction round removes >=
    # (k+1)*d counts), so 2n/(k+1) is the safe provable envelope.
    # A strict pairwise summary merge (Agarwal et al.) tightens this
    # back to n/(k+1); the looser constant keeps the fold simple.
    err = 2.0 * n_total / (MG_COUNTERS + 1)

    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "token")
        .limit(MG_TOPN)
        .collect()
    )
    out = [
        (
            r.token,
            r.true_count,
            bool(
                merged.get(r.token, 0) <= r.true_count
                and merged.get(r.token, 0) >= r.true_count - err
            ),
        )
        for r in exact
    ]
    return local_df(
        spark, out, "token string, true_count long, bound_ok boolean"
    )


# ---------------------------------------------------------------------------
# Z-order layout quality (multi-dimensional clustering for scan pruning)
# ---------------------------------------------------------------------------

Z_BITS = 10  # 10 bits per dimension -> 20-bit z-value
Z_BUCKETS = 16  # stand-in for files/row-groups
# fixed probe queries: a selective range on each dimension
ZQ_X_LO, ZQ_X_HI = 100, 200
ZQ_Y_LO, ZQ_Y_HI = 100, 300


def _sql_interleave(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ZORDER_SQL = f"""
WITH base AS (
  SELECT o_orderkey,
         o_custkey % 1024 AS x,
         datediff('day', DATE '1992-01-01', o_orderdate) % 1024 AS y
  FROM orders
),
z AS (
  SELECT o_orderkey, x, y, {_sql_interleave('x', 'y')} AS zv
  FROM base
),
zb AS (
  SELECT x, y, NTILE({Z_BUCKETS}) OVER (ORDER BY zv, o_orderkey) AS bucket
  FROM z
),
lb AS (
  SELECT x, y, NTILE({Z_BUCKETS}) OVER (ORDER BY x, o_orderkey) AS bucket
  FROM z
),
zstat AS (
  SELECT bucket, MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
  FROM zb GROUP BY bucket
),
lstat AS (
  SELECT bucket, MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
  FROM lb GROUP BY bucket
),
probes AS (
  SELECT 'zorder' AS layout, 'x_range' AS query,
         COUNT(CASE WHEN x0 <= {ZQ_X_HI} AND x1 >= {ZQ_X_LO} THEN 1 END)
           AS buckets_touched
  FROM zstat
  UNION ALL
  SELECT 'zorder', 'y_range',
         COUNT(CASE WHEN y0 <= {ZQ_Y_HI} AND y1 >= {ZQ_Y_LO} THEN 1 END)
  FROM zstat
  UNION ALL
  SELECT 'zorder', 'xy_rect',
         COUNT(CASE WHEN x0 <= {ZQ_X_HI} AND x1 >= {ZQ_X_LO}
                     AND y0 <= {ZQ_Y_HI} AND y1 >= {ZQ_Y_LO} THEN 1 END)
  FROM zstat
  UNION ALL
  SELECT 'linear', 'x_range',
         COUNT(CASE WHEN x0 <= {ZQ_X_HI} AND x1 >= {ZQ_X_LO} THEN 1 END)
  FROM lstat
  UNION ALL
  SELECT 'linear', 'y_range',
         COUNT(CASE WHEN y0 <= {ZQ_Y_HI} AND y1 >= {ZQ_Y_LO} THEN 1 END)
  FROM lstat
  UNION ALL
  SELECT 'linear', 'xy_rect',
         COUNT(CASE WHEN x0 <= {ZQ_X_HI} AND x1 >= {ZQ_X_LO}
                     AND y0 <= {ZQ_Y_HI} AND y1 >= {ZQ_Y_LO} THEN 1 END)
  FROM lstat
)
SELECT layout, query, CAST(buckets_touched AS BIGINT) AS buckets_touched,
       {Z_BUCKETS} AS n_buckets
FROM probes
ORDER BY layout, query
"""


def _spark_interleave(x, y):
    out = None
    for i in range(Z_BITS):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = tx + ty if out is None else out + tx + ty
    return out


@plan("o5_zorder_layout", oracle=ZORDER_SQL)
def o5_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout quality: how many of
    {Z_BUCKETS} storage buckets a selective range query must touch
    under a z-ordered layout vs a single-column linear sort — the
    min/max pruning measurement behind multi-dimensional data layout
    (Delta/Iceberg OPTIMIZE ZORDER).

    The z-value is a 20-term unrolled bit interleave (integer-exact on
    both engines). Buckets stand in for files/row-groups; per-bucket
    min/max are exactly the footer statistics a scan prunes on. The
    expected result — linear wins only on its own sort column, z-order
    stays selective on BOTH dimensions — is emitted as counted rows,
    so the advantage is value-checked, not asserted in prose. At
    100 TB the NTILE global sort is replaced by
    `repartitionByRange(zv)` (sampled ranges, no total order) +
    sortWithinPartitions before the parquet write; per-bucket min/max
    then materialize as real footer stats, and the probe arithmetic
    is unchanged.
    """
    from pyspark.sql import Window as W  # noqa: PLC0415

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("x"),
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % 1024).alias(
            "y"
        ),
    )
    z = orders.select(
        "o_orderkey", "x", "y", _spark_interleave(F.col("x"), F.col("y")).alias("zv")
    )
    zb = z.select(
        "x",
        "y",
        F.ntile(Z_BUCKETS).over(W.orderBy("zv", "o_orderkey")).alias("bucket"),
    )
    lb = z.select(
        "x",
        "y",
        F.ntile(Z_BUCKETS).over(W.orderBy("x", "o_orderkey")).alias("bucket"),
    )

    def stats(b: DataFrame) -> DataFrame:
        return b.groupBy("bucket").agg(
            F.min("x").alias("x0"),
            F.max("x").alias("x1"),
            F.min("y").alias("y0"),
            F.max("y").alias("y1"),
        )

    def probes(st: DataFrame, layout: str) -> DataFrame:
        tx = (F.col("x0") <= ZQ_X_HI) & (F.col("x1") >= ZQ_X_LO)
        ty = (F.col("y0") <= ZQ_Y_HI) & (F.col("y1") >= ZQ_Y_LO)
        return st.agg(
            F.count(F.when(tx, 1)).alias("x_range"),
            F.count(F.when(ty, 1)).alias("y_range"),
            F.count(F.when(tx & ty, 1)).alias("xy_rect"),
        ).select(
            F.lit(layout).alias("layout"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("x_range").alias("query"),
                        F.col("x_range").cast("long").alias("buckets_touched"),
                    ),
                    F.struct(
                        F.lit("y_range").alias("query"),
                        F.col("y_range").cast("long").alias("buckets_touched"),
                    ),
                    F.struct(
                        F.lit("xy_rect").alias("query"),
                        F.col("xy_rect").cast("long").alias("buckets_touched"),
                    ),
                )
            ).alias("p"),
        ).select(
            "layout",
            F.col("p.query").alias("query"),
            F.col("p.buckets_touched").alias("buckets_touched"),
            F.lit(Z_BUCKETS).alias("n_buckets"),
        )

    return (
        probes(stats(zb), "zorder")
        .unionByName(probes(stats(lb), "linear"))
        .orderBy("layout", "query")
    )


# ---------------------------------------------------------------------------
# robust statistics: median / MAD / deterministic mode
# ---------------------------------------------------------------------------

ROBUST_SQL = """
WITH med AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
),
mad AS (
  SELECT li.l_returnflag,
         quantile_cont(ABS(CAST(li.l_extendedprice AS DOUBLE) - med.med), 0.5)
           AS mad
  FROM lineitem li JOIN med ON li.l_returnflag = med.l_returnflag
  GROUP BY li.l_returnflag
),
mode_rank AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY COUNT(*) DESC, l_quantity) AS rn
  FROM lineitem GROUP BY l_returnflag, l_quantity
)
SELECT med.l_returnflag AS returnflag,
       CAST(FLOOR(CAST((med.med) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS price_median,
       CAST(FLOOR(CAST((mad.mad) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS price_mad,
       CAST(m.l_quantity AS DOUBLE) AS qty_mode
FROM med
JOIN mad ON med.l_returnflag = mad.l_returnflag
JOIN (SELECT l_returnflag, l_quantity FROM mode_rank WHERE rn = 1) m
  ON med.l_returnflag = m.l_returnflag
ORDER BY returnflag
"""


@plan("a19_robust_stats", oracle=ROBUST_SQL)
def a19_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics per group: median, MAD (median absolute
    deviation — the outlier-resistant spread measure a12's
    stddev/corr family lacks), and a DETERMINISTIC mode.

    MAD is inherently two-pass (deviations need the median first):
    pass 1 aggregates the per-group median (3 groups — broadcast back
    into the scan), pass 2 aggregates the deviations. Mode avoids both
    engines' native `mode()` (tie-breaking is implementation-defined)
    in favor of count-rank with an explicit (count DESC, value ASC)
    order — deterministic everywhere. At scale: two shuffles keyed on
    the group column plus one distinct-value count shuffle; exact
    medians at 100 TB swap to the KLL sketch (`a_approx_error_bound`)
    with this plan as the verification twin.

    Dup-scan note (r8 audit): the executed plan reads lineitem three
    times (median, deviation pass, mode) BY DESIGN. The med/mode legs
    aggregate different groupings of different column pairs, and the
    MAD leg cannot exist before the median — a cache/localCheckpoint
    would materialize the full working set to trade three
    column-pruned parquet scans (each reading 2 of 16 columns, with
    pushdown) for one fat one, the exact trade r7's cosine-checkpoint
    measurement showed losing."""
    from pyspark.sql import Window as W  # noqa: PLC0415

    li = load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.5)).alias(
            "med"
        )
    )
    mad = (
        li.join(F.broadcast(med), "l_returnflag")
        .select(
            "l_returnflag",
            F.abs(F.col("l_extendedprice").cast("double") - F.col("med")).alias(
                "adev"
            ),
        )
        .groupBy("l_returnflag")
        .agg(F.percentile(F.col("adev"), F.lit(0.5)).alias("mad"))
    )
    w = W.partitionBy("l_returnflag").orderBy(F.desc("c"), "l_quantity")
    mode = (
        li.groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").cast("double").alias("qty_mode"))
    )
    return (
        med.join(mad, "l_returnflag")
        .join(mode, "l_returnflag")
        .select(
            F.col("l_returnflag").alias("returnflag"),
            quantize6("med").alias("price_median"),
            quantize6("mad").alias("price_mad"),
            "qty_mode",
        )
        .orderBy("returnflag")
    )


# ---------------------------------------------------------------------------
# o6: join-key skew report — the salting-decision input
# ---------------------------------------------------------------------------


def _sql_skew_leg(key_name: str, table: str, col: str) -> str:
    return f"""
  SELECT '{key_name}' AS key_name,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_key_rows
  FROM (SELECT {col}, COUNT(*) AS cnt FROM {table} GROUP BY {col})
"""


SKEW_REPORT_SQL = f"""
WITH legs AS (
  {_sql_skew_leg("events.user_id", "events", "user_id")}
  UNION ALL
  {_sql_skew_leg("orders.o_custkey", "orders", "o_custkey")}
  UNION ALL
  {_sql_skew_leg("lineitem.l_suppkey", "lineitem", "l_suppkey")}
)
SELECT key_name, n_keys, total_rows, max_key_rows,
       {sql_quantize("CAST(max_key_rows * n_keys AS DOUBLE) / total_rows", 6)}
         AS skew_ratio,
       CAST(FLOOR((max_key_rows * n_keys + total_rows - 1) / CAST(total_rows AS DOUBLE)) AS BIGINT)
         AS recommended_salt
FROM legs
ORDER BY key_name
"""


@plan("o6_skew_report", oracle=SKEW_REPORT_SQL)
def o6_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: per candidate shuffle key, the hot-key
    ratio (max key rows ÷ mean key rows) and the salting factor that
    would level it — the observability input to the a11/j12 salting
    decision, and the shape of every pre-flight "should this join be
    salted / AQE-skew-split" check.

    Parity: counts are integers; the skew ratio is one division of
    exact integers, FLOOR-quantized; the salt factor is an integer
    ceiling computed identically (integer numerator, double division,
    FLOOR — both engines take the same path).

    Scale: one partial-aggregated groupBy per key (the count-by-key
    IS the skew probe — no second pass), then a 1-row-per-key rollup.
    At 100 TB you run this on a sample partition or reuse the shuffle
    write metrics; the operator's algebra is the same.
    """
    from compendium_spark.tables import load as _load  # noqa: PLC0415

    def leg(key_name: str, table: str, col: str) -> DataFrame:
        per_key = (
            _load(spark, sf_dir, table)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return per_key.agg(
            F.lit(key_name).alias("key_name"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_key_rows"),
        )

    legs = (
        leg("events.user_id", "events", "user_id")
        .unionAll(leg("orders.o_custkey", "orders", "o_custkey"))
        .unionAll(leg("lineitem.l_suppkey", "lineitem", "l_suppkey"))
    )
    return legs.select(
        "key_name",
        "n_keys",
        "total_rows",
        "max_key_rows",
        quantize(
            (F.col("max_key_rows") * F.col("n_keys")).cast("double")
            / F.col("total_rows"),
            6,
        ).alias("skew_ratio"),
        F.floor(
            (F.col("max_key_rows") * F.col("n_keys") + F.col("total_rows") - 1)
            / F.col("total_rows").cast("double")
        )
        .cast("long")
        .alias("recommended_salt"),
    ).orderBy("key_name")


# ---------------------------------------------------------------------------
# e_pivot_wide: long -> wide pivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

PIVOT_WIDE_SQL = f"""
SELECT user_id,
       {", ".join(
           f"CAST(COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT)"
           f" AS n_{t}" for t in _EVENT_TYPES
       )}
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@plan("e_pivot_wide", oracle=PIVOT_WIDE_SQL)
def e_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: one row per user with one count column per
    event type — the feature-matrix reshape every ML handoff needs
    (and the inverse of J4's melt). Spark's ``pivot`` with the value
    list SPELLED OUT: an unlisted pivot triggers an extra distinct
    scan to discover the values and makes the output schema
    data-dependent — never acceptable at 100 TB. With the list pinned,
    the pivot compiles to exactly the oracle's conditional aggregation
    (one scan, one shuffle, map-side partial agg)."""
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# o7: consistent-hash shard assignment
# ---------------------------------------------------------------------------

N_SHARDS = 64


def _shard_sql() -> str:
    from compendium_spark.plans.sketches import _sql_hex_to_long  # noqa: PLC0415

    hv = _sql_hex_to_long("md5(CAST(o_orderkey AS VARCHAR))", 8)
    return f"""
SELECT {hv} % {N_SHARDS} AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders
GROUP BY shard
ORDER BY shard
"""


SHARD_ASSIGN_SQL = _shard_sql()


@plan("o7_shard_assign", oracle=SHARD_ASSIGN_SQL)
def o7_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-shard assignment audit: every order routed to one of
    {N_SHARDS} shards by a stable content hash (md5 prefix — NOT the
    engine's internal partitioner, so the assignment is reproducible
    across engines, languages and re-runs — the property a writer
    needs for bucketed layouts and a router needs for sticky routing).
    Output is the per-shard occupancy report: the uniformity check
    before committing a shard count to a 100 TB layout.

    Scale: scan-stage hash + one groupBy({N_SHARDS} keys) with
    map-side combine — output rows = shard count regardless of input
    size."""
    orders = load(spark, sf_dir, "orders")
    hv = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        orders.select((hv % N_SHARDS).alias("shard"), "o_orderkey")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# o9: deterministic weighted Bernoulli sample
# ---------------------------------------------------------------------------

# p(keep) = min(1, price_cents / W_CENTS): a ~$500k order is always
# kept, a $5k order survives ~1% of the time
W_CENTS = 50_000_000


def _weighted_sample_sql() -> str:
    from compendium_spark.plans.sketches import _sql_hex_to_long  # noqa: PLC0415

    u32 = _sql_hex_to_long("md5(CAST(o_orderkey AS VARCHAR))", 8)
    return f"""
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
FROM orders
WHERE {u32} * {W_CENTS}
      < CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) * 4294967296
ORDER BY o_orderkey
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


@plan("o9_weighted_sample", oracle=WEIGHTED_SAMPLE_SQL)
def o9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each order with
    probability proportional to its value (capped at 1), decided by a
    CONTENT hash instead of an RNG — u32(md5(key))·W < price_cents·2³²
    in exact BIGINT arithmetic. The quality/importance-weighted
    downsampling every training-data pipeline runs (upweight rare
    high-value rows, thin the bulk), with the three properties RNG
    sampling lacks: reproducible across runs, engine-independent
    (hash-checked here against DuckDB), and stable under re-partitioning.

    Scale: pure scan-stage predicate — pushes into the scan, no
    shuffle at all until the presentation sort; the weight column
    never materializes. tests/test_olap_round6.py checks the realized
    rate against the expected Σp/n."""
    orders = load(spark, sf_dir, "orders")
    u32 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return (
        orders.select(
            "o_orderkey",
            cents.alias("price_cents"),
            u32.alias("u32"),
        )
        .filter(F.col("u32") * W_CENTS < F.col("price_cents") * F.lit(4294967296))
        .select("o_orderkey", "price_cents")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# o10: deterministic epoch shuffle
# ---------------------------------------------------------------------------

EPOCHS = 2
EPOCH_HEAD = 20


def _epoch_shuffle_sql() -> str:
    from compendium_spark.plans.sketches import _sql_hex_to_long  # noqa: PLC0415

    u32 = _sql_hex_to_long(
        "md5(CAST(doc_id AS STRING) || ':' || CAST(epoch AS STRING))", 8
    )
    return f"""
WITH e AS (
  SELECT doc_id, unnest(range(0, {EPOCHS})) AS epoch FROM documents
),
keyed AS (SELECT epoch, doc_id, {u32} AS ord FROM e),
ranked AS (
  SELECT epoch, doc_id, ord,
         CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                 ORDER BY ord, doc_id) AS BIGINT) AS pos
  FROM keyed
)
SELECT epoch, pos, doc_id
FROM ranked WHERE pos <= {EPOCH_HEAD}
ORDER BY epoch, pos
"""


EPOCH_SHUFFLE_SQL = _epoch_shuffle_sql()


@plan("o10_epoch_shuffle", oracle=EPOCH_SHUFFLE_SQL)
def o10_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle — the data-order leg of
    reproducible LLM training: epoch e's read order is the sort by
    u32(md5(doc_id:e)), so every run (and every engine) derives the
    IDENTICAL permutation per epoch with no RNG state to ship, and
    different epochs get independent permutations. Emitted here: the
    first {EPOCH_HEAD} positions of each of {EPOCHS} epochs (the
    verifiable prefix certificate).

    Scale: the full-order form is a range-repartition by the hash key
    + sort-within-partitions at WRITE time (no global sort ever
    materializes); the prefix certificate here plans as
    WindowGroupLimit — per-partition top-k before the single-epoch
    merge. Hash, not rand(): re-ingestion, retries and engine changes
    cannot reorder an epoch."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    e = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(EPOCHS)])).alias("epoch"),
    )
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("epoch").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("epoch").orderBy("ord", "doc_id")
    return (
        e.select("epoch", "doc_id", u32.alias("ord"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= EPOCH_HEAD)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


# ---------------------------------------------------------------------------
# o11_compaction_plan — small-files compaction planner
# ---------------------------------------------------------------------------

COMPACT_TARGET = 2048  # target output size (bytes, fixture scale)

COMPACTION_SQL = f"""
WITH files AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(length(props)) + 16 * COUNT(*) AS BIGINT) AS bytes
  FROM events GROUP BY 1
),
cum AS (
  SELECT h, bytes,
         CAST(SUM(bytes) OVER (ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_bytes
  FROM files
),
binned AS (
  SELECT h, bytes,
         CAST(FLOOR((cum_bytes - bytes) / {COMPACT_TARGET}.0) AS BIGINT)
           AS bin_id
  FROM cum
)
SELECT bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(h) AS TIMESTAMP) AS first_hour,
       CAST(MAX(h) AS TIMESTAMP) AS last_hour
FROM binned
GROUP BY bin_id
ORDER BY bin_id
"""


@plan("o11_compaction_plan", oracle=COMPACTION_SQL)
def o11_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner (round-7 addition): treat each
    event-hour as one small file (size = payload bytes + 16/row of
    row overhead — the manifest a lakehouse table keeps per file),
    assign files to target-size output bins by running-size next-fit
    (bin = floor(preceding_cum / target), the streaming assignment
    every compaction job uses), and emit the per-bin work plan. At
    100 TB the small-files problem IS an operator: metadata-only
    planning that decides which thousands of files coalesce into each
    rewrite task.

    The global ORDER BY window runs over the file MANIFEST (one row
    per file — 720 rows at sf0.01), never the data; production runs
    this per table-partition, making the window key (table,
    partition) and trivially parallel. Integer byte math end to end;
    the only division is FLOORed identically on both engines.
    """
    ev = load(spark, sf_dir, "events")
    files = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            (F.sum(F.length("props")) + 16 * F.count(F.lit(1)))
            .cast("long")
            .alias("bytes")
        )
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    binned = files.withColumn(
        "bin_id",
        F.floor(
            (F.sum("bytes").over(w) - F.col("bytes"))
            / F.lit(float(COMPACT_TARGET))
        ).cast("long"),
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("h").cast("timestamp").alias("first_hour"),
            F.max("h").cast("timestamp").alias("last_hour"),
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# o12_zonemap_prune
# ---------------------------------------------------------------------------

ZM_FILE_SPAN = 500           # orderkeys per ingest file (natural layout)
ZM_BASE_YEAR = 1995          # testdata shipdates span 1995-2001
ZM_LO, ZM_HI = "1996-03-01", "1996-05-01"   # probe: [lo, hi)

ZONEMAP_SQL = f"""
WITH tagged AS (
  SELECT l_shipdate,
         CAST(FLOOR(l_orderkey / {ZM_FILE_SPAN}.0) AS BIGINT) AS f_nat,
         CAST((EXTRACT(year FROM l_shipdate) - {ZM_BASE_YEAR}) * 12
              + EXTRACT(month FROM l_shipdate) - 1 AS BIGINT) AS f_date
  FROM lineitem
),
legs AS (
  SELECT 'bydate' AS layout, f_date AS file_id, l_shipdate FROM tagged
  UNION ALL
  SELECT 'natural', f_nat, l_shipdate FROM tagged
),
fstats AS (
  SELECT layout, file_id,
         MIN(l_shipdate) AS d0, MAX(l_shipdate) AS d1,
         COUNT(*) AS n_rows,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '{ZM_LO}'
                   AND l_shipdate <  TIMESTAMP '{ZM_HI}' THEN 1 ELSE 0 END)
           AS n_match
  FROM legs GROUP BY layout, file_id
),
agg AS (
  SELECT layout,
         CAST(COUNT(*) AS BIGINT) AS files_total,
         CAST(COUNT(CASE WHEN d0 < TIMESTAMP '{ZM_HI}'
                          AND d1 >= TIMESTAMP '{ZM_LO}' THEN 1 END) AS BIGINT)
           AS files_scanned,
         CAST(SUM(n_rows) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN d0 < TIMESTAMP '{ZM_HI}'
                        AND d1 >= TIMESTAMP '{ZM_LO}' THEN n_rows ELSE 0 END)
              AS BIGINT) AS rows_scanned,
         CAST(SUM(n_match) AS BIGINT) AS rows_matched
  FROM fstats GROUP BY layout
)
SELECT layout, files_total, files_scanned, rows_total, rows_scanned,
       rows_matched,
       {sql_quantize("CAST(rows_scanned AS DOUBLE) / CAST(rows_matched AS DOUBLE)", 6)}
         AS scan_amplification
FROM agg
ORDER BY layout
"""


@plan("o12_zonemap_prune", oracle=ZONEMAP_SQL)
def o12_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max) pruning effectiveness report — the
    row-level complement of o5_zorder_layout's bucket counting: for a
    shipdate range probe over the big fact, how many FILES does the
    footer-stats check let a scan skip, and how many ROWS does it
    still read per row it actually needs (scan_amplification), under
    (a) the natural ingest layout (files = contiguous
    ZM_FILE_SPAN-orderkey ranges; orderkey does NOT correlate with
    shipdate here, so every file's zone map spans the full date range
    and nothing prunes — amplification ~41x at sf0.01) vs (b) a
    date-partitioned layout (one file per ship-month — pruning exact
    up to month granularity, amplification 1.0). This is the measurement behind
    the "should we re-partition this table" decision at 100 TB, where
    scan_amplification IS the dollar cost of a query.

    Shape: ONE fact scan (the two layout legs come from an explode of
    a 2-struct array, not a union of scans), a slim groupBy
    (layout, file_id) producing the O(files) zone-map manifest, and a
    2-row rollup. No joins, no windows; the only float is the final
    amplification ratio, FLOOR-quantized. File counts scale with SF
    exactly as a real manifest would (span is fixed, data grows).

    Reference parity: the reference scans whole TSVs uncondition-
    ally (`data.py`); layout-aware scan planning is the lakehouse
    extension axis alongside o5/o11.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    tagged = li.select(
        "l_shipdate",
        F.floor(F.col("l_orderkey") / F.lit(float(ZM_FILE_SPAN)))
        .cast("long")
        .alias("f_nat"),
        ((F.year("l_shipdate") - ZM_BASE_YEAR) * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("f_date"),
    )
    legs = tagged.select(
        "l_shipdate",
        F.explode(
            F.array(
                F.struct(
                    F.lit("bydate").alias("layout"),
                    F.col("f_date").alias("file_id"),
                ),
                F.struct(
                    F.lit("natural").alias("layout"),
                    F.col("f_nat").alias("file_id"),
                ),
            )
        ).alias("lf"),
    ).select("l_shipdate", "lf.layout", "lf.file_id")
    lo, hi = F.lit(ZM_LO).cast("timestamp"), F.lit(ZM_HI).cast("timestamp")
    match = (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    fstats = legs.groupBy("layout", "file_id").agg(
        F.min("l_shipdate").alias("d0"),
        F.max("l_shipdate").alias("d1"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(match, 1).otherwise(0)).alias("n_match"),
    )
    scanned = (F.col("d0") < hi) & (F.col("d1") >= lo)
    return (
        fstats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.count(F.when(scanned, 1)).cast("long").alias("files_scanned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )
        .select(
            "layout",
            "files_total",
            "files_scanned",
            "rows_total",
            "rows_scanned",
            "rows_matched",
            quantize6(
                F.col("rows_scanned").cast("double")
                / F.col("rows_matched").cast("double")
            ).alias("scan_amplification"),
        )
        .orderBy("layout")
    )
