"""Data-quality expectations report — the Deequ-lite surface
(operators/expectations.py) as an oracle-checked plan.

Nine checks over orders + lineitem, compiled into ONE aggregate pass
per table plus one keyed join for the foreign-key check; the report is
a tidy (check_name, n_checked, n_violations, passed) frame. On clean
TPC-H-shaped data every check passes — which is itself the point: the
oracle recomputes each count independently, so a hash match proves
the compiled aggregate expressions measure exactly what the SQL
definitions say. Parity is trivial (pure integer counts + booleans).

Scale: the N row-level checks share one scan with map-side partial
aggregation (cost ~ one count(*) regardless of N); uniqueness rides
the same pass as count vs count_distinct; the referential check is
the only second table touch — a keyed left join counted with a
conditional aggregate, broadcast when the parent fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.operators.expectations import (
    check,
    in_range,
    in_set,
    not_null,
    satisfies,
    unique,
)
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load, spread_parts

DQ_SQL = """
WITH o AS (
  SELECT 'in_range(o_totalprice)' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'in_set(o_orderstatus)',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         OR o_orderstatus IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'not_null(o_custkey)',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'unique(o_orderkey)',
         CAST(COUNT(o_orderkey) AS BIGINT),
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
),
l AS (
  SELECT 'in_range(l_quantity)' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         OR l_quantity IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM lineitem
  UNION ALL
  SELECT 'in_range(l_discount)',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         OR l_discount IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'shipdate_plausible',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN NOT COALESCE(
                         l_shipdate BETWEEN DATE '1970-01-01'
                                        AND DATE '2100-01-01', FALSE)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'not_null(l_orderkey)',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
),
fk AS (
  SELECT 'referential(l_orderkey->o_orderkey)' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations
  FROM lineitem li
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON li.l_orderkey = o.o_orderkey
),
rep AS (
  SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM fk
)
SELECT check_name, n_checked, n_violations,
       n_violations = 0 AS passed
FROM rep
ORDER BY check_name
"""


@plan("dq_expectations_report", oracle=DQ_SQL)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nine declarative expectations compiled into two single-pass
    aggregates + one keyed FK join (see module docstring).

    Dup-scan note (r8 audit): each table is read twice BY DESIGN —
    once for the compiled row-level aggregate (all columns the checks
    touch) and once for the FK legs (a single key column each). The
    second scans are single-column pruned parquet reads; folding the
    FK join into the row-level pass would instead make every cheap
    scan-stage check pay the join's shuffle/build cost at scale, and
    caching the tables to "share" the scan materializes the full
    width for what pushdown reads nearly for free."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o_rep = check(
        orders,
        [
            in_range("o_totalprice", 0, None),
            in_set("o_orderstatus", ["O", "F", "P"]),
            not_null("o_custkey"),
            unique("o_orderkey"),
        ],
    )
    l_rep = check(
        li,
        [
            in_range("l_quantity", 1, 50),
            in_range("l_discount", 0, 0.1),
            satisfies(
                "l_shipdate BETWEEN DATE '1970-01-01' AND DATE '2100-01-01'",
                "shipdate_plausible",
            ),
            not_null("l_orderkey"),
        ],
    )
    keys = orders.select(F.col("o_orderkey")).distinct()
    fk = (
        li.select("l_orderkey")
        .join(keys, li["l_orderkey"] == keys["o_orderkey"], "left")
        .agg(
            F.lit("referential(l_orderkey->o_orderkey)").alias("check_name"),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
        )
        .select(
            "check_name",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
    return o_rep.unionByName(l_rep).unionByName(fk).orderBy("check_name")


# ---------------------------------------------------------------------------
# dq_snapshot_drift: two-cohort profile drift in one scan
# ---------------------------------------------------------------------------

DRIFT_SQL = """
WITH agg AS (
  SELECT
    CAST(COUNT(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS BIGINT) AS rows_a,
    CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT) AS rows_b,
    CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END) AS BIGINT) AS cust_a,
    CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 1 THEN o_custkey END) AS BIGINT) AS cust_b,
    CAST(SUM(CASE WHEN o_orderkey % 2 = 0
             THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS cents_a,
    CAST(SUM(CASE WHEN o_orderkey % 2 = 1
             THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS cents_b,
    CAST(COUNT(CASE WHEN o_orderkey % 2 = 0 AND o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS open_a,
    CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 AND o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS open_b
  FROM orders
),
rep AS (
  SELECT 'n_rows' AS metric, rows_a AS snap_a, rows_b AS snap_b FROM agg
  UNION ALL SELECT 'n_distinct_cust', cust_a, cust_b FROM agg
  UNION ALL SELECT 'sum_price_cents', cents_a, cents_b FROM agg
  UNION ALL SELECT 'n_status_open', open_a, open_b FROM agg
)
SELECT metric, snap_a, snap_b,
       CAST(FLOOR(ABS(snap_a - snap_b)
            / CAST(GREATEST(snap_a, snap_b, 1) AS DOUBLE)
            * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS rel_delta
FROM rep
ORDER BY metric
"""


@plan("dq_snapshot_drift", oracle=DRIFT_SQL)
def dq_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile drift between two table snapshots (orderkey parity
    stands in for yesterday/today): row count, key cardinality, value
    mass and a category share, compared side by side with a relative
    delta — the ingest-gate companion to dq_expectations_report
    (expectations catch BROKEN data; drift catches silently CHANGED
    data: a feed that halves, a status mix that flips).

    Scale: both cohorts and all four metrics ride ONE conditional-
    aggregation scan (the expectations.check discipline); the tidy
    report is pivoted from the 1-row aggregate with inline(), never
    re-referencing the source. All-integer metrics; the only float is
    the final relative delta, FLOOR-quantized."""
    orders = load(spark, sf_dir, "orders")
    a = F.col("o_orderkey") % 2 == 0
    b = F.col("o_orderkey") % 2 == 1
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    agg = orders.agg(
        F.count(F.when(a, 1)).cast("long").alias("rows_a"),
        F.count(F.when(b, 1)).cast("long").alias("rows_b"),
        F.count_distinct(F.when(a, F.col("o_custkey"))).cast("long").alias("cust_a"),
        F.count_distinct(F.when(b, F.col("o_custkey"))).cast("long").alias("cust_b"),
        F.sum(F.when(a, cents)).cast("long").alias("cents_a"),
        F.sum(F.when(b, cents)).cast("long").alias("cents_b"),
        F.count(F.when(a & (F.col("o_orderstatus") == "O"), 1))
        .cast("long")
        .alias("open_a"),
        F.count(F.when(b & (F.col("o_orderstatus") == "O"), 1))
        .cast("long")
        .alias("open_b"),
    )
    structs = [
        F.struct(
            F.lit(name).alias("metric"),
            F.col(ca).alias("snap_a"),
            F.col(cb).alias("snap_b"),
        )
        for name, ca, cb in [
            ("n_rows", "rows_a", "rows_b"),
            ("n_distinct_cust", "cust_a", "cust_b"),
            ("sum_price_cents", "cents_a", "cents_b"),
            ("n_status_open", "open_a", "open_b"),
        ]
    ]
    rep = agg.select(F.inline(F.array(*structs)))
    rel = F.abs(F.col("snap_a") - F.col("snap_b")) / F.greatest(
        "snap_a", "snap_b", F.lit(1)
    ).cast("double")
    return rep.select(
        "metric",
        "snap_a",
        "snap_b",
        (F.floor(rel * 1000000.0 + 0.5).cast("long") / 1000000.0).alias(
            "rel_delta"
        ),
    ).orderBy("metric")


# ---------------------------------------------------------------------------
# dq_schema_profile — per-column table profile (round 8)
# ---------------------------------------------------------------------------

PROFILE_SQL = """
SELECT 'event_id' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(FLOOR(CAST(MIN(event_id) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS min_num,
       CAST(FLOOR(CAST(MAX(event_id) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS max_num,
       CAST(NULL AS VARCHAR) AS min_txt, CAST(NULL AS VARCHAR) AS max_txt,
       CAST(NULL AS TIMESTAMP) AS min_ts, CAST(NULL AS TIMESTAMP) AS max_ts
FROM events
UNION ALL
SELECT 'ts', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT ts) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       MIN(ts), MAX(ts)
FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT user_id) AS BIGINT),
       CAST(FLOOR(CAST(MIN(user_id) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0,
       CAST(FLOOR(CAST(MAX(user_id) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0,
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
FROM events
UNION ALL
SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT event_type) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       MIN(event_type), MAX(event_type),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
FROM events
UNION ALL
SELECT 'value', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT value) AS BIGINT),
       CAST(FLOOR(CAST(MIN(value) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0,
       CAST(FLOOR(CAST(MAX(value) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0,
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
FROM events
UNION ALL
SELECT 'props', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT props) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       MIN(props), MAX(props),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
FROM events
ORDER BY col_name
"""


def _q6(col):
    return (
        F.floor(col.cast("double") * 1000000.0 + 0.5).cast("long") / 1000000.0
    )


@plan("dq_schema_profile", oracle=PROFILE_SQL)
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile over `events` — the ANALYZE-TABLE /
    Deequ-profiler surface: row count, null count, exact distinct
    count, and typed min/max per column (numeric columns fill
    min_num/max_num, strings min_txt/max_txt, timestamps
    min_ts/max_ts). dq_expectations_report checks ASSERTIONS you
    already know; the profile is how you learn what to assert.

    Shape: ONE scan — every column's null/min/max stats compile into
    a single aggregate pass (the oracle's UNION-of-scans form is the
    readable spec, not the plan); the 1-row aggregate pivots to
    per-column rows with inline(array(struct(...))) (never
    union-of-selects — the r6 dup-scan rule). The six exact
    count-distincts expand the stream 6× before the partial agg
    (Spark's multi-distinct EXPAND) — exact is kept because the
    DuckDB oracle hash-checks it; the production profiler swaps in
    approx_count_distinct (one pass, no expand, the a20_hll_sketch
    path) when |table| makes exact distinct a shuffle bottleneck.

    The repartition spreads the EXPAND's map work off the testdata's
    single parquet split (measured 1.80 -> 0.77 s at sf0.1; every
    aggregate here is order-insensitive, so parity is unaffected); at
    100 TB the source has thousands of splits and the repartition
    becomes a no-op to remove — the _doc_shingles rule.
    """
    parts = spread_parts(spark, sf_dir, "events")
    ev = load(spark, sf_dir, "events")
    if parts:
        ev = ev.repartition(parts)
    nulls = {
        c: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .cast("long")
        .alias(f"nulls_{c}")
        for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
    }
    agg = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *nulls.values(),
        *[
            F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}")
            for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ],
        _q6(F.min("event_id")).alias("min_event_id"),
        _q6(F.max("event_id")).alias("max_event_id"),
        _q6(F.min("user_id")).alias("min_user_id"),
        _q6(F.max("user_id")).alias("max_user_id"),
        _q6(F.min("value")).alias("min_value"),
        _q6(F.max("value")).alias("max_value"),
        F.min("event_type").alias("min_event_type"),
        F.max("event_type").alias("max_event_type"),
        F.min("props").alias("min_props"),
        F.max("props").alias("max_props"),
        F.min("ts").alias("min_ts_v"),
        F.max("ts").alias("max_ts_v"),
    )
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_t = F.lit(None).cast("timestamp")

    def row(name, min_num, max_num, min_txt, max_txt, min_ts, max_ts):
        return F.struct(
            F.lit(name).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"nulls_{name}").alias("n_nulls"),
            F.col(f"nd_{name}").alias("n_distinct"),
            min_num.alias("min_num"),
            max_num.alias("max_num"),
            min_txt.alias("min_txt"),
            max_txt.alias("max_txt"),
            min_ts.alias("min_ts"),
            max_ts.alias("max_ts"),
        )

    structs = [
        row("event_id", F.col("min_event_id"), F.col("max_event_id"),
            null_s, null_s, null_t, null_t),
        row("ts", null_d, null_d, null_s, null_s,
            F.col("min_ts_v"), F.col("max_ts_v")),
        row("user_id", F.col("min_user_id"), F.col("max_user_id"),
            null_s, null_s, null_t, null_t),
        row("event_type", null_d, null_d,
            F.col("min_event_type"), F.col("max_event_type"), null_t, null_t),
        row("value", F.col("min_value"), F.col("max_value"),
            null_s, null_s, null_t, null_t),
        row("props", null_d, null_d,
            F.col("min_props"), F.col("max_props"), null_t, null_t),
    ]
    return agg.select(F.inline(F.array(*structs))).orderBy("col_name")
