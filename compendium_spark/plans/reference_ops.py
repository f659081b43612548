"""SURVEY §2 operator inventory, re-expressed over the testdata schema.

Each plan is the Spark-first form of one operator the reference
performs (citations are ``/root/reference/<file>:<line>``), exercised
on the driver's TPC-H-ish tables so the DuckDB oracle can check it.
The reference-native table semantics (samples/tags/status/asv_*) are
additionally implemented and unit-tested in ``compendium_spark.pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load, maybe_broadcast

DEC = "decimal(18,4)"

# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------

P2_SQL = """
SELECT DISTINCT l_suppkey FROM lineitem ORDER BY l_suppkey
"""


@plan("p2_distinct_projection", oracle=P2_SQL)
def p2_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct key projection (ref `db.py:220`, SELECT DISTINCT srs).

    Scan reads ONE column (pruning); distinct is a partial-agg →
    shuffle-on-key → final-agg, so shuffle volume is O(distinct keys).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_suppkey").distinct().orderBy("l_suppkey")


P4_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
FROM lineitem
WHERE l_shipdate IS NOT NULL
  AND l_returnflag IN ('A', 'R')
  AND l_linestatus = 'F'
ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber
"""


@plan("p4_eligibility_filter", oracle=P4_SQL)
def p4_eligibility_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive eligibility filter (ref `projects.py:67-73`:
    srr IS NOT NULL AND library_source IN (...) AND strategy='AMPLICON').

    All three predicates push down to the parquet scan as one
    conjunction; no shuffle at all.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").isNotNull()
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_linestatus") == "F")
        )
        .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    )


P5_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
ORDER BY o_orderkey
"""


@plan("p5_status_set_filter", oracle=P5_SQL)
def p5_status_set_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated set-membership filter (ref `management.py:17-20`:
    WHERE status NOT IN ('done','failed'))."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )


P7_SQL = """
SELECT l_orderkey, l_linenumber, l_discount
FROM lineitem
WHERE l_discount <> 0
ORDER BY l_orderkey, l_linenumber
"""


@plan("p7_nonzero_filter", oracle=P7_SQL)
def p7_nonzero_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-cell drop (ref `projects.py:438`: melted count != 0 —
    the sparsity filter on the ASV matrix)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_discount") != 0)
        .select("l_orderkey", "l_linenumber", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

J2_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey AND l_quantity >= 49
)
ORDER BY p_partkey
"""


@plan("j2_anti_join", oracle=J2_SQL)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest dedup anti-join (ref `db.py:215-221`, `db.py:243-246`:
    preloaded key list membership → skip existing samples).

    The reference preloads keys into a Python list; the Spark-native
    form is a LEFT ANTI join against the existing-keys projection —
    Catalyst broadcasts the smaller side. The filtered right side
    (~1/3 selective on this data, non-empty at every SF) keeps the
    correctness check meaningful — an always-empty anti-join would
    pass vacuously via AQE empty-relation propagation.
    """
    part = load(spark, sf_dir, "part")
    covered = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_partkey")
    )
    return (
        part.join(covered, part.p_partkey == covered.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


J1_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
LEFT JOIN (SELECT DISTINCT user_id FROM events) e ON c.c_custkey = e.user_id
WHERE e.user_id IS NULL
ORDER BY c_custkey
"""


@plan("j1_left_join_null_filter", oracle=J1_SQL)
def j1_left_join_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + IS NULL work-queue probe (ref `db.py:483-491`:
    asv_sequences LEFT JOIN asv_inference WHERE region IS NULL —
    find rows not yet enriched). Here: customers with no event
    activity (~90% of them — a real work queue at every SF).

    Kept in the literal left-join+filter form for parity with the
    reference's SQL; Catalyst rewrites it to an anti-join anyway.
    """
    cust = load(spark, sf_dir, "customer")
    seen = load(spark, sf_dir, "events").select("user_id").distinct()
    return (
        cust.join(seen, cust.c_custkey == seen.user_id, "left")
        .filter(F.col("user_id").isNull())
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


J3_SQL = """
SELECT l.l_orderkey, l.l_linenumber, p.p_name AS part_name, s.s_name AS supp_name
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE l.l_orderkey < 100
ORDER BY l.l_orderkey, l.l_linenumber
"""


@plan("j3_key_remap_join", oracle=J3_SQL)
def j3_key_remap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key remap join (ref `projects.py:499-523`: read back
    asv_id, re-key assignments). In Spark the remap is an equi-join of
    the key dimension onto the fact, broadcast only while the
    dimension fits the budget (maybe_broadcast size gate — part and
    supplier scale with SF, so an unconditional hint would OOM at
    100 TB; beyond the gate it is a plain shuffled equi-join and AQE
    still broadcast-converts small filtered sides)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    part = maybe_broadcast(spark, sf_dir, "part")
    supp = maybe_broadcast(spark, sf_dir, "supplier")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


J7_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


@plan("j7_snowflake_dims", oracle=J7_SQL)
def j7_snowflake_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dimension joins (ref `db.py:104-117`: samples →
    geo_loc_countries → countries). Both dims broadcast — zero shuffle
    until the final tiny agg."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

A1_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) BETWEEN 5 AND 20
ORDER BY n_orders DESC, o_custkey
LIMIT 50
"""


@plan("a1_group_count_range_pick", oracle=A1_SQL)
def a1_group_count_range_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project picker (ref `management.py:105-120`: per-project sample
    counts, HAVING between lo/hi, pick N).

    The reference picks randomly (ORDER BY RANDOM()); for a
    deterministic oracle we order by (count DESC, key). The seeded-
    random variant is `o1_seeded_sample` (rows-only check).
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders").between(5, 20))
        .orderBy(F.desc("n_orders"), "o_custkey")
        .limit(50)
    )


A2_SQL = """
SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem
"""


@plan("a2_multi_count_distinct", oracle=A2_SQL)
def a2_multi_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compendium report multi-COUNT(DISTINCT) (ref
    `management.py:133-145`; Quirk Q4 fixed: count real columns).

    Spark expands multiple distinct aggs via a single `expand` +
    partial aggs — still one pass over lineitem.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


A3_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderstatus
ORDER BY n_customers DESC, o_orderstatus
"""


@plan("a3_frequency_table", oracle=A3_SQL)
def a3_frequency_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status frequency report (ref `management.py:151-156`:
    SELECT status, COUNT(DISTINCT project) ... ORDER BY 2 DESC)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy(F.desc("n_customers"), "o_orderstatus")
    )


A4_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS frac_discounted,
       CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS frac_taxed
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@plan("a4_flag_proportions", oracle=A4_SQL)
def a4_flag_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-project QC flag proportions (ref `projects.py:233-279`:
    fraction of samples with warn/error flags = mean of booleans).

    Integer SUM(flag)/COUNT keeps the division exact-input →
    bit-identical doubles across engines.
    """
    li = load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).cast("double") / n).alias(
                "frac_discounted"
            ),
            (F.sum(F.when(F.col("l_tax") > 0.04, 1).otherwise(0)).cast("double") / n).alias(
                "frac_taxed"
            ),
        )
        .orderBy("l_returnflag")
    )


A5_SQL = """
SELECT l_orderkey, COUNT(*) AS n_items
FROM lineitem
GROUP BY l_orderkey
HAVING MIN(CASE WHEN l_quantity < 30 THEN 1 ELSE 0 END) = 1
ORDER BY l_orderkey
"""


@plan("a5_all_quantifier", oracle=A5_SQL)
def a5_all_quantifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-quantifier aggregate (ref `projects.py:250-258`: a project
    is paired iff EVERY sample is paired). min(flag)=1 ≡ bool_and."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(F.when(F.col("l_quantity") < 30, 1).otherwise(0)).alias("_all_small"),
        )
        .filter(F.col("_all_small") == 1)
        .select("l_orderkey", "n_items")
        .orderBy("l_orderkey")
    )


A8_SQL = """
SELECT lang,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_len,
       CAST(FLOOR(CAST((STDDEV_SAMP(CAST(n_chars AS DOUBLE))) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS stddev_len
FROM documents
GROUP BY lang
ORDER BY lang
"""


@plan("a8_mean_stddev", oracle=A8_SQL)
def a8_mean_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stdev of lengths (ref `amplicon.py:53-56`, `amplicon.py:127`:
    ASV length statistics per project). stddev rounded to 6 dp —
    accumulation order differs across engines."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_len"),
            quantize6(F.stddev_samp(F.col("n_chars").cast("double"))).alias("stddev_len"),
        )
        .orderBy("lang")
    )


A10_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@plan("a10_last_wins_dedup", oracle=A10_SQL)
def a10_last_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins dedup (ref `db.py:248-259`: duplicate tag keys within a
    sample pass through a dict — last one wins). Spark-native form:
    ROW_NUMBER over a deterministic order, keep rn=1."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / sampling (SURVEY §2.5)
# ---------------------------------------------------------------------------

O1_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 10
"""


@plan("o1_topk", oracle=O1_SQL)
def o1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT work batching (ref `db.py:281-282`,
    `main.py:21-24`). Spark executes as TakeOrderedAndProject —
    per-partition top-K then a K-row merge on the driver, never a
    full sort."""
    cust = load(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(10)
    )


O1_SEEDED_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
LIMIT 100
"""


@plan("o1_seeded_sample", oracle=O1_SEEDED_SQL)
def o1_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY RANDOM() LIMIT n work-queue sampling (ref
    `db.py:281-282`, `management.py:118-119`). Round 8 re-form: the
    "random" order is md5 of the key instead of rand(seed) — same
    uniform-pseudo-random pick, but engine-portable and hash-gate
    verifiable (Spark's and DuckDB's rand() streams can never match;
    md5 is identical everywhere — the curate_cap_per_source idiom).
    Still executes as TakeOrderedAndProject: per-partition top-K on
    the hash order, never a full sort."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Melt / unpivot (SURVEY §2.1 T1/S5) and EAV extraction (§1.1 tags)
# ---------------------------------------------------------------------------

T1_SQL = """
SELECT p_partkey, metric, value
FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
)
WHERE value <> 0
ORDER BY p_partkey, metric
"""


@plan("t1_melt_wide_to_long", oracle=T1_SQL)
def t1_melt_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt with zero-drop (ref `projects.py:418-440`: ASV
    count matrix melt; zero filter at `projects.py:438`).

    Spark-native: built-in `unpivot` (no shuffle — row-local expand),
    then the sparsity filter.
    """
    part = load(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return (
        wide.unpivot("p_partkey", ["size", "retailprice"], "metric", "value")
        .filter(F.col("value") != 0)
        .orderBy("p_partkey", "metric")
    )


EAV_SQL = """
SELECT event_id, user_id, json_extract_string(props, '$.k') AS prop_k
FROM events
ORDER BY event_id
"""


@plan("eav_json_extract", oracle=EAV_SQL)
def eav_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAV attribute extraction (ref `db.py:246-260`: tags key/value
    rows). Here: typed extraction from a JSON props column — the
    modern form of the reference's tag dict."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.get_json_object("props", "$.k").alias("prop_k"),
        )
        .orderBy("event_id")
    )
