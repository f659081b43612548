"""Extended relational surface: scalar functions, window functions,
set operations, pivot, as-of join.

The reference needs only a handful of scalar functions (SURVEY §2.7)
and no window/set/pivot operators; these plans complete the engine's
general-purpose surface so a reference user never runs out of
operators. Every plan keeps the parity rules from registry.py.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

DEC = "decimal(18,4)"

F1_SQL = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       substr(p_type, 1, 4) AS type_prefix,
       concat(p_brand, ';', p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_underscored,
       length(p_name) AS name_len,
       CAST(p_size AS BIGINT) AS size_long,
       printf('%d%%', CAST(p_size AS INT)) AS size_pct,
       round(CAST(p_retailprice AS DECIMAL(18,4)) * 1.1, 2) AS marked_up
FROM part
ORDER BY p_partkey
"""


@plan("f_scalar_functions", oracle=F1_SQL)
def f_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface (SURVEY §2.7 F1-F11): lower (F1),
    join/concat (F2), substring strip (F3), casts (F4), percent
    formatting (F8, ref `projects.py:285-311`), arithmetic with exact
    decimal rounding. All codegen'd, zero shuffle."""
    part = load(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_type", 1, 4).alias("type_prefix"),
            F.concat(F.col("p_brand"), F.lit(";"), F.col("p_type")).alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_underscored"),
            F.length("p_name").alias("name_len"),
            F.col("p_size").cast("long").alias("size_long"),
            F.format_string("%d%%", F.col("p_size").cast("int")).alias("size_pct"),
            F.round(F.col("p_retailprice").cast(DEC) * F.lit("1.1").cast(DEC), 2)
            .cast("double")
            .alias("marked_up"),
        )
        .orderBy("p_partkey")
    )


F9_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       CAST(epoch_us(o_orderdate) / 1000000 AS BIGINT) AS epoch_sec,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@plan("f_date_functions", oracle=F9_SQL)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp/date surface (F9, ref `main.py:128`, `db.py:290-301`):
    date truncation, parts extraction, epoch seconds, formatting."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 1_000_000)
            .cast("bigint")
            .alias("epoch_sec"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        )
        .orderBy("o_orderkey")
    )


W4_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
              OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
ORDER BY o_custkey, order_seq
"""


@plan("w4_running_sum", oracle=W4_SQL)
def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-customer running spend + order sequence.
    One shuffle on the partition key; decimal cumsum is exact at any
    prefix so both engines agree row-by-row."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(DEC))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


W5_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
WHERE rank <= 3
ORDER BY o_custkey, rank
"""


@plan("w5_topk_per_group", oracle=W5_SQL)
def w5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical window pattern. At scale,
    Spark pushes a per-partition partial top-K under AQE before the
    shuffle (WindowGroupLimit), so the shuffle carries ≤K rows per
    group per partition, not the full table."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
        .orderBy("o_custkey", "rank")
    )


SETOPS_SQL = """
SELECT 'building_or_machinery' AS op, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
UNION ALL
SELECT 'rich_and_building', c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
UNION ALL
SELECT 'rich_not_building', c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
ORDER BY op, c_custkey
"""


@plan("s_set_operations", oracle=SETOPS_SQL)
def s_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.6 — absent in the reference, provided
    for surface completeness): UNION (distinct), INTERSECT, EXCEPT."""
    cust = load(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    u = building.union(machinery).distinct().withColumn("op", F.lit("building_or_machinery"))
    i = rich.intersect(building).withColumn("op", F.lit("rich_and_building"))
    e = rich.exceptAll(building).distinct().withColumn("op", F.lit("rich_not_building"))
    return u.unionByName(i).unionByName(e).select("op", "c_custkey").orderBy("op", "c_custkey")


PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@plan("t2_pivot", oracle=PIVOT_SQL)
def t2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot — the inverse of the reference's melt (T1).
    Explicit pivot values keep the plan single-pass (no value-discovery
    scan)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
        .orderBy("l_returnflag")
    )


ASOF_SQL = """
SELECT e.event_id, e.user_id, e.ts, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
"""


@plan("j8_asof_join", oracle=ASOF_SQL)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark lacks natively, composed from
    built-ins (guide: union + conditional last_value): tag both
    streams, union, per-user running last-click-timestamp, keep error
    rows. One shuffle on user_id; no range explosion.

    DuckDB's native ASOF JOIN is the oracle — matching it proves the
    composition implements the canonical semantics.
    """
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # clicks sort before errors at identical ts so an equal-ts click is
    # visible to the error row (ASOF >= semantics)
    order = Window.partitionBy("user_id").orderBy(
        "ts", F.when(F.col("event_type") == "click", 0).otherwise(1)
    )
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    return (
        tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(run))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


POSEXPLODE_SQL = """
SELECT vec_id, p.p AS pos, CAST(FLOOR(CAST((CAST(embedding[p.p + 1] AS DOUBLE)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS val
FROM embeddings, (SELECT unnest(range(4)) AS p) p
WHERE vec_id < 20
ORDER BY vec_id, pos
"""


@plan("e_array_positional", oracle=POSEXPLODE_SQL)
def e_array_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array positional access (first 4 dims per vector) — the
    element_at/posexplode surface used by every embedding operator."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    pos = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("pos")
    return (
        emb.select("vec_id", pos, "embedding")
        .select(
            "vec_id",
            "pos",
            quantize6(F.element_at("embedding", F.col("pos") + 1).cast("double")).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


W6_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,4))
            - lag(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS DOUBLE) AS spend_delta,
       strftime(lead(o_orderdate)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                '%Y-%m-%d') AS next_order_date
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@plan("w6_lag_lead_delta", oracle=W6_SQL)
def w6_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset window functions: per-customer order-to-order spend delta
    (lag) and next order date (lead). One shuffle on the partition
    key; decimal differences are exact so both engines agree on every
    row including the NULL frame edges."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast(DEC)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            (price - F.lag(price).over(w)).cast("double").alias("spend_delta"),
            F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias(
                "next_order_date"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


A12_SQL = """
SELECT l_returnflag,
       CAST(FLOOR(CAST((var_samp(l_quantity)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS qty_var,
       CAST(FLOOR(CAST((stddev_samp(l_discount)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS disc_stddev,
       CAST(FLOOR(CAST((corr(l_quantity, l_discount)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS qty_disc_corr,
       CAST(FLOOR(CAST((covar_samp(l_quantity, l_tax)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS qty_tax_covar
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@plan("a12_stats_moments", oracle=A12_SQL)
def a12_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (variance / stddev / correlation /
    covariance) — single hash-agg pass, map-side partial moment
    sketches. Computed over small-ranged columns and rounded to 6 dp
    so both engines' accumulation orders agree (large-magnitude
    columns would need relative-error comparison instead)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            quantize6(F.var_samp("l_quantity")).alias("qty_var"),
            quantize6(F.stddev_samp("l_discount")).alias("disc_stddev"),
            quantize6(F.corr("l_quantity", "l_discount")).alias("qty_disc_corr"),
            quantize6(F.covar_samp("l_quantity", "l_tax")).alias("qty_tax_covar"),
        )
        .orderBy("l_returnflag")
    )


J11_SQL = """
SELECT coalesce(c.c_custkey, e.user_id) AS entity_id,
       c.c_custkey IS NOT NULL AS is_customer,
       e.user_id IS NOT NULL AS has_events,
       coalesce(e.n_events, 0) AS n_events
FROM customer c
FULL OUTER JOIN (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
) e ON c.c_custkey = e.user_id
ORDER BY entity_id
"""


@plan("j11_full_outer_join", oracle=J11_SQL)
def j11_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the reconciliation shape (rows from either
    side survive): customer dimension vs observed event actors. Full
    outer can never broadcast (both sides must keep unmatched rows),
    so it shuffles both sides on the key — at scale, make sure the
    aggregated side is pre-shrunk like here (one row per user, not one
    per event)."""
    cust = load(spark, sf_dir, "customer")
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        cust.join(ev, cust.c_custkey == ev.user_id, "full_outer")
        .select(
            F.coalesce("c_custkey", "user_id").alias("entity_id"),
            F.col("c_custkey").isNotNull().alias("is_customer"),
            F.col("user_id").isNotNull().alias("has_events"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("entity_id")
    )


W7_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4)))
              OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS value_10min
FROM events
ORDER BY user_id, epoch_us(ts), event_id
"""


@plan("w7_range_frame", oracle=W7_SQL)
def w7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event time: per-user rolling 10-minute
    value sum — every event sees the true trailing window, unlike a
    ROWS frame (w4) which sees a fixed row count. The streaming
    counterpart is the watermarked sliding window (w2); this is the
    batch/backfill form. One shuffle on user_id; decimal partial sums
    keep any frame prefix exact."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-600_000_000, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias(
                "value_10min"
            ),
            us.alias("_us"),
        )
        .orderBy("user_id", "_us", "event_id")
        .drop("_us")
    )


J10_SQL = """
SELECT a.event_id AS event_id,
       COUNT(b.ts) AS follow_clicks
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id
 AND b.event_type = 'click'
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
WHERE a.event_type = 'view'
GROUP BY a.event_id
ORDER BY event_id
"""


@plan("j10_range_join", oracle=J10_SQL)
def j10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join — clicks following each view within 5 minutes,
    per user. Another operator Spark has no native form for (a bare
    inequality join degenerates to a per-user nested loop).

    Scale path: bucket both sides into range-width (300 s) time bins
    and equi-join on (user_id, bucket). A (ts, ts+300s] window spans
    at most two bins, so the probe side expands exactly 2× (an
    explode of two candidate buckets) and the join stays hash/SMJ on
    a compound key — candidate pairs are O(events × density), never
    O(per-user²). The residual exact range predicate filters
    post-probe. LEFT semantics survive because each click lands in
    exactly one bin: unmatched probes keep their two null rows and
    COUNT(b.ts) ignores them.
    """
    ev = load(spark, sf_dir, "events")
    width = 300_000_000  # 5 min in µs == bucket width
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "event_id",
            F.col("user_id").alias("a_user"),
            F.unix_micros("ts").alias("a_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.col("a_us") / width),
                    F.floor(F.col("a_us") / width) + 1,
                )
            ),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("b_user"),
        F.unix_micros("ts").alias("b_us"),
        F.floor(F.unix_micros("ts") / width).alias("bucket"),
    )
    joined = views.join(
        clicks,
        (F.col("a_user") == F.col("b_user"))
        & (views.bucket == clicks.bucket)
        & (F.col("b_us") > F.col("a_us"))
        & (F.col("b_us") <= F.col("a_us") + width),
        "left",
    )
    return (
        joined.groupBy("event_id")
        .agg(F.count("b_us").alias("follow_clicks"))
        .orderBy("event_id")
    )


GSETS_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY returnflag, linestatus
"""


@plan("a_grouping_sets", oracle=GSETS_SQL)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit non-hierarchical GROUPING SETS — two independent
    one-column groupings in a single pass (neither ROLLUP nor CUBE
    expresses this set list). Spark's Expand node duplicates each
    input row once per set before one hash aggregate: one scan, one
    shuffle, vs the two-scan UNION ALL a naive engine would run.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(GSETS_SQL)


JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) FILTER (CAST(props->>'k' AS BIGINT) > 50) AS big_k,
       COUNT(*) FILTER (props->>'k' IS NULL) AS bad_rows
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@plan("f_json_extract", oracle=JSON_SQL)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` payload with
    a declared schema (`from_json` — JVM-side Jackson, stays inside
    codegen; never a Python UDF) and aggregate on the extracted field.
    Malformed/missing keys become NULLs counted in `bad_rows` rather
    than failing the job — the posture a 100 TB ingest needs. At scale
    the parse happens in the map stage, so only (event_type, partial
    sums) shuffle.
    """
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("big_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("bad_rows"),
        )
        .orderBy("event_type")
    )


J12_SQL = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY segment
ORDER BY segment
"""

N_SALT = 8


@plan("j12_salted_skew_join", oracle=J12_SQL)
def j12_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join: events.user_id is zipf-hot, so a
    plain shuffle join puts a hot key's every row in one task. Salting
    splits each key {N_SALT} ways: the fact side gets a deterministic
    salt from its row id, the dim side replicates each row across all
    salts, and the join key becomes (key, salt) — hot keys now spread
    over {N_SALT} tasks. Result is value-identical to the plain join
    (oracle), just differently partitioned. This is the manual form of
    what AQE skew-join does for sort-merge joins at runtime; salting
    also covers the hash-agg case AQE doesn't (see
    a11_salted_twostage_agg).
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALT))
    )
    cust = load(spark, sf_dir, "customer")
    salted_dim = cust.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    return (
        ev.join(
            salted_dim,
            (ev.user_id == salted_dim.c_custkey) & (ev.salt == salted_dim.salt),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("segment")
    )


A15_SQL = """
SELECT c_nationkey,
       m.bal AS top_acctbal,
       m.key AS top_custkey,
       m.nm  AS top_name
FROM (
  SELECT c_nationkey,
         MAX(struct_pack(bal := c_acctbal, key := c_custkey, nm := c_name)) AS m
  FROM customer
  GROUP BY c_nationkey
) t
ORDER BY c_nationkey
"""


@plan("a15_argmax", oracle=A15_SQL)
def a15_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax: the top-balance customer per nation in
    ONE aggregation — max over a (value, tie-break key, payload)
    struct, whose lexicographic ordering both engines share. Unlike
    `max_by` (tie-nondeterministic) or a row_number window (full sort
    + shuffle of every row), struct-max combines map-side: each
    partition contributes one candidate struct per group, so shuffle
    volume is O(groups × partitions) — the same reason w5_topk keeps
    a heap, specialized to k=1.
    """
    cust = load(spark, sf_dir, "customer")
    m = F.max(
        F.struct(
            F.col("c_acctbal").alias("bal"),
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("nm"),
        )
    )
    return (
        cust.groupBy("c_nationkey")
        .agg(m.alias("m"))
        .select(
            "c_nationkey",
            F.col("m.bal").alias("top_acctbal"),
            F.col("m.key").alias("top_custkey"),
            F.col("m.nm").alias("top_name"),
        )
        .orderBy("c_nationkey")
    )


W8_SQL = """
SELECT doc_id, n_chars, quartile
FROM (
  SELECT doc_id, n_chars,
         NTILE(4) OVER (ORDER BY n_chars, doc_id) AS quartile
  FROM documents
) t
ORDER BY doc_id
"""


@plan("w8_ntile_bands", oracle=W8_SQL)
def w8_ntile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE banding — length quartiles over the corpus (the
    typical quality-stratification step before sampling). The
    (n_chars, doc_id) ordering is total, so tile assignment is
    deterministic across engines.

    Scale note: an unpartitioned NTILE forces a single-task sort — at
    100 TB you'd band via pre-computed quantile cut points broadcast
    against the scan (a13_exact_quantiles / a_approx_error_bound give
    the cut points); this plan is the small-dimension/per-group form.
    """
    docs = load(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        docs.select("doc_id", "n_chars", F.ntile(4).over(w).alias("quartile"))
        .orderBy("doc_id")
    )


@plan("w8_ntile_bands_scaled", oracle=W8_SQL)
def w8_ntile_bands_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE banding, 100 TB form: broadcast cut points, no global sort.

    Produces byte-identical quartiles to w8_ntile_bands (same oracle)
    without ever funneling the table through one task. Because the
    NTILE ordering (n_chars, doc_id) is a total order, tile membership
    is exactly "rank vs three boundary ranks", and each boundary rank
    resolves to a concrete (n_chars, doc_id) cut pair:

      1. histogram of the band column, one map-combinable groupBy,
         then a cumulative sum over the (distinct-value-sized)
         histogram — executor-side; the single-ordering window runs
         over the histogram frame, never the corpus;
      2. the driver collects EXACTLY the three boundary rows (one
         filter per boundary rank on the cumulative frame) — r10
         advice: the previous form collected the whole histogram,
         a driver structure that grows with column cardinality;
      3. for a boundary inside a value's run, one k-th-smallest lookup
         over just that value's doc_ids (filter pushed to the scan,
         run-bounded TakeOrdered);
      4. band assignment is then a pure scan-stage expression: tile =
         1 + #cuts strictly below the row. No shuffle, no sort, no
         window over the data.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n_rows = docs.count()
    base, rem = divmod(n_rows, 4)
    ends, acc = [], 0
    for i in range(1, 4):
        acc += base + (1 if i <= rem else 0)
        ends.append(acc)

    hist = docs.groupBy("n_chars").count()
    cum = hist.withColumn(
        "cum", F.sum("count").over(Window.orderBy("n_chars"))
    )
    boundary = cum.filter(
        functools.reduce(
            lambda a, b: a | b,
            [
                (F.col("cum") >= e) & (F.col("cum") - F.col("count") < e)
                for e in ends
            ],
        )
    ).collect()  # ≤3 rows: the values the boundary ranks land in
    by_val = sorted((r["n_chars"], r["count"], r["cum"]) for r in boundary)

    cuts: list[tuple[int, int | None]] = []
    for end in ends:
        v, cnt, c = next(
            (v, cnt, c) for v, cnt, c in by_val if c >= end > c - cnt
        )
        k = end - (c - cnt)
        if k == cnt:
            cuts.append((v, None))  # boundary aligns with end of value run
        else:
            kth = (
                docs.filter(F.col("n_chars") == v)
                .orderBy("doc_id")
                .limit(k)
                .agg(F.max("doc_id"))
                .first()[0]
            )
            cuts.append((v, kth))

    tile = F.lit(1)
    for v, d in cuts:
        below = (
            (F.col("n_chars") > v)
            if d is None
            else (F.col("n_chars") > v)
            | ((F.col("n_chars") == v) & (F.col("doc_id") > d))
        )
        tile = tile + F.when(below, 1).otherwise(0)
    return docs.select("doc_id", "n_chars", tile.alias("quartile")).orderBy("doc_id")


J13_SQL = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM n a
JOIN n b
  ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND a.p_name < b.p_name
 AND levenshtein(a.p_name, b.p_name) <= 2
ORDER BY name_a, name_b
"""


@plan("j13_blocked_fuzzy_join", oracle=J13_SQL)
def j13_blocked_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching — the entity-resolution join shape:
    candidate pairs come from an EQUI-join on a blocking key (here the
    name's noun), and the expensive edit-distance predicate runs only
    within blocks. Never pairwise over the corpus: at 100 TB the
    all-pairs levenshtein is quadratic death, while blocking keeps it
    O(sum of block² over distinct keys) — the same
    candidates-not-pairs argument as the MinHash-LSH dedup family.
    Both engines share levenshtein's exact integer semantics, so the
    pair set is hash-checked, not approximated."""
    names = (
        load(spark, sf_dir, "part").select("p_name").distinct()
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.split(F.col("p_name"), " ").getItem(1).alias("block_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.split(F.col("p_name"), " ").getItem(1).alias("block_b"),
    )
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b"))
            & (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= 2),
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
        .orderBy("name_a", "name_b")
    )


W9_SQL = """
SELECT c_custkey,
       c_nationkey,
       CAST(FLOOR(CAST((percent_rank() OVER w) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS bal_pct_rank,
       CAST(FLOOR(CAST((cume_dist() OVER w) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS bal_cume_dist,
       ntile(10) OVER w AS decile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@plan("w9_rank_distributions", oracle=W9_SQL)
def w9_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution window functions: percent_rank, cume_dist,
    and per-partition deciles over customer balances within each
    nation. All rank-based (exact rational values — (rank-1)/(n-1)
    and rank/n compute identically in both engines; ROUND(6) only
    guards the double formatting). One shuffle on the partition key;
    the (c_acctbal, c_custkey) ordering is total so every rank is
    deterministic."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            quantize6(F.percent_rank().over(w)).alias("bal_pct_rank"),
            quantize6(F.cume_dist().over(w)).alias("bal_cume_dist"),
            F.ntile(10).over(w).alias("decile"),
        )
        .orderBy("c_custkey")
    )


J14_SQL = """
WITH a AS (
  SELECT event_id AS a_id, user_id,
         epoch_us(ts) AS a_start, epoch_us(ts) + 600000000 AS a_end
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT event_id AS b_id, user_id,
         epoch_us(ts) AS b_start, epoch_us(ts) + 600000000 AS b_end
  FROM events WHERE event_type = 'click'
)
SELECT a.a_id, b.b_id
FROM a JOIN b
  ON a.user_id = b.user_id
 AND a.a_start < b.b_end
 AND b.b_start < a.a_end
ORDER BY a_id, b_id
"""

_IVAL_US = 600_000_000  # each event owns a 10-minute interval


@plan("j14_interval_overlap_join", oracle=J14_SQL)
def j14_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: both sides are INTERVALS (each view/click
    owns [ts, ts+10min)) and a pair matches when the intervals overlap
    — the genomics/session-span cousin of j10's point-in-range join,
    and another operator a bare Spark inequality join degenerates to a
    nested loop on.

    Scale path: bin both interval sets into interval-width time bins;
    an interval spans at most 2 bins, so BOTH sides explode exactly
    2x and the join is a hash equi-join on (user_id, bin). Overlapping
    intervals always share >= 1 bin (overlap length > 0 inside a bin
    boundary or across it — with bin = interval width, any overlap
    includes one of the two bins each side covers), and a pair sharing
    both bins would duplicate, so the exact overlap predicate filters
    the residual and distinct() collapses double-bin matches.
    Candidate pairs are O(events x density per bin), never
    O(per-user^2).
    """
    ev = load(spark, sf_dir, "events")

    def side(event_type: str, prefix: str) -> DataFrame:
        us = F.unix_micros("ts")
        return (
            ev.filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                us.alias(f"{prefix}_start"),
                (us + _IVAL_US).alias(f"{prefix}_end"),
            )
            .withColumn(
                "bin",
                F.explode(
                    F.array_distinct(
                        F.array(
                            F.floor(F.col(f"{prefix}_start") / _IVAL_US),
                            F.floor((F.col(f"{prefix}_end") - 1) / _IVAL_US),
                        )
                    )
                ),
            )
        )

    a = side("view", "a")
    b = side("click", "b")
    return (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (a.bin == b.bin)
            & (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end")),
        )
        .select("a_id", "b_id")
        .distinct()
        .orderBy("a_id", "b_id")
    )
