"""Second wave of TPC-H-shaped plans: subquery decorrelation shapes.

The reference delegates every relational query to SQLite literal SQL
(`db.py:31-83`); its join/agg inventory (SURVEY §2.3-2.4) never needs a
correlated subquery. These plans extend the engine's surface with the
classic decorrelation shapes a warehouse workload hits constantly —
EXISTS semi-joins with non-equi conditions, aggregate-then-rejoin,
scalar-subquery broadcast, disjunctive pushdown — each expressed as the
DataFrame program Catalyst plans best, with the subquery form as the
DuckDB oracle.

Scale notes (100 TB): every shape here either (a) keeps the fact table
shuffling on exactly one key, (b) turns a correlated per-group subquery
into one partial-agg + join on the same key (no second scan pass), or
(c) broadcasts a 1-row scalar instead of collecting to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.plans.registry import plan
from compendium_spark.tables import load, maybe_broadcast

DEC = "decimal(18,4)"


def _dec(c: str):
    return F.col(c).cast(DEC)


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@plan("q4_order_priority", oracle=Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a non-equi correlated predicate
    (lineitem shipped >30 days after order date) → priority counts.

    Spark form: LEFT SEMI join on the equi key with the date predicate
    as an extra join condition — stays a hash/sort-merge semi join on
    orderkey (the non-equi part is evaluated post-probe), never a
    nested loop. Both facts shuffle once on orderkey.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q10_SQL = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@plan("q10_returned_items", oracle=Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers who returned
    items in a quarter.

    The quarter filter pushes into the orders scan and l_returnflag='R'
    into lineitem before either shuffles; nation broadcasts; top-20 via
    TakeOrderedAndProject (no full sort of the aggregate).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@plan("q13_customer_distribution", oracle=Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter
    (priority excluded *inside* the join, so excluded-only customers
    still count as 0), per-customer order counts, then a histogram of
    those counts.

    Two aggs: the first shuffles on custkey (same key as the join —
    one exchange serves both), the second groups the ~tiny count
    domain. COUNT(o_orderkey) counts non-null keys only = outer-join
    nulls land in the 0 bucket.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS t_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM lineitem
  GROUP BY l_partkey
) t ON t_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * avg_qty
"""


@plan("q17_small_quantity_revenue", oracle=Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery decorrelated into a
    window aggregate over the SAME partition key as the correlation —
    one shuffle on partkey serves both the threshold computation and
    the probe (vs the oracle's aggregate-then-rejoin, which would scan
    and shuffle lineitem twice).

    The brand filter broadcasts part and restricts BOTH the probe rows
    and the threshold build — equivalent to the oracle's unrestricted
    inner agg because partkey determines brand. Average as
    exact-decimal-sum / count so the 0.2× threshold comparison is
    bit-identical across engines.
    """
    from pyspark.sql.window import Window

    part_f = maybe_broadcast(
        spark,
        sf_dir,
        "part",
        load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23"),
    )
    li = load(spark, sf_dir, "lineitem").join(
        part_f, F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = F.sum(_dec("l_quantity")).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return (
        li.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q18_SQL = """
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@plan("q18_large_volume_orders", oracle=Q18_SQL)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING → aggregate lineitem
    once on orderkey, filter the aggregate, and reuse it as BOTH the
    semi-filter and the sum_qty value (the oracle's second lineitem
    scan disappears — one scan, one shuffle).
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 200)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@plan("q19_discounted_revenue", oracle=Q19_SQL)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands across the join.

    Catalyst extracts the common-to-all-branches parts of the OR as
    single-table filters (quantity ∈ [1,30] onto lineitem, size ∈
    [1,15] + brand ∈ {...} onto part) and pushes them below the join —
    the full disjunction then runs post-join on the survivors. Part
    stays broadcast; lineitem never shuffles.
    """
    li = load(spark, sf_dir, "lineitem")
    part = maybe_broadcast(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return j.filter(band).agg(F.sum(revenue).cast("double").alias("revenue"))


Q22_SQL = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
  FROM customer WHERE c_acctbal > 0.0
)
AND c_custkey % 10 = 7
GROUP BY segment
ORDER BY segment
"""


@plan("q22_global_sales_opportunity", oracle=Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global mean account
    balance) gating a segment rollup of a keyed slice of customers.

    The scalar is a 1-row DataFrame cross-joined with an explicit
    broadcast — never `.collect()`ed to the driver, so the plan is a
    single job and works unchanged when customer is 100 TB. (The
    reference's analog is preloading a key list and filtering in
    Python, `db.py:215-221` — same decorrelation, driver-side.)
    """
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "threshold"
        )
    )
    return (
        cust.filter(F.col("c_custkey") % 10 == 7)
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("segment")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@plan("q7_volume_shipping", oracle=Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year. The nation-pair disjunction filters AFTER both dims attach;
    Catalyst pushes the per-side `n_name IN (a,b)` implication into
    each broadcast dim, so the facts carry only pair-candidate rows
    into the final predicate. Year extraction groups on a derived
    column — still map-side combinable.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = maybe_broadcast(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q8_SQL = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_8'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS mkt_share
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


@plan("q8_market_share", oracle=Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    market per year — an 8-table join feeding a ratio of conditional
    decimal sums. part/supplier/nation/region all broadcast; the only
    shuffles are orders⋈lineitem and customer⋈orders on their keys.
    """
    part_f = maybe_broadcast(
        spark,
        sf_dir,
        "part",
        load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY"),
    )
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = maybe_broadcast(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_8", disc_price).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(part_f, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(disc_price).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT s_suppkey) AS supplier_cnt
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 5, 9, 13)
  AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@plan("q16_supplier_count", oracle=Q16_SQL)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many qualified suppliers offer each part
    class — COUNT(DISTINCT) fed through a NOT-IN exclusion.

    The NOT IN becomes a broadcast LEFT ANTI join pruning the supplier
    dim BEFORE it broadcasts into lineitem (the exclusion never
    touches the fact table). The distinct-count runs as Spark's
    two-phase expand — partial distinct on (brand, size, suppkey)
    map-side, exact count after one shuffle.
    """
    excluded = maybe_broadcast(
        spark,
        sf_dir,
        "supplier",
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey"),
    )
    supp = maybe_broadcast(
        spark,
        sf_dir,
        "supplier",
        load(spark, sf_dir, "supplier")
        .join(excluded, "s_suppkey", "left_anti")
        .select("s_suppkey"),
    )
    part_f = maybe_broadcast(
        spark,
        sf_dir,
        "part",
        load(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 5, 9, 13)
        ),
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(part_f, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )
