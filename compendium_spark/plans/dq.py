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
from compendium_spark.tables import load

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
    aggregates + one keyed FK join (see module docstring)."""
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
