"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over ``compendium_spark.plans`` — every implemented
operator from SURVEY.md §2 is registered there as a Plan (query fn +
DuckDB oracle SQL). See ``tests/test_parity.py`` for the local mirror
of the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from compendium_spark.plans import all_plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    plans = all_plans()
    return plans["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: p.fn for name, p in all_plans().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted where the op is not
    SQL-expressible (driver then records a rows-only check)."""
    return {name: p.oracle for name, p in all_plans().items() if p.oracle is not None}
