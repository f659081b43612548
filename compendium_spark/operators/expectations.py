"""Declarative data-quality expectations (Deequ-lite).

A 100 TB pipeline gates every ingest and every transform output on
data-quality checks; the operative constraint is that N checks must
not cost N passes. This module compiles a list of expectations into
ONE conditional-aggregation pass per table (plus one anti-join per
referential check, the only shape that needs a second side), returning
a tidy report frame ``(check_name, n_checked, n_violations, passed)``.

The reference validates schemas imperatively at write time
(reference db.py's INSERT paths + our operators/validate.py); this is
the declarative, aggregate-compiled generalization for row CONTENT.

Usage:
    report = check(df, [
        not_null("o_custkey"),
        unique("o_orderkey"),
        in_set("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", 0, None, name="price_positive"),
        satisfies("o_orderdate <= current_date()", "no_future_orders"),
    ])

Every expectation contributes two agg expressions (rows checked,
violations) to the same ``df.agg(...)`` call — Catalyst evaluates them
in a single scan with map-side partial aggregation. ``unique`` rides
the same pass via count/count_distinct. ``referential`` needs the
other table, so it runs as a broadcast-or-shuffle anti-join count and
unions into the report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from compendium_spark.localframe import local_df


@dataclass(frozen=True)
class Expectation:
    name: str
    # violation predicate: true when the ROW violates the expectation
    violation: Column
    # rows the check applies to (null handling is per-expectation)
    applicable: Column


def not_null(col: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"not_null({col})",
        F.col(col).isNull(),
        F.lit(True),
    )


def in_set(col: str, values: list, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"in_set({col})",
        ~F.col(col).isin(values) | F.col(col).isNull(),
        F.lit(True),
    )


def in_range(
    col: str,
    lo=None,
    hi=None,
    name: str | None = None,
) -> Expectation:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return Expectation(
        name or f"in_range({col})",
        cond | F.col(col).isNull(),
        F.lit(True),
    )


def satisfies(sql_predicate: str, name: str) -> Expectation:
    """Row-level predicate the data must satisfy (violation = NOT p;
    a NULL predicate counts as a violation — unknowns don't pass)."""
    p = F.expr(sql_predicate)
    return Expectation(name, ~F.coalesce(p, F.lit(False)), F.lit(True))


@dataclass(frozen=True)
class Unique:
    """Uniqueness as count − count_distinct, riding the same aggregate
    pass as the row-level expectations (duplicates = extra occurrences
    beyond the first of each value; nulls excluded — pair with
    not_null when nulls are also illegal)."""

    name: str
    col: str


def unique(col: str, name: str | None = None) -> Unique:
    return Unique(name or f"unique({col})", col)


def check(
    df: DataFrame, expectations: list[Expectation | Unique]
) -> DataFrame:
    """Compile N expectations into ONE aggregate pass.

    The agg row is computed once and pivoted to tidy report rows with
    ``inline(array(struct(...)))`` — the tidy projection references
    only the 1-row aggregate, never the source again, so the executed
    plan contains exactly one scan of ``df`` regardless of N
    (tests/test_quality.py asserts the scan count on the executed
    plan).
    """
    aggs, builders = [], []
    for i, e in enumerate(expectations):
        if isinstance(e, Unique):
            aggs.append(F.count(e.col).alias(f"c_{i}"))
            aggs.append(F.count_distinct(F.col(e.col)).alias(f"d_{i}"))
            builders.append(
                (e.name, F.col(f"c_{i}"), F.col(f"c_{i}") - F.col(f"d_{i}"))
            )
        else:
            aggs.append(
                F.sum(F.when(e.applicable, 1).otherwise(0)).alias(f"c_{i}")
            )
            aggs.append(
                F.sum(
                    F.when(e.applicable & e.violation, 1).otherwise(0)
                ).alias(f"v_{i}")
            )
            builders.append((e.name, F.col(f"c_{i}"), F.col(f"v_{i}")))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("check_name"),
            checked.cast("long").alias("n_checked"),
            violations.cast("long").alias("n_violations"),
            (violations == 0).alias("passed"),
        )
        for name, checked, violations in builders
    ]
    return row.select(F.inline(F.array(*structs)))


def unique_check(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Standalone uniqueness report (see ``Unique`` — prefer passing
    ``unique(col)`` inside ``check()`` so it shares the scan)."""
    return check(df, [unique(col, name)])


def referential_check(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Foreign-key integrity: child rows whose key has no parent.
    One anti-join (broadcast when the parent key set is small, AQE
    decides otherwise) + one count."""
    nm = name or f"referential({child_col}->{parent_col})"
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    orphans = child.select(child_col).join(keys, child_col, "left_anti")
    total = child.select(child_col).count()
    bad = orphans.count()
    spark = child.sparkSession
    return local_df(
        spark,
        [(nm, total, bad, bad == 0)],
        "check_name string, n_checked long, n_violations long, passed boolean",
    )
