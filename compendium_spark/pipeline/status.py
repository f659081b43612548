"""Project state machine + orchestration queries (SURVEY §2.4 A1-A3,
§2.2 P4/P5, §2.3 J5, §3.3).

The reference drives a per-project lifecycle column
(`status.status`: initialized → accession_list_created → running →
[to_re_run|complete] → archived → done | failed; README.md:102-111)
via point UPDATEs. Here every transition is a keyed upsert on the
`status` DataFrame, and the selection queries are pure transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from compendium_spark.localframe import local_df
from compendium_spark.operators.merge import upsert
from compendium_spark.schemas import TERMINAL_STATUSES


def non_terminal_projects(status: DataFrame) -> DataFrame:
    """P5 (`management.py:17-20`): WHERE status NOT IN ('done','failed')."""
    return status.filter(~F.col("status").isin(*TERMINAL_STATUSES)).select("project")


def set_status(status: DataFrame, project: str, new_status: str) -> DataFrame:
    """One transition (`projects.py:87-106`): upsert (project, status)."""
    spark = status.sparkSession
    update = local_df(
        spark, [(project, new_status, 0, None, None, None)], status.schema
    )
    existing = status.filter(F.col("project") == project)
    if existing.limit(1).count() > 0:
        merged = status.withColumn(
            "status",
            F.when(F.col("project") == project, F.lit(new_status)).otherwise(
                F.col("status")
            ),
        )
        return merged
    return upsert(status, update, key="project")


def eligible_samples(samples: DataFrame, project: str | None = None) -> DataFrame:
    """P4 (`projects.py:67-73`): srr present, GENOMIC|METAGENOMIC,
    AMPLICON[, project]. srr is array-typed here, so 'IS NOT NULL'
    becomes size>0 (SURVEY §1.3)."""
    cond = (
        F.col("srr").isNotNull()
        & (F.size("srr") > 0)
        & F.col("library_source").isin("GENOMIC", "METAGENOMIC")
        & (F.col("library_strategy") == "AMPLICON")
    )
    if project is not None:
        cond = cond & (F.col("project") == project)
    return samples.filter(cond)


def find_todo(
    samples: DataFrame,
    status: DataFrame,
    min_samples: int = 50,
    max_samples: int = 10000,
    needed: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """A1 project picker (`management.py:90-125`): group eligible
    samples per project, band-filter on count, exclude projects
    already tracked in `status`, random-pick `needed`.

    Fixes Quirk Q3 by design: the reference's final membership check
    compares result *tuples* against a list of id *strings*
    (`management.py:125`), so it never excludes anything; the correct
    exclusion is a left-anti join on project.
    """
    candidates = (
        eligible_samples(samples)
        .groupBy("project")
        .agg(F.count(F.lit(1)).alias("samples"))
        .filter(F.col("samples").between(min_samples, max_samples))
    )
    picked = candidates.join(
        status.select("project"), on="project", how="left_anti"
    )  # J5, corrected semantics
    picked = picked.orderBy(F.rand(seed))
    if needed is not None:
        picked = picked.limit(needed)
    return picked


def status_frequency(status: DataFrame) -> DataFrame:
    """A3 (`management.py:151-156`): SELECT status, COUNT(DISTINCT
    project) GROUP BY 1 ORDER BY 2 DESC."""
    return (
        status.groupBy("status")
        .agg(F.countDistinct("project").alias("n_projects"))
        .orderBy(F.desc("n_projects"), "status")
    )


def geo_summary(
    samples: DataFrame, geo_loc_countries: DataFrame, countries: DataFrame
) -> DataFrame:
    """Samples per country/region through the geo snowflake
    (ref `db.py:92-117`: samples.geo_loc_name → geo_loc_countries →
    countries — the native form of plan j7_snowflake_dims). Both dims
    broadcast; unmapped geo_loc_name values roll up under
    '<unmapped>' rather than silently dropping."""
    return (
        samples.join(F.broadcast(geo_loc_countries), "geo_loc_name", "left")
        .join(F.broadcast(countries), "iso2", "left")
        .groupBy(
            F.coalesce("region", F.lit("<unmapped>")).alias("region"),
            F.coalesce("name", F.lit("<unmapped>")).alias("country"),
        )
        .agg(
            F.countDistinct("srs").alias("n_samples"),
            F.countDistinct("project").alias("n_projects"),
        )
        .orderBy("region", "country")
    )


def compendium_summary(samples: DataFrame, asv_counts: DataFrame) -> DataFrame:
    """A2 compendium report (`management.py:127-159`). Quirk Q4 fixed:
    the reference counts DISTINCT `sample` on a table whose column is
    `srs` (`management.py:133-135`); we count the real key."""
    s = samples.agg(
        F.countDistinct("project").alias("n_projects"),
        F.countDistinct("srs").alias("n_samples"),
    )
    a = asv_counts.agg(
        F.countDistinct("sample").alias("n_result_samples"),
        F.countDistinct("asv").alias("n_asvs"),
    )
    return s.crossJoin(a)
