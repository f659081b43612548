"""Sample-source keep/toss filter (SURVEY §2.2 P6, §2.1 S8/K4).

Reference (`/root/reference/helpers.py:1-23`): read free-text source
strings, keep those containing any keep-keyword and no toss-keyword,
write `source\\tyes|no` lines.

Spark-first: both keyword lists compile to single regex alternations
(one codegen'd `rlike` each) instead of a per-string Python any()
loop; the sink is a tab-separated text write.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TO_KEEP = ("fec", "faec", "stool", "2003", "meconium")  # helpers.py:8
TO_TOSS = ("cultur", "swab", "incubat", "rectum", "rectal", "virus", "tissue", "soil")  # helpers.py:9


def _alternation(words: tuple[str, ...]) -> str:
    return "|".join(re.escape(w) for w in words)


def classify_sources(sources: DataFrame, col: str = "source") -> DataFrame:
    """Add a yes/no `decision` column (helpers.py:14-17 semantics:
    keep requires ≥1 keep-keyword AND 0 toss-keywords)."""
    keep = F.col(col).rlike(_alternation(TO_KEEP))
    toss = F.col(col).rlike(_alternation(TO_TOSS))
    return sources.withColumn(
        "decision", F.when(keep & ~toss, "yes").otherwise("no")
    )


def filter_sources(spark: SparkSession, in_path: str, out_path: str) -> int:
    """End-to-end S8→P6→K4: read sources.txt, classify, write
    `source\\tdecision` lines. Returns kept count."""
    src = spark.read.text(in_path).withColumnRenamed("value", "source")
    decided = classify_sources(src)
    decided.select(
        F.concat_ws("\t", F.col("source"), F.col("decision")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(out_path)
    return decided.filter(F.col("decision") == "yes").count()
