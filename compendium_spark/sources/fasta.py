"""FASTA source (SURVEY §2.1 S6).

Reference behavior (`/root/reference/projects.py:446-459`): strict
2-line records — header `>ASV_n`, then the sequence line; leading `>`
stripped (`projects.py:455`).

Spark-first: `spark.read.text` + a lead() window pairs header lines
with their following sequence line. For the strict 2-line format this
is exact; the window is partitioned per file and ordered by line
offset. (True multi-GB multi-line FASTA would use a mapPartitions
chunk parser; the reference format is 2-line.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Parse FASTA → (asv string, seq string)."""
    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("offset", F.monotonically_increasing_id())
    )
    # monotonically_increasing_id is ordered within a partition and
    # spark.read.text preserves line order within each split, which is
    # what the lead() pairing needs.
    w = Window.partitionBy("file").orderBy("offset")
    paired = lines.withColumn("next_line", F.lead("value").over(w))
    return (
        paired.filter(F.col("value").startswith(">"))
        .select(
            F.regexp_replace(F.col("value"), "^>", "").alias("asv"),  # projects.py:455
            F.col("next_line").alias("seq"),
        )
    )
