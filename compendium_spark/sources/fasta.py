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
    """Parse FASTA → (asv string, seq string).

    Duplicate headers within a file resolve LAST-wins, because the
    reference accumulates records into a dict keyed by header
    (`seqs[asv] = seq`, projects.py:459) — same dict semantics as the
    tags EAV dedup (A10). Known deliberate divergence (quirk-note):
    the reference's loop is PURE 2-line alternation — it never checks
    for '>', so a malformed file whose alternation slips feeds
    sequence text through the header slot (and `asv[1:-1]` chops it);
    this reader keys records on the '>' prefix instead, which agrees
    on every well-formed 2-line file and degrades more predictably on
    malformed ones."""
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
    headers = paired.filter(F.col("value").startswith(">")).select(
        F.regexp_replace(F.col("value"), "^>", "").alias("asv"),  # projects.py:455
        F.col("next_line").alias("seq"),
        "file",
        "offset",
    )
    last = Window.partitionBy("file", "asv").orderBy(F.desc("offset"))
    return (
        headers.withColumn("rn", F.row_number().over(last))
        .filter(F.col("rn") == 1)
        .select("asv", "seq")
    )
