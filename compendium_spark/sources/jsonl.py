"""JSONL (newline-delimited JSON) source and sink.

JSONL is the interchange format of training-data pipelines — corpora
move between curation stages and trainers as (optionally gzipped)
line-delimited JSON shards. Spark's native json reader/writer already
does the heavy lifting (distributed line splitting, schema projection,
predicate pushdown on the parsed columns, per-partition shard files);
these wrappers pin the options that matter for corpus work:

* explicit schema on read — schema inference is a full extra pass over
  100 TB and infers unstable types across shards; corpus readers must
  declare what they expect,
* `lineSep="\n"` + `multiLine=false` pinned — a JSONL shard is
  splittable by line, a multiline JSON document is NOT (one task per
  file); never let a stray option flip this,
* optional gzip/zstd codec on write (shard-level compression; zstd is
  splittable-enough in practice because each shard is one task's
  output anyway),
* `mode="PERMISSIVE"` with a `_corrupt_record` column on read, so a
  torn line in a 100 TB crawl surfaces as data (filter and count it)
  instead of killing the job.

Reference parity note: the reference has no JSON surface (its I/O is
XML/TSV/FASTA, reference main.py:20-134); this source belongs to the
brief's training-data-pipeline extension axis — a user exporting the
`documents` table to a trainer needs exactly this sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    codec: str | None = None,
    mode: str = "overwrite",
    shards: int | None = None,
) -> None:
    """Write ``df`` as JSONL shards (one file per partition).

    ``shards`` repartitions before write — the shard-count knob every
    trainer cares about (too few = no read parallelism, too many =
    small-file pressure). Round-robin repartition keeps shards
    size-balanced regardless of upstream key skew."""
    if shards is not None:
        df = df.repartition(shards)
    writer = df.write.mode(mode).option("lineSep", "\n")
    if codec:
        writer = writer.option("compression", codec)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with an EXPLICIT schema (no inference pass).

    PERMISSIVE mode parks unparseable lines in ``_corrupt_record``;
    by default they are filtered out after being counted into the
    reader's accumulator-free contract (callers that need the torn
    lines pass ``keep_corrupt=True`` and handle the column)."""
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string  # noqa: PLC0415

        schema = _parse_datatype_string(schema)
    # the corrupt column must be IN the read schema for PERMISSIVE mode
    # to capture torn lines (otherwise they surface as all-null rows,
    # indistinguishable from legitimate nulls) — always add it, drop it
    # again unless the caller asked to keep it
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        from pyspark.sql.types import StringType, StructField  # noqa: PLC0415

        schema = StructType(
            [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
        )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "false")
        .option("lineSep", "\n")
        .json(path)
    )
    if not keep_corrupt and CORRUPT_COL in df.columns:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df
