"""Schema registry — fixed StructTypes for the engine's stored tables.

Mirrors the reference's eight CREATE TABLE statements
(`/root/reference/db.py:85-186`) with typed upgrades per SURVEY §1.3:
  * pubdate TEXT → TimestampType
  * total_bases INTEGER → LongType
  * samples.srr ';'-joined TEXT → ArrayType(String) (`db.py:421-431`);
    a concat_ws(';') view is provided for byte-compatible output
  * autoincrement ids (tagid/entryid/asv_id) → deterministic xxhash64
    surrogate keys (see operators.keys), so no read-back remap join
    (`projects.py:499-523`) is ever needed.

The duplicate `tags` DDL in the reference (`db.py:119-135`, Quirk Q1)
is collapsed to one.
"""

from __future__ import annotations

from pyspark.sql import types as T

SAMPLES = T.StructType(
    [
        T.StructField("srs", T.StringType(), False),  # PK (db.py:90)
        T.StructField("project", T.StringType(), True),
        T.StructField("taxon", T.StringType(), True),
        T.StructField("srr", T.ArrayType(T.StringType()), True),  # multi-run (db.py:421-431)
        T.StructField("library_strategy", T.StringType(), True),
        T.StructField("library_source", T.StringType(), True),
        T.StructField("instrument", T.StringType(), True),
        T.StructField("pubdate", T.TimestampType(), True),  # TEXT upgraded (db.py:98)
        T.StructField("total_bases", T.LongType(), True),
        T.StructField("geo_loc_name", T.StringType(), True),
    ]
)

GEO_LOC_COUNTRIES = T.StructType(
    [
        T.StructField("geo_loc_name", T.StringType(), False),  # PK (db.py:104-109)
        T.StructField("iso2", T.StringType(), False),
    ]
)

COUNTRIES = T.StructType(
    [
        T.StructField("iso2", T.StringType(), False),  # PK (db.py:111-117)
        T.StructField("name", T.StringType(), False),
        T.StructField("region", T.StringType(), False),
    ]
)

TAGS = T.StructType(
    [
        T.StructField("tagid", T.LongType(), False),  # xxhash64(srs, tag) (db.py:119-126)
        T.StructField("srs", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

STATUS = T.StructType(
    [
        T.StructField("project", T.StringType(), False),  # PK (db.py:137-146)
        T.StructField("status", T.StringType(), False),
        T.StructField("rerun_as_single_end", T.IntegerType(), True),  # DEFAULT 0
        T.StructField("paired", T.IntegerType(), True),
        T.StructField("note1", T.StringType(), True),
        T.StructField("note2", T.StringType(), True),
    ]
)

ASV_COUNTS = T.StructType(
    [
        T.StructField("entryid", T.LongType(), False),  # xxhash64(sample, asv) (db.py:149-156)
        T.StructField("sample", T.StringType(), False),
        T.StructField("asv", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)

ASV_SEQUENCES = T.StructType(
    [
        T.StructField("asv_id", T.LongType(), False),  # xxhash64(project, asv) (db.py:158-165)
        T.StructField("project", T.StringType(), False),
        T.StructField("asv", T.StringType(), False),
        T.StructField("seq", T.StringType(), True),
    ]
)

ASV_ASSIGNMENTS = T.StructType(
    [
        T.StructField("asv_id", T.LongType(), False),  # PK (db.py:167-178)
        T.StructField("tdatabase", T.StringType(), True),
        T.StructField("kingdom", T.StringType(), True),
        T.StructField("phylum", T.StringType(), True),
        T.StructField("tclass", T.StringType(), True),
        T.StructField("torder", T.StringType(), True),
        T.StructField("family", T.StringType(), True),
        T.StructField("genus", T.StringType(), True),
    ]
)

ASV_INFERENCE = T.StructType(
    [
        T.StructField("project", T.StringType(), False),  # PK (db.py:180-186)
        T.StructField("region", T.StringType(), True),
        T.StructField("length", T.DoubleType(), True),
    ]
)

ALL_TABLES: dict[str, T.StructType] = {
    "samples": SAMPLES,
    "geo_loc_countries": GEO_LOC_COUNTRIES,
    "countries": COUNTRIES,
    "tags": TAGS,
    "status": STATUS,
    "asv_counts": ASV_COUNTS,
    "asv_sequences": ASV_SEQUENCES,
    "asv_assignments": ASV_ASSIGNMENTS,
    "asv_inference": ASV_INFERENCE,
}

# status.status lifecycle values (README.md:102-111 + projects.py:113)
STATUS_VALUES = (
    "initialized",  # projects.py:113
    "accession_list_created",  # projects.py:125
    "running",  # projects.py:135
    "to_re_run",  # projects.py:327
    "complete",  # projects.py:525
    "archived",  # projects.py:544
    "done",  # projects.py:551
    "failed",  # projects.py:413
)

TERMINAL_STATUSES = ("done", "failed")  # management.py:17-20
