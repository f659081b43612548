"""Deterministic surrogate keys.

The reference relies on SQLite autoincrement rowids for `tagid`,
`entryid`, and `asv_id`, then reads keys back and re-joins to re-key
dependents (`/root/reference/projects.py:499-523` — the comment at
:500-501 notes RETURNING doesn't work with executemany).

In a distributed engine autoincrement is an anti-pattern (a global
sequence is a serialization point). We derive keys from content:
``xxhash64`` of the natural key — deterministic across runs and
executors, parallel-safe, and it deletes the read-back remap join
entirely (dependents compute the same key independently).

NOT ``monotonically_increasing_id`` — that is partition-layout
dependent and changes across runs (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: ('a','bc') != ('ab','c')


def surrogate_key(*cols: str | Column) -> Column:
    """64-bit deterministic key from the natural-key columns."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(F.concat_ws(SEP, *parts))


def with_surrogate_key(df: DataFrame, key_name: str, *cols: str | Column) -> DataFrame:
    return df.withColumn(key_name, surrogate_key(*cols))
