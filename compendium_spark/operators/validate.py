"""Schema validation at the storage boundary.

The reference trusts SQLite's dynamic typing (`db.py:31-51` inserts
whatever tuples arrive); this engine validates every DataFrame against
the declared table schema BEFORE it reaches storage, so a drifted
ingest fails loudly at the write, not silently at the next read.
Names and types must match positionally; nullability is advisory
(parquet can't enforce it) and is not compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class SchemaMismatchError(ValueError):
    pass


def _norm(dt: T.DataType) -> str:
    return dt.simpleString()


def validate_schema(df: DataFrame, expected: T.StructType, table: str) -> DataFrame:
    """Raise SchemaMismatchError unless df's columns match `expected`
    in name and type (any order); returns df re-projected into the
    declared column order."""
    have = {f.name: _norm(f.dataType) for f in df.schema.fields}
    want = {f.name: _norm(f.dataType) for f in expected.fields}
    missing = sorted(set(want) - set(have))
    extra = sorted(set(have) - set(want))
    wrong = sorted(
        f"{n}: {have[n]} != {want[n]}" for n in set(have) & set(want)
        if have[n] != want[n]
    )
    if missing or extra or wrong:
        raise SchemaMismatchError(
            f"table {table!r}: schema mismatch — "
            f"missing={missing} extra={extra} wrong_type={wrong}"
        )
    return df.select(*[f.name for f in expected.fields])
