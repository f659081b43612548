"""Arrow-backed local DataFrames (optimization guide §4.1).

``SparkSession.createDataFrame(list_of_rows)`` parallelizes the rows
into a pickled-row RDD, and every action that touches the frame then
re-runs a Python-worker roundtrip to unpickle them — measured ~250 ms
per action for a 5-row frame on local[32] (plans/sinks._one_slice_df,
r14), paid by sweep grids, collected centroid/weight outputs and
fixture rows in otherwise JVM-only plans. Building the same rows as a
pyarrow Table instead yields a JVM-side columnar scan: same schema,
same rows, no Python boundary in the hot path.

``local_df`` is the shared constructor for every literal/driver-state
frame inside timed plan paths. It falls back to the classic RDD path
for anything pyarrow cannot coerce (the fixture contract: never fail
a plan over a serialization fast-path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def arrow_local_df(spark: SparkSession, rows, schema) -> DataFrame | None:
    """The arrow fast path alone: frame ``rows`` (already a list) as a
    pyarrow Table against the schema's exact arrow projection, or
    return ``None`` when pyarrow cannot bind them safely — the caller
    chooses its own fallback (``local_df`` defers to the stock
    ``createDataFrame``; ``plans.sinks._one_slice_df`` needs a
    single-slice ``parallelize(rows, 1)`` instead)."""
    try:
        import pyarrow as pa  # noqa: PLC0415
        from pyspark.sql.pandas.types import to_arrow_schema  # noqa: PLC0415

        # Positional tuples/lists ONLY (exact types, not subclasses):
        # a Row or dict binds by NAME in the stock path, and zip-ing it
        # against the schema here would silently misbind values.
        if not all(type(r) in (tuple, list) for r in rows):
            return None
        st = (
            schema
            if isinstance(schema, StructType)
            else StructType.fromDDL(schema)
        )
        asch = to_arrow_schema(st)
        tbl = pa.Table.from_pylist(
            [dict(zip(asch.names, r)) for r in rows], schema=asch
        )
        return spark.createDataFrame(tbl, st)
    except Exception:  # noqa: BLE001 — fast path only, never a plan error
        return None


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the per-action
    Python-worker roundtrip: rows are framed once, driver-side, as a
    pyarrow Table against the schema's exact arrow projection.

    ``rows`` must be a sequence of positional tuples/lists matching
    ``schema`` (a DDL string or StructType) — the only shape the
    engine's plan-local frames use. Any coercion pyarrow rejects
    (or any Row/dict input) falls back to the stock RDD path, which
    keeps pickle-path semantics for exotic values by construction.
    """
    rows = list(rows)
    fast = arrow_local_df(spark, rows, schema)
    if fast is not None:
        return fast
    return spark.createDataFrame(rows, schema)
