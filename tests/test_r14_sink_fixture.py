"""_one_slice_df arrow rework (r14 optimization half, second session).

The sink fixtures used to be parallelize-backed: every action on them
re-ran a Python-worker roundtrip (~250 ms/action for a 5-row frame),
paid once per warehouse commit across the whole sink family. The
arrow-table build keeps the two contracts the docstring promises —
exact schema and single-slice birth — while scanning JVM-side.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from compendium_spark.plans import sinks
from compendium_spark.plans.sinks import _one_slice_df
from compendium_spark.schemas import SAMPLES

ROWS = [
    ("SRS1", "PRJ1", "tx", ["r1", "r2"], None, None, None, None, 123, None),
    ("SRS2", "PRJ1", None, None, "WGS", None, None, None, None, None),
    ("SRS3", None, "tx2", [], None, None, None, None, 0, "usa"),
]


def _rdd_path(spark, rows, schema):
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def test_arrow_fixture_matches_rdd_path(spark):
    got = _one_slice_df(spark, ROWS, SAMPLES)
    want = _rdd_path(spark, ROWS, SAMPLES)
    assert got.schema == want.schema == SAMPLES
    assert got.collect() == want.collect()  # order preserved, values equal


def test_single_slice_birth(spark, tmp_path):
    df = _one_slice_df(spark, ROWS, SAMPLES)
    assert df.rdd.getNumPartitions() == 1
    df.write.mode("overwrite").parquet(str(tmp_path / "t"))
    parts = [p for p in (tmp_path / "t").iterdir() if p.name.startswith("part-")]
    assert len(parts) == 1  # the single-file commit shape


def test_typed_columns_survive(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("src", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    rows = [(0, "a", 0.5), (1, None, None), (2, "c", -1.25)]
    df = _one_slice_df(spark, rows, schema)
    assert df.schema == schema
    assert [tuple(r) for r in df.collect()] == rows


def test_fallback_to_rdd_path(spark, monkeypatch):
    def boom(_schema):
        raise RuntimeError("forced: value pyarrow cannot coerce")

    import pyspark.sql.pandas.types as pt

    monkeypatch.setattr(pt, "to_arrow_schema", boom)
    df = _one_slice_df(spark, ROWS, SAMPLES)
    assert df.schema == SAMPLES
    assert len(df.collect()) == len(ROWS)
    assert df.rdd.getNumPartitions() == 1
