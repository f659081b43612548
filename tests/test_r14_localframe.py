"""local_df: arrow-backed local frames must be value/schema-identical
to the stock createDataFrame path, and must fall back (never fail) on
input shapes the fast path cannot bind safely."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql.types import StructType

from compendium_spark.localframe import local_df


@pytest.fixture(scope="module")
def spark():
    from compendium_spark.session import get_session

    return get_session("test_r14_localframe")


def _assert_same(spark, rows, schema):
    fast = local_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert fast.schema == ref.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, ref.collect())
    )
    return fast


def test_ddl_schema_parity(spark):
    rows = [(1, 2.5, "x", True), (2, None, None, False)]
    _assert_same(spark, rows, "a int, b double, c string, d boolean")


def test_structtype_schema_parity(spark):
    st = StructType.fromDDL("bucket int, weight double")
    rows = [(-1, 0.125), (3, -7.0)]
    _assert_same(spark, rows, st)


def test_long_and_empty(spark):
    _assert_same(spark, [(10**12, 1)], "big long, small int")
    _assert_same(spark, [], "a int, b string")


def test_timestamp_parity(spark):
    # naive datetimes must land on the same instant through both
    # serializers (session tz is UTC)
    rows = [("p1", datetime.datetime(2024, 3, 1, 12, 30, 0))]
    _assert_same(spark, rows, "project string, ts timestamp")


def test_no_python_worker_in_scan(spark):
    # the point of the fast path: the frame's RDD lineage must not be
    # a pickled PythonRDD (which would re-run a Python worker roundtrip
    # on every action touching the frame)
    df = local_df(spark, [(1, "a")], "k int, v string")
    lineage = df.rdd.toDebugString().decode()
    ref = spark.createDataFrame([(1, "a")], "k int, v string")
    ref_lineage = ref.rdd.toDebugString().decode()
    assert "PythonRDD" in ref_lineage  # the anti-pattern we replace
    # the fast path's lineage may still contain a ParallelCollectionRDD
    # (Spark parallelizes the serialized arrow batches JVM-side); the
    # property that matters is that no Python worker sits in the scan
    assert "PythonRDD" not in lineage


def test_dict_rows_fall_back(spark):
    # dicts bind by NAME in the stock path; the fast path must refuse
    # them (zip-by-position would misbind) and defer
    rows = [{"a": 1, "b": "x"}]
    df = local_df(spark, rows, "a int, b string")
    assert df.collect() == spark.createDataFrame(rows, "a int, b string").collect()


def test_uncoercible_value_falls_back(spark):
    class Weird:
        def __str__(self):
            return "w"

    # pyarrow cannot coerce Weird() into a string column, so the fast
    # path must defer to the stock pickle path — whose permissive
    # StringType verifier accepts the object. The contract is parity
    # with the stock path's behavior, whatever that behavior is.
    rows = [(Weird(),)]
    fast = local_df(spark, rows, "a string").collect()
    ref = spark.createDataFrame(rows, "a string").collect()
    assert fast == ref
