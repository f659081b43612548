"""File-layout operators: compaction and range clustering.

These assert PHYSICAL properties — file counts and actual parquet
footer statistics — not just logical equality, because the layout IS
the product here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.operators.layout import (
    cluster_by,
    compact,
    file_key_ranges,
)
from compendium_spark.tables import load

from .conftest import SF_SMOKE


def test_compact_binpacks_small_files(spark, tmp_path):
    tbl = tmp_path / "events_fragmented"
    ev = load(spark, SF_SMOKE, "events")
    ev.repartition(64).write.parquet(str(tbl))
    want_count = ev.count()
    want_sum = ev.agg(F.sum("value")).collect()[0][0]

    before, after = compact(spark, tbl, target_file_bytes=128 << 20)
    assert before == 64
    assert after == 1  # smoke data is far below one target file

    got = spark.read.parquet(str(tbl))
    assert got.count() == want_count
    assert abs(got.agg(F.sum("value")).collect()[0][0] - want_sum) < 1e-6


def test_compact_noop_when_already_packed(spark, tmp_path):
    tbl = tmp_path / "already_packed"
    load(spark, SF_SMOKE, "events").coalesce(1).write.parquet(str(tbl))
    before, after = compact(spark, tbl)
    assert (before, after) == (1, 1)


def test_cluster_by_yields_disjoint_footer_ranges(spark, tmp_path):
    tbl = tmp_path / "lineitem_clustered"
    li = load(spark, SF_SMOKE, "lineitem")
    cluster_by(li, tbl, "l_orderkey", n_files=8)

    ranges = file_key_ranges(tbl, "l_orderkey")
    assert len(ranges) == 8
    # every file owns a disjoint key span → a point predicate prunes
    # to exactly one file
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1
        assert hi1 < lo2

    got = spark.read.parquet(str(tbl))
    assert got.count() == li.count()
    assert (
        got.agg(F.sum("l_orderkey")).collect()[0][0]
        == li.agg(F.sum("l_orderkey")).collect()[0][0]
    )
