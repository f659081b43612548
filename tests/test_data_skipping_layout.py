"""Layout × data-skipping pins (round 11): manifest column stats must
actually prune under a clustered layout, including on TIMESTAMP
columns — which requires INT64-micros parquet output (Spark's legacy
INT96 carries no statistics at all; session.py pins the config).
Measured A/B lives in tools/skipping_bench.py / SCALING.md."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from compendium_spark.storage_versioned import VersionedWarehouse

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 8
JAN95 = [
    ("l_shipdate", ">=", datetime(1995, 1, 1)),
    ("l_shipdate", "<", datetime(1995, 2, 1)),
]


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    root = tmp_path_factory.mktemp("skiplayout")
    whs = {}
    for layout, df in (
        ("scattered", src.repartition(N_FILES)),
        (
            "clustered",
            src.repartitionByRange(N_FILES, "l_shipdate").sortWithinPartitions(
                "l_shipdate"
            ),
        ),
    ):
        wh = VersionedWarehouse(
            spark, str(root / layout), extra_tables={"lineitem": src.schema}
        )
        wh.write("lineitem", df)
        whs[layout] = wh
    return src, whs


def test_timestamp_stats_are_recorded(layouts):
    """INT96 regression pin: every written file's manifest entry must
    carry l_shipdate min/max (ISO-8601 strings). If this fails, check
    spark.sql.parquet.outputTimestampType first."""
    _, whs = layouts
    for wh in whs.values():
        man = wh.manifest("lineitem", 0)
        assert len(man["files"]) == N_FILES
        for f in man["files"]:
            st = man["stats"][f]["cols"]["l_shipdate"]
            assert st["min"] <= st["max"]
            assert st["min"].startswith(("199", "200"))  # ISO year


def test_clustered_layout_prunes_time_probe(layouts):
    """THE zone-map pin: a 1-month probe against the range-clustered
    layout opens at most 2 of 8 files; against the scattered layout it
    opens (nearly) all of them — same stats machinery, layout is the
    entire difference."""
    _, whs = layouts
    kept_c, skipped_c = whs["clustered"].scan_files("lineitem", where=JAN95)
    assert len(kept_c) <= 2, kept_c
    assert len(kept_c) + len(skipped_c) == N_FILES
    kept_s, _ = whs["scattered"].scan_files("lineitem", where=JAN95)
    assert len(kept_s) >= N_FILES - 2, kept_s


def test_pruned_reads_agree_across_layouts(layouts):
    """Both layouts' pruned reads return exactly the source filter's
    rows — pruning never changes results, only which files open."""
    src, whs = layouts
    want = src.filter(
        (F.col("l_shipdate") >= JAN95[0][2]) & (F.col("l_shipdate") < JAN95[1][2])
    ).count()
    assert want > 0
    for wh in whs.values():
        got = wh.read("lineitem", where=JAN95).count()
        assert got == want
