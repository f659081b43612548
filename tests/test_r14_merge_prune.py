"""r14 merge-scale fix: _merge's key->current-partition mapping was a
full-table scan per merge — O(table) even for a 10-key upsert, the
dominant cost of a small merge into a big table. With a bounded,
single-column, all-non-null update key set the mapping now scans
through read(where=[(key, 'in', vals)]), so manifest min/max +
dict/bloom membership hints skip every file provably holding none of
the update keys.

Pins: (1) file-level evidence that the hint scan prunes on this
layout; (2) pruned-path merge result identical to the naive full-scan
path (forced via the cap), including a partition MOVE, a new key, and
a bystander partition left untouched on disk; (3) the >cap and
null-key cases fall back to the naive path and still merge correctly.
tools/decade_probe.py --cdf-only measures the end result: a fixed
10-key upsert is FLAT one decade out (slope -0.05) on the partitioned
layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import compendium_spark.storage_versioned as sv
from compendium_spark.storage_versioned import VersionedWarehouse

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("day", T.IntegerType()),
        T.StructField("val", T.StringType()),
    ]
)

ROWS = [(f"K{i}", i % 4, f"v{i}") for i in range(40)]


def _mk(spark, rows):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), SCHEMA
    )


@pytest.fixture()
def wh(spark, tmp_path):
    w = VersionedWarehouse(
        spark,
        str(tmp_path / "wh"),
        extra_tables={"ev": SCHEMA},
        hint_columns={"ev": ["id"]},
    )
    # multi-file initial write (compact no-ops on a single file) so
    # the compaction really migrates into the day=N hive layout
    w.write(
        "ev",
        spark.createDataFrame(
            spark.sparkContext.parallelize(ROWS, 8), SCHEMA
        ),
    )
    w.set_partition_spec("ev", "day")
    w.compact("ev")  # migrate into day=N files, hints harvested
    return w


def _rows(w):
    return {r.id: (r.day, r.val) for r in w.read("ev").collect()}


def test_hint_scan_prunes_files_for_point_keys(wh):
    """File-level evidence the where=[(id, in, ...)] scan the merge
    now routes through actually skips files on this layout."""
    kept, skipped = wh.scan_files(
        "ev", wh.latest("ev"), [("id", "in", ["K1", "K5"])]
    )
    assert skipped, "membership hints must skip some files"
    assert len(kept) < len(kept) + len(skipped)


def test_pruned_merge_equals_naive_merge(wh, spark, monkeypatch):
    """Same updates through the pruned path (default cap) and the
    naive full-scan path (cap forced to 0) must produce identical
    tables — including a value update, a partition MOVE (K1 day 1->3)
    and a brand-new key landing in a new partition value."""
    ups = [("K1", 3, "moved"), ("K2", 2, "updated"), ("KNEW", 9, "new")]

    wh.upsert("ev", _mk(spark, ups), "id")
    pruned = _rows(wh)

    # roll back and redo through the naive path
    wh.rollback("ev", wh.latest("ev") - 1)
    monkeypatch.setattr(sv, "_MERGE_KEY_PRUNE_CAP", 0)
    wh.upsert("ev", _mk(spark, ups), "id")
    assert _rows(wh) == pruned
    assert pruned["K1"] == (3, "moved")
    assert pruned["K2"] == (2, "updated")
    assert pruned["KNEW"] == (9, "new")
    assert len(pruned) == len(ROWS) + 1


def test_untouched_partition_carried_by_reference(wh, spark):
    """A 1-key update must carry every other partition's files by
    reference (path-identical), proving the pruned mapping did not
    widen the rewrite set."""
    man0 = wh.manifest("ev", wh.latest("ev"))
    patch = spark.createDataFrame(
        spark.sparkContext.parallelize([("K3", "patched")], 1),
        "id string, val string",
    )
    wh.partial_update("ev", patch, "id")
    man1 = wh.manifest("ev", wh.latest("ev"))
    before = {f for f in man0["files"] if "day=0" in f or "day=1" in f or "day=2" in f}
    after = {f for f in man1["files"] if "day=0" in f or "day=1" in f or "day=2" in f}
    assert before == after  # K3 lives in day=3; 0/1/2 untouched
    assert _rows(wh)["K3"] == (3, "patched")


def test_null_key_updates_fall_back_and_merge(wh, spark):
    """A null in the update key set disables the in-list pruning
    (null membership semantics) — the merge must still land via the
    full-scan path."""
    wh.upsert("ev", _mk(spark, [(None, 0, "nullkey"), ("K4", 0, "u4")]), "id")
    got = _rows(wh)
    assert got["K4"] == (0, "u4")
    assert got[None] == (0, "nullkey")


def test_over_cap_update_set_falls_back_and_merges(wh, spark, monkeypatch):
    monkeypatch.setattr(sv, "_MERGE_KEY_PRUNE_CAP", 3)
    ups = [(f"K{i}", i % 4, f"big{i}") for i in range(8)]  # 8 keys > cap 3
    wh.upsert("ev", _mk(spark, ups), "id")
    got = _rows(wh)
    assert all(got[f"K{i}"] == (i % 4, f"big{i}") for i in range(8))
