"""Partition-pruned merge IO (VERDICT r9 #5): prove with file-level
evidence that `Warehouse.partial_update` on a partitioned table
rewrites ONLY the partitions holding updated keys — the property that
makes a per-project sweep O(project), not O(warehouse), at 100 TB.

Pinned on `samples` (partitioned by taxon — the fact table whose
enrichment sweeps are the scale concern) rather than `status`, which
stays deliberately unpartitioned: it is a |projects|-row control
table, and hive-partitioning it would make one directory per row.
"""

from __future__ import annotations

import datetime

import pytest

from compendium_spark.schemas import SAMPLES
from compendium_spark.storage import PARTITION_SPEC, Warehouse


def _mk_samples(spark, rows):
    return spark.createDataFrame(
        [
            (
                srs,
                project,
                taxon,
                None,
                None,
                None,
                None,
                None,
                None,
                None,
            )
            for srs, project, taxon in rows
        ],
        SAMPLES,
    )


def _snapshot(root):
    """relative file path -> (size, mtime_ns) for every data file."""
    return {
        str(p.relative_to(root)): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in root.rglob("*")
        if p.is_file() and not p.name.startswith("_")
    }


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "warehouse"))
    w.write(
        "samples",
        _mk_samples(
            spark,
            [
                ("SRS1", "PRJ1", "txidA"),
                ("SRS2", "PRJ1", "txidA"),
                ("SRS3", "PRJ2", "txidB"),
                ("SRS4", "PRJ2", "txidB"),
                ("SRS5", "PRJ3", "txidC"),
            ],
        ),
    )
    return w


def test_samples_is_partitioned(wh):
    assert PARTITION_SPEC["samples"] == "taxon"
    parts = {p.name for p in wh.path("samples").iterdir() if p.is_dir()}
    assert parts == {"taxon=txidA", "taxon=txidB", "taxon=txidC"}


def test_partial_update_rewrites_only_touched_partitions(wh, spark):
    """The IO contract: updating keys that live in ONE partition
    leaves every other partition's data files byte-identical
    (same names, sizes, mtimes) — they were never read wide, never
    rewritten."""
    before = _snapshot(wh.path("samples"))
    updates = spark.createDataFrame(
        [("SRS3", "AMPLICON")], "srs string, library_strategy string"
    )
    wh.partial_update("samples", updates, key="srs")
    after = _snapshot(wh.path("samples"))

    untouched_before = {k: v for k, v in before.items() if "taxon=txidB" not in k}
    untouched_after = {k: v for k, v in after.items() if "taxon=txidB" not in k}
    assert untouched_before == untouched_after, (
        "files outside the touched partition were rewritten"
    )
    touched_after = {k for k in after if "taxon=txidB" in k}
    touched_before = {k: v for k, v in before.items() if "taxon=txidB" in k}
    assert {
        k for k in touched_after if touched_before.get(k) == after[k]
    } != touched_after, "the touched partition was not rewritten"

    # and the merge itself is correct: non-null field overwrote, the
    # sibling row in the same partition survived untouched
    rows = {r.srs: r for r in wh.read("samples").collect()}
    assert rows["SRS3"].library_strategy == "AMPLICON"
    assert rows["SRS3"].project == "PRJ2"  # unmentioned column kept
    assert rows["SRS4"].library_strategy is None
    assert len(rows) == 5


def test_partial_update_unknown_key_is_noop(wh, spark):
    """The reference's silently-no-op UPDATE (SURVEY §7.4): an update
    for an unknown key touches NOTHING — no partition is rewritten."""
    before = _snapshot(wh.path("samples"))
    updates = spark.createDataFrame(
        [("SRS999", "AMPLICON")], "srs string, library_strategy string"
    )
    wh.partial_update("samples", updates, key="srs")
    assert _snapshot(wh.path("samples")) == before


def test_partial_update_rejects_partition_column_change(wh, spark):
    """Rows must never MOVE partitions under a pruned merge: updating
    the partition column is refused loudly."""
    updates = spark.createDataFrame(
        [("SRS3", "txidZ")], "srs string, taxon string"
    )
    with pytest.raises(ValueError, match="partition column"):
        wh.partial_update("samples", updates, key="srs")


def test_partial_update_multi_partition_touch(wh, spark):
    """Updates spanning two taxa rewrite exactly those two partitions."""
    before = _snapshot(wh.path("samples"))
    ts = datetime.datetime(2021, 3, 4, tzinfo=datetime.timezone.utc)
    updates = spark.createDataFrame(
        [("SRS1", ts), ("SRS5", ts)], "srs string, pubdate timestamp"
    )
    wh.partial_update("samples", updates, key="srs")
    after = _snapshot(wh.path("samples"))
    same = {k: v for k, v in before.items() if "taxon=txidB" in k}
    assert {k: v for k, v in after.items() if "taxon=txidB" in k} == same
    got = {r.srs: r.pubdate for r in wh.read("samples").collect()}
    assert got["SRS1"] is not None and got["SRS5"] is not None
    assert got["SRS2"] is None


def test_upsert_partition_move_no_duplicate(wh, spark):
    """ADVICE r10 #1: a full-row upsert that moves a key to a NEW
    taxon must remove the old row from its old partition — the merged
    set includes the partitions currently holding the updated keys,
    not just the partitions named by the updates."""
    updates = _mk_samples(spark, [("SRS1", "PRJ1", "txidZ")])
    wh.upsert("samples", updates, key="srs")
    rows = wh.read("samples").collect()
    assert len(rows) == 5, "moved key duplicated across partitions"
    by_key = {r.srs: r.taxon for r in rows}
    assert by_key["SRS1"] == "txidZ"
    assert by_key["SRS2"] == "txidA"  # sibling stayed put


def test_upsert_move_empties_source_partition(wh, spark):
    """Moving the ONLY row out of a partition deletes that partition's
    directory — Spark writes no staging dir for an empty partition, so
    the swap must clean up explicitly or stale rows survive."""
    updates = _mk_samples(spark, [("SRS5", "PRJ3", "txidA")])
    wh.upsert("samples", updates, key="srs")
    parts = {p.name for p in wh.path("samples").iterdir() if p.is_dir()}
    assert "taxon=txidC" not in parts, "emptied partition left on disk"
    rows = {r.srs: r.taxon for r in wh.read("samples").collect()}
    assert rows == {
        "SRS1": "txidA",
        "SRS2": "txidA",
        "SRS3": "txidB",
        "SRS4": "txidB",
        "SRS5": "txidA",
    }


def test_upsert_partition_stable_prunes_io(wh, spark):
    """A partition-stable upsert (key stays in its taxon) still only
    rewrites the touched partition — the move guard's key→partition
    mapping scan must not widen the write set."""
    before = _snapshot(wh.path("samples"))
    updates = _mk_samples(spark, [("SRS3", "PRJ2-renamed", "txidB")])
    wh.upsert("samples", updates, key="srs")
    after = _snapshot(wh.path("samples"))
    same_before = {k: v for k, v in before.items() if "taxon=txidB" not in k}
    same_after = {k: v for k, v in after.items() if "taxon=txidB" not in k}
    assert same_before == same_after, "untouched partitions rewritten"
    rows = {r.srs: r.project for r in wh.read("samples").collect()}
    assert rows["SRS3"] == "PRJ2-renamed"
    assert len(rows) == 5


def test_upsert_new_key_new_partition(wh, spark):
    """Inserting a brand-new key under a brand-new taxon creates its
    partition without touching the rest."""
    before = _snapshot(wh.path("samples"))
    updates = _mk_samples(spark, [("SRS9", "PRJ9", "txidQ")])
    wh.upsert("samples", updates, key="srs")
    after = _snapshot(wh.path("samples"))
    old = {k: v for k, v in after.items() if "taxon=txidQ" not in k}
    assert old == before
    assert len(wh.read("samples").collect()) == 6
