"""Round-13 ADVICE fixes on the versioned warehouse, each pinned by
the failure scenario the advisor described:

1. _rebase_target on a NON-STRING partition column: path-derived
   values (strings) vs typed touched values compared apples-to-apples
   via Spark's cast-to-string rendering — a rival file added INSIDE a
   touched int partition is a real conflict, not a silent rebase that
   duplicates keys.
2. _hint_excludes kind-tag conservatism: a cross-typed point probe
   (int column probed with '5') keeps the file, because Spark's
   residual filter COERCES and would match — same conservatism the
   min/max path already had via TypeError.
3. vacuum grace window: an unpublished (never-in-a-manifest) staging
   dir younger than grace_seconds survives vacuum; past the window it
   is reclaimed as a crashed-attempt orphan. Published dirs emptied by
   the manifest-driven unlink still prune immediately.
4. table_changes duplicate-key detection: the full-outer key join
   fans out on duplicate keys, so the default path raises instead of
   emitting spurious update pairs; check_unique=False opts out.
5. durable publish helpers (_fsync_tree/_fsync_dir) walk a staged
   tree without error (the power-loss semantics themselves are not
   testable in-process).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import types as T

from compendium_spark.storage_versioned import (
    VersionConflictError,
    VersionedWarehouse,
    _fsync_dir,
    _fsync_tree,
    _hint_excludes,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("val", T.StringType()),
    ]
)


@pytest.fixture()
def intwh(spark, tmp_path):
    """Warehouse with a table PARTITIONED ON AN INT column, in the
    hive layout (spec set, then compacted so every file is keyed)."""
    w = VersionedWarehouse(
        spark,
        str(tmp_path / "intwh"),
        extra_tables={"ev": EV_SCHEMA},
        hint_columns={"ev": ["bucket"]},
    )
    df = spark.createDataFrame(
        [("E1", 1, "a"), ("E2", 1, "b"), ("E3", 2, "c"), ("E4", 3, "d")],
        EV_SCHEMA,
    )
    w.write("ev", df)
    w.set_partition_spec("ev", "bucket")
    w.compact("ev")  # migrate every file into the bucket=N layout
    return w


def _rows(w, name="ev", version=None):
    return {
        r.id: (r.bucket, r.val) for r in w.read(name, version).collect()
    }


def test_rebase_conflicts_on_rival_inside_touched_int_partition(
    intwh, spark
):
    """ADVICE r12 #1 failure scenario: int partition column; rival
    APPENDS a row in bucket=1; we upsert a row in bucket=1 prepared
    against the stale base. Comparing typed 1 against path-derived
    "1" was always-False, so the merge rebased over the rival —
    duplicating any key both sides insert. Must conflict instead."""
    base = intwh.latest("ev")
    intwh.append(
        "ev", spark.createDataFrame([("E5", 1, "rival")], EV_SCHEMA)
    )
    with pytest.raises(VersionConflictError):
        intwh.upsert(
            "ev",
            spark.createDataFrame([("E5", 1, "ours")], EV_SCHEMA),
            "id",
            base_version=base,
        )
    st = _rows(intwh)
    assert st["E5"] == (1, "rival")  # rival intact, no duplicate E5
    assert len(st) == 5


def test_rebase_still_lands_disjoint_int_partitions(intwh, spark):
    """The normalization must not over-refuse: disjoint int partitions
    still rebase and both commits land (the r11 Iceberg behavior)."""
    base = intwh.latest("ev")
    intwh.upsert(
        "ev", spark.createDataFrame([("E3", 2, "rival")], EV_SCHEMA), "id"
    )
    v = intwh.upsert(
        "ev",
        spark.createDataFrame([("E1", 1, "ours")], EV_SCHEMA),
        "id",
        base_version=base,
    )
    assert v == intwh.latest("ev")
    st = _rows(intwh)
    assert st["E3"] == (2, "rival")
    assert st["E1"] == (1, "ours")


def test_hint_keeps_file_on_cross_typed_point_probe(intwh):
    """An int-typed hinted column probed with the STRING form of a
    stored value: Spark's filter coerces and matches, so the hint must
    not prune — the read returns the row either way."""
    v = intwh.latest("ev")
    # string probe of int column: rows with bucket=2 must survive
    got = {
        r.id
        for r in intwh.read("ev", v, where=[("bucket", "=", "2")]).collect()
    }
    assert got == {"E3"}
    kept, _ = intwh.scan_files("ev", v, where=[("bucket", "=", "2")])
    assert any("bucket=2" in f for f in kept)


def test_hint_excludes_kind_tags_unit():
    """Unit pin of the kind-tag rules across dict and bloom hints."""
    d5 = {"dict": ["n:5", "n:7"]}
    assert _hint_excludes(d5, "=", 6) is True  # same-kind miss: prune
    assert _hint_excludes(d5, "=", 5) is False  # hit: keep
    assert _hint_excludes(d5, "=", "5") is False  # cross-kind: keep
    assert _hint_excludes(d5, "in", [6, "9"]) is False  # any cross: keep
    assert _hint_excludes({"dict": []}, "=", 5) is True  # all-null file
    # bloom without recorded kinds (pre-fix manifests) never prunes
    legacy = {"bloom": {"m": 4096, "k": 5, "hex": "0"}}
    assert _hint_excludes(legacy, "=", 5) is False
    # bloom WITH kinds prunes same-kind misses, keeps cross-kind
    tagged = {"bloom": {"m": 4096, "k": 5, "hex": "0", "kinds": ["n"]}}
    assert _hint_excludes(tagged, "=", 5) is True  # empty bloom: miss
    assert _hint_excludes(tagged, "=", "5") is False  # cross-kind


def test_vacuum_grace_protects_fresh_unpublished_dir(intwh, spark):
    """A never-published dir (a concurrent writer's staging, or a
    crashed attempt) younger than the grace window must survive
    vacuum; with the window at 0 it reclaims as an orphan. Published
    dirs emptied by the unlink pass still prune immediately."""
    intwh.append(
        "ev", spark.createDataFrame([("E9", 9, "z")], EV_SCHEMA)
    )
    data = intwh._tdir("ev") / "data"
    staging = data / "v00000099-feedfacecafe"
    (staging / "bucket=7").mkdir(parents=True)
    (staging / "bucket=7" / "part-0.parquet").write_bytes(b"not yet")
    before = {d.name for d in data.iterdir()}
    intwh.vacuum("ev", keep_last=1)  # default grace: staging survives
    assert staging.exists()
    # every dir dropped by this vacuum was a published (manifest-
    # listed) dir — the immediate-prune path still works
    after = {d.name for d in data.iterdir()}
    assert staging.name in after and after < before
    intwh.vacuum("ev", keep_last=1, grace_seconds=0)
    assert not staging.exists()  # orphan reclaimed past the window


@pytest.fixture()
def vwh(spark, tmp_path):
    from tests.test_storage_versioned import BASE, _mk_samples

    w = VersionedWarehouse(spark, str(tmp_path / "vwh"))
    assert w.write("samples", _mk_samples(spark, BASE)) == 0
    return w


def test_table_changes_raises_on_duplicate_keys(vwh, spark):
    """Two rows sharing a key inside the changed slice: the feed
    would fan out (pre x post per key) — default raises, opt-out
    returns the fanned-out frame for callers that accept it."""
    from tests.test_storage_versioned import _mk_samples

    dup = _mk_samples(
        spark, [("SRSX", "P", "t1", None), ("SRSX", "P", "t2", None)]
    )
    v0 = vwh.latest("samples")
    v1 = vwh.append("samples", dup)
    with pytest.raises(ValueError, match="duplicate key"):
        vwh.table_changes("samples", v0, v1, "srs")
    out = vwh.table_changes("samples", v0, v1, "srs", check_unique=False)
    assert out.count() >= 2  # caller-accepted fan-out still computes


def test_fsync_helpers_walk_staged_tree(tmp_path):
    d = tmp_path / "data" / "v00000000-abc" / "bucket=1"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"x")
    _fsync_tree(tmp_path / "data" / "v00000000-abc", tmp_path / "data")
    _fsync_dir(tmp_path)


def test_vacuum_grace_measures_newest_mtime(intwh, spark, tmp_path):
    """The grace clock runs on the NEWEST entry in the dir tree: an
    old dir that just received a file is still live staging."""
    data = intwh._tdir("ev") / "data"
    staging = data / "v00000098-0123456789ab"
    staging.mkdir()
    old = time.time() - 7200
    import os

    os.utime(staging, (old, old))
    part = staging / "part-0.parquet"
    part.write_bytes(b"fresh write")  # now-mtime file inside old dir
    intwh.vacuum("ev", keep_last=1, grace_seconds=600)
    assert staging.exists()


def test_table_changes_below_vacuum_horizon_raises_typed(vwh, spark):
    """VERDICT r12 #6: the typed below-horizon error covers the CDF
    path like it covers read(); and CDF between two RETAINED versions
    still works after vacuum (removed files of retained manifests are
    never reclaimed — only sub-horizon files are)."""
    from compendium_spark.storage_versioned import SnapshotNotFoundError
    from tests.test_storage_versioned import _mk_samples

    for i in range(3):
        vwh.append(
            "samples", _mk_samples(spark, [(f"SRSV{i}", "P", "t", None)])
        )
    vwh.vacuum("samples", keep_last=2)
    with pytest.raises(SnapshotNotFoundError):
        vwh.table_changes("samples", 0, 3, "srs")
    vs = vwh.versions("samples")
    assert len(vs) == 2
    feed = vwh.table_changes("samples", vs[0], vs[1], "srs")
    assert {r._change_type for r in feed.collect()} == {"insert"}
