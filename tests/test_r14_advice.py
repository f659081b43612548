"""Round-14 ADVICE fixes, each pinned by the advisor's failure
scenario:

1. vacuum/commit race (medium): a commit whose staging dir is
   rmtree'd between the data-fsync phase and manifest link(2) — the
   exact window the advisor named, reachable because the slow commit
   phases don't bump mtimes — now FAILS LOUDLY with
   CommitFilesVanishedError and publishes nothing, instead of
   linking a manifest that references deleted files (a permanently
   unreadable snapshot). The vacuum grace default is also raised to
   24 h (Delta's equivalent is 7 days), far above any plausible
   commit duration, and a fresh orphan survives a default-args
   vacuum.
2. eUtils URL-too-long bail semantics (low): the reference exits(1)
   on BOTH url-length guards (db.py:314-317, db.py:356-359); the
   typed UrlTooLongError is now NON-strikeable — fetch_batches
   re-raises it immediately instead of counting a strike — while
   ordinary transport errors keep the two-strike policy.
3. train_bpe_merges O(steps^2) laziness (low): the loop
   re-localCheckpoints every _BPE_RECHECKPOINT_EVERY merges; the
   cadence must actually fire within TRAIN_BPE_STEPS so the gated
   plan exercises the re-checkpoint path (result parity with
   canonical BPE is pinned in test_r13_plans.py, which still runs).
"""

from __future__ import annotations

import inspect
import shutil

import pytest
from pyspark.sql import types as T

import compendium_spark.storage_versioned as sv
from compendium_spark.pipeline.enrichment import (
    TwoStrikeError,
    UrlTooLongError,
    build_esearch_url,
    fetch_batches,
    make_eutils_fetch,
)
from compendium_spark.plans.text import (
    _BPE_RECHECKPOINT_EVERY,
    TRAIN_BPE_STEPS,
)
from compendium_spark.storage_versioned import (
    CommitFilesVanishedError,
    VersionedWarehouse,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)


@pytest.fixture()
def wh(spark, tmp_path):
    w = VersionedWarehouse(
        spark, str(tmp_path / "wh"), extra_tables={"ev": EV_SCHEMA}
    )
    w.write("ev", spark.createDataFrame([("E1", "a"), ("E2", "b")], EV_SCHEMA))
    return w


# -- 1. vacuum/commit race ------------------------------------------------


def test_commit_fails_loudly_when_staging_vanishes_pre_publish(
    wh, spark, monkeypatch
):
    """Simulate the advisor's race: the staging dir is reclaimed
    (as vacuum's rmtree would) AFTER the data files are written +
    fsynced but BEFORE the manifest links. The commit must raise
    CommitFilesVanishedError, publish nothing, and leave the table
    readable at its prior version."""
    before = wh.latest("ev")
    real_fsync_tree = sv._fsync_tree

    def fsync_then_vacuum_races(ddir, stop_parent):
        real_fsync_tree(ddir, stop_parent)
        shutil.rmtree(ddir)  # the racing vacuum lands here

    monkeypatch.setattr(sv, "_fsync_tree", fsync_then_vacuum_races)
    with pytest.raises(CommitFilesVanishedError, match="vanished before publish"):
        wh.append("ev", spark.createDataFrame([("E3", "c")], EV_SCHEMA))
    monkeypatch.undo()
    # nothing published: version unchanged, no torn manifest, read OK
    assert wh.latest("ev") == before
    assert {r.id for r in wh.read("ev").collect()} == {"E1", "E2"}
    # and the table still accepts a clean commit afterwards
    wh.append("ev", spark.createDataFrame([("E3", "c")], EV_SCHEMA))
    assert {r.id for r in wh.read("ev").collect()} == {"E1", "E2", "E3"}


def test_vacuum_default_grace_is_24h_and_spares_fresh_orphans(wh, spark):
    """The default grace must sit far above any plausible commit
    duration (ADVICE r13; Delta's is 7 days). A just-created
    unpublished staging dir survives a default-args vacuum."""
    assert (
        inspect.signature(VersionedWarehouse.vacuum)
        .parameters["grace_seconds"]
        .default
        == 86400.0
    )
    wh.append("ev", spark.createDataFrame([("E3", "c")], EV_SCHEMA))
    # fabricate a fresh crashed-attempt orphan (parquet, no manifest)
    tdir = wh._tdir("ev")
    orphan = tdir / "data" / "99999999-orphan"
    orphan.mkdir(parents=True)
    (orphan / "part-00000.parquet").write_bytes(b"PAR1PAR1")
    wh.vacuum("ev", keep_last=1)  # default grace
    assert orphan.exists(), "fresh staging dir must survive default vacuum"


# -- 2. UrlTooLongError is non-strikeable ---------------------------------


def test_esearch_overlong_url_bails_before_any_fetch():
    with pytest.raises(UrlTooLongError, match="TOO LONG"):
        fetch_batches(
            [[f"SRS{i:09d}" for i in range(200)]],
            fetch=lambda url: pytest.fail("must bail before fetching"),
        )


def test_efetch_overlong_url_reraises_instead_of_striking():
    """A transport whose EFetch guard fires must abort fetch_batches
    IMMEDIATELY (reference db.py:356-359 exit(1)) — even on the first
    batch, with no prior strike, and with later batches pending."""
    webenv = "W" * 3000  # inflates the EFetch URL past 1950 chars
    es_xml = f"<eSearchResult><WebEnv>{webenv}</WebEnv></eSearchResult>"
    calls: list[str] = []

    def get(url):
        calls.append(url)
        return es_xml

    fetch = make_eutils_fetch(get=get, sleep=lambda s: None)
    with pytest.raises(UrlTooLongError):
        fetch_batches([["SRS001"], ["SRS002"]], fetch=fetch)
    # only the first batch's ESearch fired; nothing was skipped-and-
    # continued (that would have appended a second ESearch call)
    assert len(calls) == 1


def test_ordinary_transport_errors_keep_two_strike_policy():
    """Regression guard: non-UrlTooLong failures still strike —
    one failure skips, two consecutive failures abort."""
    boom = [True, False, True, True]  # batch 1 fails, 2 ok, 3+4 fail

    def fetch(url):
        if boom.pop(0):
            raise ConnectionError("transport down")
        return "<root></root>"

    with pytest.raises(TwoStrikeError):
        fetch_batches([["SRS1"], ["SRS2"], ["SRS3"], ["SRS4"]], fetch=fetch)


def test_url_too_long_is_a_valueerror_subtype():
    """Callers matching the pre-r14 ValueError keep working."""
    with pytest.raises(ValueError, match="TOO LONG"):
        build_esearch_url([f"SRS{i:09d}" for i in range(200)])


# -- 3. BPE re-checkpoint cadence -----------------------------------------


def test_bpe_recheckpoint_cadence_fires_within_gated_steps():
    """The re-checkpoint must actually execute in the gated plan run
    (step N, N < TRAIN_BPE_STEPS), so the O(steps^2)-laziness fix is
    exercised by the oracle gate, not just documented."""
    assert 1 <= _BPE_RECHECKPOINT_EVERY < TRAIN_BPE_STEPS
