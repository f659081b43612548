"""VERDICT r13 #7: contended-writer soak on VersionedWarehouse.

The r13 additions (typed-partition rebase, durable publish, vacuum
grace, CDF dup-key guard) are composed here under MORE concurrency
than the 3-replica exactly-once test: hypothesis draws each writer's
op schedule, then SIX concurrent actors execute it against one
warehouse — three disjoint-partition writers (upsert/delete in their
own partition — the auto-rebase path), one shared-partition writer
pack folded into the same threads (upsert/partial_update on common
keys in a common partition — genuine conflicts, application-level
retry), a VACUUM thread trimming history mid-flight, and a CDF
reader diffing retained snapshots while they are being created and
destroyed.

The invariant net is interleaving-independent, so the test is stable
under any real schedule:
  * every effectful op commits at a UNIQUE version and the committed
    versions are exactly 1..latest — no lost update, no doubled
    commit, under races + rebases + retries + vacuum;
  * replaying the op log in COMMIT-VERSION order through the Python
    model reproduces the final table exactly (disjoint rebases must
    commute; shared-partition ops must serialize) — this is the
    linearizability check;
  * every version still retained after the vacuum storm time-travels
    to the replayed prefix state;
  * CDF feeds between retained snapshots replay the pre state into
    the post state (insert/delete/update_pre/update_post row
    algebra), exactly as the sequential model test pins — but here
    the snapshots were produced under contention;
  * the concurrent CDF reader may only ever fail with
    SnapshotNotFoundError (vacuum won the race) — anything else is a
    conflict-window bug this soak exists to catch.
"""

from __future__ import annotations

import threading
import traceback

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from compendium_spark.schemas import SAMPLES  # noqa: E402
from compendium_spark.storage_versioned import (  # noqa: E402
    SnapshotNotFoundError,
    VersionConflictError,
    VersionedWarehouse,
)

# CI defaults are modest (each op is a real Spark commit); the
# extended hunt cranks these via env, e.g.
#   SOAK_WRITERS=6 SOAK_MAX_OPS=6 SOAK_EXAMPLES=5 pytest ...
import os  # noqa: E402

N_WRITERS = int(os.environ.get("SOAK_WRITERS", "4"))
MAX_OPS = int(os.environ.get("SOAK_MAX_OPS", "4"))
N_EXAMPLES = int(os.environ.get("SOAK_EXAMPLES", "3"))
MAX_RETRIES = 60
SHARED_KEYS = ["SH0", "SH1", "SH2"]

# each writer draws 2..4 ops; "up_own"/"del_own" live in the writer's
# private partition (disjoint — the auto-rebase path must land them
# without surfacing VersionConflictError... except via delete, which
# has no rebase and retries at this level), "up_shared"/
# "partial_shared" all hit partition txidSH (genuine conflicts)
_wop = st.sampled_from(["up_own", "del_own", "up_shared", "partial_shared"])
_schedule = st.lists(
    st.lists(_wop, min_size=2, max_size=MAX_OPS),
    min_size=N_WRITERS,
    max_size=N_WRITERS,
)


def _full(spark, rows):
    """(srs, taxon, strat) rows in the SAMPLES schema, 1 slice."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [
                (s, "P", t, None, g, None, None, None, None, None)
                for s, t, g in rows
            ],
            1,
        ),
        SAMPLES,
    )


def _observed(vwh, version=None):
    return {
        r.srs: (r.taxon, r.library_strategy)
        for r in vwh.read("samples", version).collect()
    }


def _retrying(fn):
    """Application-level optimistic-concurrency loop: genuine
    overlaps raise VersionConflictError and the op re-reads latest."""
    for _ in range(MAX_RETRIES):
        try:
            return fn()
        except VersionConflictError:
            continue
    raise AssertionError("retry budget exhausted — livelock?")


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(schedule=_schedule)
def test_contended_soak_matches_serial_replay(
    spark, tmp_path_factory, schedule
):
    vwh = VersionedWarehouse(
        spark, str(tmp_path_factory.mktemp("soak") / "vwh")
    )
    # seed: every writer's own key + every shared key exist, so
    # del_own/partial_shared always have a live target (writer-local
    # aliveness is tracked below for re-deletes)
    seed = [(f"D{i}", f"txidD{i}", "s") for i in range(N_WRITERS)] + [
        (k, "txidSH", "s") for k in SHARED_KEYS
    ]
    assert vwh.write("samples", _full(spark, seed)) == 0

    log: list[tuple[int, str, int, int]] = []  # (version, kind, i, b)
    log_lock = threading.Lock()
    errors: list[str] = []  # formatted tracebacks
    done = threading.Event()

    def writer(i: int) -> None:
        own_alive = True
        try:
            for b, kind in enumerate(schedule[i]):
                if kind == "del_own" and not own_alive:
                    kind = "up_own"  # normalize: only delete live keys
                if kind == "up_own":
                    v = _retrying(
                        lambda: vwh.upsert(
                            "samples",
                            _full(
                                spark, [(f"D{i}", f"txidD{i}", f"b{b}")]
                            ),
                            "srs",
                        )
                    )
                    own_alive = True
                elif kind == "del_own":
                    v = _retrying(
                        lambda: vwh.delete(
                            "samples", [("srs", "=", f"D{i}")]
                        )
                    )
                    own_alive = False
                elif kind == "up_shared":
                    k = SHARED_KEYS[(i + b) % len(SHARED_KEYS)]
                    v = _retrying(
                        lambda: vwh.upsert(
                            "samples",
                            _full(spark, [(k, "txidSH", f"w{i}b{b}")]),
                            "srs",
                        )
                    )
                else:  # partial_shared
                    k = SHARED_KEYS[(i + b) % len(SHARED_KEYS)]
                    v = _retrying(
                        lambda: vwh.partial_update(
                            "samples",
                            spark.createDataFrame(
                                [(k, f"p{i}{b}")],
                                "srs string, library_strategy string",
                            ),
                            key="srs",
                        )
                    )
                with log_lock:
                    log.append((v, kind, i, b))
        except BaseException:  # noqa: BLE001 — surface to main
            errors.append(traceback.format_exc())

    def vacuumer() -> None:
        # trim history while commits are racing; keep_last is wide
        # enough that no in-flight writer's base drops below horizon
        try:
            while not done.wait(0.4):
                vwh.vacuum("samples", keep_last=8)
        except BaseException:  # noqa: BLE001
            errors.append(traceback.format_exc())

    def cdf_reader() -> None:
        # diff retained snapshots WHILE they are created/destroyed;
        # the only legal failures are losing the race to vacuum —
        # either at manifest resolution (SnapshotNotFoundError) or
        # mid-job, when vacuum unlinks a resolved snapshot's data
        # files under the running scan (Spark FAILED_READ_FILE).
        # The latter is Delta's documented VACUUM trade-off: readers
        # below the horizon may fail and must retry on a retained
        # snapshot; it cannot be typed at plan time because the scan
        # is lazy. Anything else is a real bug and re-raises.
        try:
            while not done.wait(0.3):
                vs = vwh.versions("samples")
                if len(vs) < 2:
                    continue
                try:
                    vwh.table_changes(
                        "samples", vs[0], vs[-1], "srs"
                    ).count()
                except SnapshotNotFoundError:
                    pass
                except Exception as exc:  # noqa: BLE001
                    msg = str(exc)
                    if (
                        "FAILED_READ_FILE" not in msg
                        and "does not exist" not in msg
                    ):
                        raise
        except BaseException:  # noqa: BLE001
            errors.append(traceback.format_exc())

    threads = [
        threading.Thread(target=writer, args=(i,))
        for i in range(N_WRITERS)
    ] + [
        threading.Thread(target=vacuumer),
        threading.Thread(target=cdf_reader),
    ]
    for t in threads:
        t.start()
    for t in threads[:N_WRITERS]:
        t.join()
    done.set()
    for t in threads[N_WRITERS:]:
        t.join()
    assert not errors, errors

    # 1) exactly-once commits: unique versions, contiguous 1..latest
    versions = [v for v, *_ in log]
    assert len(set(versions)) == len(versions), "two ops share a version"
    assert set(versions) == set(range(1, vwh.latest("samples") + 1))

    # 2) linearizability: serial replay in commit order == final table
    model = {s: (t, g) for s, t, g in seed}
    prefix: dict[int, dict] = {0: dict(model)}
    for v, kind, i, b in sorted(log):
        if kind == "up_own":
            model[f"D{i}"] = (f"txidD{i}", f"b{b}")
        elif kind == "del_own":
            model.pop(f"D{i}", None)
        elif kind == "up_shared":
            model[SHARED_KEYS[(i + b) % 3]] = ("txidSH", f"w{i}b{b}")
        else:
            k = SHARED_KEYS[(i + b) % 3]
            model[k] = (model[k][0], f"p{i}{b}")
        prefix[v] = dict(model)
    assert _observed(vwh) == model

    # 3) time travel: every retained version == its replayed prefix
    retained = vwh.versions("samples")
    for v in retained:
        assert _observed(vwh, v) == prefix[v], f"version {v}"

    # 4) CDF row algebra between consecutive retained snapshots
    for v_from, v_to in zip(retained, retained[1:]):
        cur = dict(prefix[v_from])
        for row in vwh.table_changes(
            "samples", v_from, v_to, "srs"
        ).collect():
            t = (row.taxon, row.library_strategy)
            if row._change_type == "insert":
                cur[row.srs] = t
            elif row._change_type == "delete":
                assert cur.pop(row.srs) == t
            elif row._change_type == "update_preimage":
                assert cur[row.srs] == t
            elif row._change_type == "update_postimage":
                cur[row.srs] = t
        assert cur == prefix[v_to], (v_from, v_to)


# ---------------------------------------------------------------------------
# streaming exactly-once × vacuum × CDF (the 3-replica test, contended)
# ---------------------------------------------------------------------------

from datetime import datetime  # noqa: E402

from compendium_spark.streaming.windows import (  # noqa: E402
    MV_HOURLY_SCHEMA,
    mv_refresh_versioned_sink,
)

H0 = datetime(2024, 1, 1, 10)
H1 = datetime(2024, 1, 1, 11)
BATCH_SCHEMA = "hour timestamp, event_type string, value double"
MV_BATCHES = [
    (0, [(H0, "click", 1.0), (H0, "click", 2.0)]),
    (1, [(H0, "view", 5.0)]),
    (2, [(H0, "click", 4.0), (H0, "view", 0.5)]),
    (3, [(H1, "click", 3.0)]),
    (4, [(H0, "click", 1.5), (H1, "view", 2.5)]),
]
N_REPLICAS = int(os.environ.get("SOAK_REPLICAS", "5"))


def test_streaming_exactly_once_under_vacuum_and_cdf(spark, tmp_path):
    """The exactly-once foreachBatch protocol (txn high-water +
    pinned-base commits) composed with the r14-hardened VACUUM and a
    concurrent CDF/time-travel reader — the contended variant of
    test_streaming_mv_sink.py::test_concurrent_replicas_fold_exactly_once
    (VERDICT r13 #7's named target), two replicas and two actor kinds
    bigger. FIVE replicas each deliver ALL five batches (the
    at-least-once worst case: every batch replayed by every replica),
    a vacuum thread trims the MV table's history mid-fold, and a
    reader time-travels retained snapshots and replays the CDF feed
    while they are being created and destroyed. Must hold: the final
    MV equals one clean fold (each batch id folded EXACTLY once
    across 25 deliveries), the txn high-water is the last batch id,
    the reader only ever loses to vacuum (SnapshotNotFoundError /
    mid-job FAILED_READ_FILE — Delta's documented VACUUM trade-off),
    and vacuum itself never errors."""
    root = str(tmp_path / "vwh")

    def handle():
        return VersionedWarehouse(
            spark, root, extra_tables={"mv_hourly": MV_HOURLY_SCHEMA}
        )

    errors: list[str] = []
    done = threading.Event()

    def replica() -> None:
        try:
            sink = mv_refresh_versioned_sink(handle())
            for bid, rows in MV_BATCHES:
                sink(spark.createDataFrame(rows, BATCH_SCHEMA), bid)
        except BaseException:  # noqa: BLE001
            errors.append(traceback.format_exc())

    def vacuumer() -> None:
        try:
            wh = handle()
            while not done.wait(0.3):
                if wh.latest("mv_hourly") is not None:
                    wh.vacuum("mv_hourly", keep_last=8)
        except BaseException:  # noqa: BLE001
            errors.append(traceback.format_exc())

    def reader() -> None:
        try:
            wh = handle()
            while not done.wait(0.2):
                vs = wh.versions("mv_hourly")
                if len(vs) < 2:
                    continue
                try:
                    wh.read("mv_hourly", vs[0]).collect()
                    wh.table_changes(
                        "mv_hourly", vs[0], vs[-1],
                        ["hour", "event_type"],
                    ).count()
                except SnapshotNotFoundError:
                    pass
                except Exception as exc:  # noqa: BLE001
                    msg = str(exc)
                    if (
                        "FAILED_READ_FILE" not in msg
                        and "does not exist" not in msg
                    ):
                        raise
        except BaseException:  # noqa: BLE001
            errors.append(traceback.format_exc())

    threads = [
        threading.Thread(target=replica) for _ in range(N_REPLICAS)
    ] + [threading.Thread(target=vacuumer), threading.Thread(target=reader)]
    for t in threads:
        t.start()
    for t in threads[:N_REPLICAS]:
        t.join()
    done.set()
    for t in threads[N_REPLICAS:]:
        t.join()
    assert not errors, errors

    vwh = handle()
    got = {
        (r.hour, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in vwh.read("mv_hourly").collect()
    }
    assert got == {
        (H0, "click"): (4, 8.5),
        (H0, "view"): (2, 5.5),
        (H1, "click"): (1, 3.0),
        (H1, "view"): (1, 2.5),
    }
    assert vwh.last_txn_version("mv_hourly", "mv_fold") == 4
