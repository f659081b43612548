"""Micro-batch behavior of the stateful streaming operators, pinned
via the progress/state-store metrics API (r6 verdict #8: the plan
audit cannot see through a streaming sink, so the per-batch state
metrics are asserted here instead).

Strategy: stage `events` into 4 time-range parquet files with
increasing mtimes, stream them with maxFilesPerTrigger=1 (4 real
micro-batches), and assert
  * every staged file became a micro-batch with its rows accounted,
  * the state store holds exactly the expected keys (SCD2: one open
    interval per user),
  * the multi-batch result equals the same transform run in a single
    batch (replay/cut invariance — the property that makes the
    append-mode contract trustworthy).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from compendium_spark.streaming.windows import (
    dedup_transform,
    enrich_dim,
    enrich_join_transform,
    interval_join_transform,
    mv_refresh_updates,
    run_mv_refresh,
    running_totals_transform,
    scd2_transform,
    session_windows_transform,
    sliding_counts_transform,
    tumbling_counts_transform,
)
from compendium_spark.tables import load

from .conftest import SF_SMOKE


def _stage_files(spark, tmpdir: str, n_files: int) -> tuple[str, int, int]:
    """Split events into n_files contiguous time ranges, one parquet
    file each, mtimes increasing in time order. Returns (src_dir,
    n_events, n_users)."""
    ev = load(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    src = os.path.join(tmpdir, "src")
    os.makedirs(src, exist_ok=True)
    # contiguous time ranges: percentile cuts on event time (µs)
    if n_files > 1:
        qs = [i / n_files for i in range(1, n_files)]
        (ts_cuts,) = ev.select(
            F.expr(
                "percentile(unix_micros(ts), array({}))".format(
                    ",".join(str(q) for q in qs)
                )
            )
        ).first()
    else:
        ts_cuts = []
    bounds = [float("-inf"), *ts_cuts, float("inf")]
    base = time.time() - 3600
    for i in range(n_files):
        part = ev.filter(
            (F.unix_micros("ts") >= F.lit(bounds[i]))
            & (F.unix_micros("ts") < F.lit(bounds[i + 1]))
        )
        stage = os.path.join(tmpdir, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        (pf,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.move(os.path.join(stage, pf), dst)
        os.utime(dst, (base + 60 * i, base + 60 * i))
    return src, n_events, n_users


def _run(spark, src: str, transform, name: str, mode: str):
    schema = spark.read.parquet(src).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        transform(ev)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    return spark.sql(f"SELECT * FROM {name}"), batches


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("stream_progress"))
    src4, n_events, n_users = _stage_files(spark, tmpdir, 4)
    src1, _, _ = _stage_files(spark, os.path.join(tmpdir, "one"), 1)
    return src4, src1, n_events, n_users


class TestScd2Microbatches:
    def test_state_and_batch_accounting(self, spark, staged):
        src4, _src1, n_events, n_users = staged
        out, batches = _run(spark, src4, scd2_transform, "scd2_mb", "append")
        assert len(batches) == 4  # one micro-batch per staged file
        assert sum(p["numInputRows"] for p in batches) == n_events
        # SCD2 state = exactly one open-interval row per user seen so
        # far; by the last batch, every user
        so_final = batches[-1]["stateOperators"][0]
        assert so_final["numRowsTotal"] == n_users
        # every batch touches state (events in every time slice)
        for p in batches:
            assert p["stateOperators"][0]["numRowsUpdated"] > 0
        out.collect()  # materialized for the invariance test below

    def test_multibatch_equals_single_batch(self, spark, staged):
        src4, src1, _n_events, _n_users = staged
        multi, batches4 = _run(spark, src4, scd2_transform, "scd2_m4", "append")
        single, batches1 = _run(spark, src1, scd2_transform, "scd2_m1", "append")
        assert len(batches4) == 4 and len(batches1) == 1
        key = ["user_id", "version", "status", "valid_from", "valid_to"]
        assert sorted(map(tuple, multi.select(key).collect())) == sorted(
            map(tuple, single.select(key).collect())
        )


class TestSessionWindowMicrobatches:
    def test_state_metrics_across_batches(self, spark, staged):
        src4, _src1, n_events, _n_users = staged
        out, batches = _run(
            spark, src4, session_windows_transform, "sess_mb", "complete"
        )
        assert len(batches) == 4
        assert sum(p["numInputRows"] for p in batches) == n_events
        for p in batches:
            assert p["stateOperators"][0]["numRowsTotal"] > 0
        # complete-mode sink holds the final merged sessions
        assert out.count() == out.select("session_start", "user_id").distinct().count()

    def test_streamed_sessions_equal_batch_sessions(self, spark, staged):
        src4, _src1, _n, _u = staged
        out, _batches = _run(
            spark, src4, session_windows_transform, "sess_eq", "complete"
        )
        batch = session_windows_transform(spark.read.parquet(src4))
        key = ["session_start", "session_end", "user_id", "n_events"]
        assert sorted(map(tuple, out.select(key).collect())) == sorted(
            map(tuple, batch.select(key).collect())
        )


class TestIntervalJoinMicrobatches:
    """r7 verdict #6: the interval join is the plan with four state
    buffers per partition — pin its per-batch accounting, the
    watermark bound on the join buffers, and cut-invariance, against
    the REGISTERED transform (interval_join_transform), not a local
    copy."""

    def test_join_state_and_batch_accounting(self, spark, staged):
        src4, _src1, n_events, _u = staged
        multi, batches = _run(
            spark, src4, interval_join_transform, "ij_m4", "append"
        )
        assert len(batches) >= 3  # both sources drain file-per-trigger
        # every staged row enters exactly one micro-batch per source
        # scan (the self-join plans two scans of the file source)
        total_in = sum(p["numInputRows"] for p in batches)
        assert total_in >= n_events
        n_vc = (
            spark.read.parquet(src4)
            .filter(F.col("event_type").isin("view", "click"))
            .count()
        )
        for p in batches:
            so = p["stateOperators"][0]
            # the join keeps buffered rows in state every batch...
            assert so["numRowsTotal"] > 0
            # ...but never more than the view+click rows ingested so
            # far (both buffers together) — state is join-input-bounded
            assert so["numRowsTotal"] <= n_vc

    def test_watermark_evicts_join_state(self, spark, staged):
        """After draining, the buffers must NOT hold the whole stream:
        rows older than the final watermark minus the 30-minute match
        horizon are evicted — the property that makes the state
        O(horizon) instead of O(stream)."""
        src4, _src1, _n, _u = staged
        _out, batches = _run(
            spark, src4, interval_join_transform, "ij_evict", "append"
        )
        n_vc = (
            spark.read.parquet(src4)
            .filter(F.col("event_type").isin("view", "click"))
            .count()
        )
        final = batches[-1]["stateOperators"][0]
        assert final["numRowsRemoved"] > 0 or final["numRowsTotal"] < n_vc
        # the events fixture spans days; a 40-minute horizon must keep
        # well under half the join input resident at the end
        assert final["numRowsTotal"] < 0.5 * n_vc

    def test_multibatch_equals_single_batch_and_batch_join(self, spark, staged):
        src4, src1, _n, _u = staged
        multi, _b = _run(spark, src4, interval_join_transform, "ij_c4", "append")
        single, _b1 = _run(spark, src1, interval_join_transform, "ij_c1", "append")
        got_multi = sorted(map(tuple, multi.collect()))
        assert got_multi == sorted(map(tuple, single.collect()))
        # and both equal the batch range join over the same files
        batch = interval_join_transform(spark.read.parquet(src4))
        assert got_multi == sorted(map(tuple, batch.collect()))


class TestMvRefreshMicrobatches:
    """r7 verdict #6 (second half): the foreachBatch MV maintenance
    has no state store (its state is the driver-side MV), so the pins
    are per-batch input accounting and the add-merge fold invariant:
    the MV after N micro-batches equals the single-batch MV equals
    the batch aggregate."""

    def test_batch_accounting_and_fold_invariance(self, spark, staged):
        src4, src1, n_events, _u = staged
        schema = spark.read.parquet(src4).schema

        def updates(src):
            ev = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            return mv_refresh_updates(ev)

        state4, prog4 = run_mv_refresh(updates(src4))
        state1, prog1 = run_mv_refresh(updates(src1))
        assert len(prog4) == 4 and len(prog1) == 1
        assert sum(p["numInputRows"] for p in prog4) == n_events
        # add-merge fold is cut-invariant
        assert state4 == state1
        # and equals the batch aggregate over the same files
        batch = (
            mv_refresh_updates(spark.read.parquet(src4))
            .groupBy("hour", "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        )
        expect = {(r.hour, r.event_type): (r.n, r.total or 0.0) for r in batch}
        assert set(state4) == set(expect)
        for k, (n, tot) in expect.items():
            got_n, got_tot = state4[k]
            assert got_n == n
            assert abs(got_tot - tot) < 1e-6 * max(1.0, abs(tot))
        # MV rows are O(windows x event_types), never O(events)
        assert len(state4) < n_events


class TestDedupMicrobatches:
    """Watermarked dedup: one state row per distinct event_id inside
    the watermark horizon; duplicates arriving in the SAME batch (the
    doubled stream) collapse; multi-batch == single-batch output."""

    def test_state_and_dedup_accounting(self, spark, staged):
        src4, src1, n_events, _u = staged
        multi, batches = _run(spark, src4, dedup_transform, "dd_m4", "append")
        assert len(batches) == 4
        # numInputRows counts SOURCE rows (the doubling explode is
        # inside the query, after the source)
        assert sum(p["numInputRows"] for p in batches) == n_events
        n_distinct = spark.read.parquet(src4).select("event_id").distinct().count()
        for p in batches:
            so = p["stateOperators"][0]
            assert so["numRowsTotal"] > 0
            # the id set never exceeds the distinct ids ingested
            assert so["numRowsTotal"] <= n_distinct
        # emit-once: exactly one row per distinct event id
        assert multi.count() == n_distinct
        single, _b1 = _run(spark, src1, dedup_transform, "dd_m1", "append")
        assert sorted(map(tuple, multi.collect())) == sorted(
            map(tuple, single.collect())
        )


class TestSlidingCountsMicrobatches:
    """Sliding windows: state rows = open windows (2 per event time
    bucket), bounded by the watermark; complete-mode result equals the
    batch aggregate."""

    def test_state_and_window_accounting(self, spark, staged):
        src4, _src1, n_events, _u = staged
        out, batches = _run(
            spark, src4, sliding_counts_transform, "sl_m4", "complete"
        )
        assert len(batches) == 4
        assert sum(p["numInputRows"] for p in batches) == n_events
        for p in batches:
            assert p["stateOperators"][0]["numRowsTotal"] > 0
        # every event lands in exactly 2 overlapping windows
        rows = out.collect()
        assert sum(r.n_events for r in rows) == 2 * n_events
        # and the final state holds exactly the distinct windows
        assert batches[-1]["stateOperators"][0]["numRowsTotal"] == len(rows)


class TestTumblingCountsMicrobatches:
    """Tumbling windows: state rows = distinct (window, event_type)
    groups; complete-mode result equals the batch aggregate over the
    same files (cut invariance)."""

    def test_state_and_window_accounting(self, spark, staged):
        src4, _src1, n_events, _u = staged
        out, batches = _run(
            spark, src4, tumbling_counts_transform, "tb_m4", "complete"
        )
        assert len(batches) == 4
        assert sum(p["numInputRows"] for p in batches) == n_events
        rows = out.collect()
        # counts partition the stream exactly (no event lost/duplicated)
        assert sum(r.n_events for r in rows) == n_events
        # final state = one row per live (window, event_type) group
        assert batches[-1]["stateOperators"][0]["numRowsTotal"] == len(rows)
        # state is monotone non-decreasing across batches (complete
        # mode never evicts below the watermark horizon here)
        totals = [p["stateOperators"][0]["numRowsTotal"] for p in batches]
        assert totals == sorted(totals)

    def test_multibatch_equals_batch_aggregate(self, spark, staged):
        src4, _src1, _n, _u = staged
        out, _b = _run(
            spark, src4, tumbling_counts_transform, "tb_eq", "complete"
        )
        batch = (
            spark.read.parquet(src4)
            .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
            )
        )
        key = ["window_start", "event_type", "n_events"]
        assert sorted(map(tuple, out.select(key).collect())) == sorted(
            map(tuple, batch.select(key).collect())
        )


class TestRunningTotalsMicrobatches:
    """applyInPandasWithState accumulator: state = one row per user
    seen so far; events_seen is monotone per user so the max-events
    emission per user is the final state, which must equal the batch
    per-user aggregate (fold invariance across cuts)."""

    @staticmethod
    def _final_per_user(rows):
        best: dict = {}
        for r in rows:
            cur = best.get(r.user_id)
            if cur is None or r.events_seen > cur[0]:
                best[r.user_id] = (r.events_seen, r.total_value)
        return best

    def test_state_and_fold_invariance(self, spark, staged):
        src4, src1, n_events, n_users = staged
        multi, batches = _run(
            spark, src4, running_totals_transform, "rt_m4", "update"
        )
        assert len(batches) == 4
        assert sum(p["numInputRows"] for p in batches) == n_events
        for p in batches:
            so = p["stateOperators"][0]
            assert 0 < so["numRowsTotal"] <= n_users
        # by drain, every user has a state row
        assert batches[-1]["stateOperators"][0]["numRowsTotal"] == n_users
        final4 = self._final_per_user(multi.collect())
        assert len(final4) == n_users
        # sum of per-user events_seen partitions the stream
        assert sum(v[0] for v in final4.values()) == n_events
        # cut invariance: 4-batch final state == 1-batch final state
        single, b1 = _run(
            spark, src1, running_totals_transform, "rt_m1", "update"
        )
        assert len(b1) == 1
        final1 = self._final_per_user(single.collect())
        assert final4.keys() == final1.keys()
        for u, (n4, t4) in final4.items():
            n1, t1 = final1[u]
            assert n4 == n1
            assert abs(t4 - t1) < 1e-4 * max(1.0, abs(t1))


class TestEnrichJoinMicrobatches:
    """Stream-static join: the static side keeps NO state (only the
    downstream agg does); result equals the batch join+aggregate over
    the same files."""

    def test_accounting_and_batch_equivalence(self, spark, staged):
        src4, _src1, n_events, _u = staged
        dim = enrich_dim(spark, SF_SMOKE)
        out, batches = _run(
            spark,
            src4,
            lambda ev: enrich_join_transform(ev, dim),
            "en_m4",
            "complete",
        )
        assert len(batches) == 4
        # numInputRows counts only the STREAM side — the static dim is
        # re-resolved per batch without entering the source metrics
        assert sum(p["numInputRows"] for p in batches) == n_events
        rows = out.collect()
        # agg state = one row per (nation, event_type) group
        assert batches[-1]["stateOperators"][0]["numRowsTotal"] == len(rows)
        batch = enrich_join_transform(spark.read.parquet(src4), dim)
        key = ["nation", "event_type", "n_events", "total_value"]
        assert sorted(map(tuple, rows)) == sorted(
            map(tuple, batch.select(key).collect())
        )
