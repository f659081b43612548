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
    scd2_transform,
    session_windows_transform,
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
    def test_join_state_and_batch_accounting(self, spark, staged):
        """Stream-stream interval join across 4 micro-batches: both
        sides buffer in the state store (rows waiting for matches
        inside the watermark horizon), every staged file becomes a
        batch on each side, and the multi-batch result equals a
        single-batch run."""
        from pyspark.sql import functions as F

        def transform(ev):
            views = (
                ev.filter(F.col("event_type") == "view")
                .select(
                    F.col("event_id").alias("view_id"),
                    F.col("user_id").alias("a_user"),
                    F.col("ts").alias("a_ts"),
                )
                .withWatermark("a_ts", "10 minutes")
            )
            clicks = (
                ev.filter(F.col("event_type") == "click")
                .select(
                    F.col("event_id").alias("click_id"),
                    F.col("user_id").alias("b_user"),
                    F.col("ts").alias("b_ts"),
                )
                .withWatermark("b_ts", "10 minutes")
            )
            return views.join(
                clicks,
                (F.col("a_user") == F.col("b_user"))
                & (F.col("b_ts") > F.col("a_ts"))
                & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTES")),
                "inner",
            ).select("view_id", "click_id")

        src4, src1, _n, _u = staged
        multi, batches = _run(spark, src4, transform, "ij_m4", "append")
        assert len(batches) >= 3  # both sources drain file-per-trigger
        # the join keeps buffered rows in state every batch
        for p in batches:
            assert p["stateOperators"][0]["numRowsTotal"] > 0
        single, _b1 = _run(spark, src1, transform, "ij_m1", "append")
        assert sorted(map(tuple, multi.collect())) == sorted(
            map(tuple, single.collect())
        )
