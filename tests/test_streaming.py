"""Structured Streaming surface: windows, sessions, custom state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from compendium_spark.plans.windows import w1_tumbling_window
from compendium_spark.streaming.windows import (
    streaming_running_totals,
    streaming_session_windows,
    streaming_tumbling_counts,
)
from compendium_spark.tables import load

from .conftest import SF_SMOKE


def test_streaming_tumbling_matches_batch(spark):
    """The streaming window agg must equal the batch plan's counts —
    same expression, incremental execution."""
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in streaming_tumbling_counts(spark, SF_SMOKE).collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in w1_tumbling_window(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_sessions(spark):
    rows = streaming_session_windows(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_streaming_running_totals(spark):
    """Stateful operator totals must equal the batch groupBy."""
    got = {
        r.user_id: (r.events_seen, r.total_value)
        for r in streaming_running_totals(spark, SF_SMOKE).collect()
    }
    ev = load(spark, SF_SMOKE, "events")
    want = {
        r.user_id: (r.n, round(r.v, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert got[uid][1] == pytest.approx(want[uid][1], abs=1e-3)


def test_streaming_status_merge_matches_batch(spark):
    """foreachBatch status MERGE ≡ batch last-event-wins per project."""
    from pyspark.sql import functions as F

    from compendium_spark.streaming.windows import (
        STATUS_EVENT_TYPES,
        streaming_status_merge,
    )
    from compendium_spark.tables import load

    got = streaming_status_merge(spark, SF_SMOKE).toPandas().set_index("project")

    ev = load(spark, SF_SMOKE, "events")
    mapping = F.create_map(
        *[F.lit(x) for kv in STATUS_EVENT_TYPES.items() for x in kv]
    )
    want = (
        ev.select(
            F.concat(F.lit("PRJ"), F.pmod("user_id", F.lit(50)).cast("string")).alias(
                "project"
            ),
            mapping[F.col("event_type")].alias("status"),
            "ts",
        )
        .filter(F.col("status").isNotNull())
        .groupBy("project")
        .agg(F.max_by("status", "ts").alias("status"))
        .toPandas()
        .set_index("project")
    )
    assert len(got) == len(want) > 0
    for p in want.index:
        assert got.loc[p, "status"] == want.loc[p, "status"], p


def test_streaming_sliding_matches_batch(spark):
    """Streaming sliding windows ≡ the batch w2 plan's counts."""
    from compendium_spark.plans.windows import w2_sliding_window
    from compendium_spark.streaming.windows import streaming_sliding_counts

    got = {
        r.window_start: r.n_events
        for r in streaming_sliding_counts(spark, SF_SMOKE).collect()
    }
    want = {
        r.window_start: r.n_events
        for r in w2_sliding_window(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_interval_join_matches_batch(spark):
    """Stream-stream range join must produce exactly the batch join's
    (view, click) pairs."""
    from compendium_spark.streaming.windows import (
        INTERVAL_JOIN_MINUTES,
        streaming_interval_join,
    )

    got = {
        (r.view_id, r.click_id)
        for r in streaming_interval_join(spark, SF_SMOKE).collect()
    }
    ev = load(spark, SF_SMOKE, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    want = {
        (r.view_id, r.click_id)
        for r in views.join(
            clicks,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (
                F.col("b_ts")
                <= F.col("a_ts")
                + F.expr(f"INTERVAL {INTERVAL_JOIN_MINUTES} MINUTES")
            ),
        )
        .select("view_id", "click_id")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_dedup_removes_duplicates(spark):
    """Doubled input stream → exactly one row per event_id."""
    from compendium_spark.streaming.windows import streaming_dedup

    rows = streaming_dedup(spark, SF_SMOKE).collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))
    n_events = load(spark, SF_SMOKE, "events").count()
    assert len(ids) == n_events


def test_streaming_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """Exactly-once across restarts: a checkpointed file-source query
    drained to a parquet sink, stopped, and restarted must NOT
    re-emit already-committed batches — the restart resumes from the
    checkpoint's committed offsets and finds nothing new."""
    from compendium_spark.streaming.windows import read_events_stream

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        ev = read_events_stream(spark, SF_SMOKE)
        q = (
            ev.select("event_id", "user_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_events = load(spark, SF_SMOKE, "events").count()
    first = spark.read.parquet(out).count()
    assert first == n_events
    run_once()  # restart against the same checkpoint + sink
    second = spark.read.parquet(out).count()
    assert second == first, "restart re-emitted committed batches"


def test_streaming_enrich_matches_batch(spark):
    from compendium_spark.streaming.windows import streaming_enrich_join

    rows = streaming_enrich_join(spark, SF_SMOKE).collect()
    ev = load(spark, SF_SMOKE, "events")
    cust = load(spark, SF_SMOKE, "customer")
    nat = load(spark, SF_SMOKE, "nation")
    want = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    got = {(r.nation, r.event_type): r.n_events for r in rows}
    exp = {(r.nation, r.event_type): r.n_events for r in want}
    assert got == exp


def test_streaming_scd2_state_carries_across_microbatches(spark, tmp_path):
    """The stateful SCD2 kernel must resume each user's OPEN interval
    from state when later microbatches arrive (the `state.exists`
    branch — unreachable with the single-file testdata stream): split
    a user's timeline across two files, drain with
    maxFilesPerTrigger=1, and require the emitted closed intervals to
    equal the batch interval build on the union — including the
    interval that OPENS in batch 1 and CLOSES in batch 2."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from compendium_spark.streaming.windows import (
        SCD2_OUT_SCHEMA,
        SCD2_STATE_SCHEMA,
        _run_to_memory,
        _scd2_changes,
    )

    rows = [
        # user 1: A A | B  -> intervals: A[t0,t4) closed ACROSS batches
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 01:00:00", "A"),
        (5, 1, "2024-01-02 00:00:00", "B"),
        # user 2: A B | A  -> A[t0,t1) in batch 1, B[t1,t5) across
        (3, 2, "2024-01-01 00:00:00", "A"),
        (4, 2, "2024-01-01 02:00:00", "B"),
        (6, 2, "2024-01-02 03:00:00", "A"),
    ]
    df = spark.createDataFrame(
        [(e, u, ts, t) for e, u, ts, t in rows],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    in_dir = tmp_path / "stream_in"
    # batch 1 = events 1-4, batch 2 = events 5-6; one file each, named
    # so the file source picks them up in order
    df.filter("event_id <= 4").coalesce(1).write.parquet(str(in_dir / "b1"))
    df.filter("event_id >= 5").coalesce(1).write.parquet(str(in_dir / "b2"))
    import glob as g
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    import os

    for i, sub in enumerate(["b1", "b2"]):
        src = g.glob(str(in_dir / sub / "part-*.parquet"))[0]
        dst = flat / f"{i}.parquet"
        shutil.copy(src, dst)
        # the file stream source orders batches by MODIFICATION TIME;
        # near-simultaneous copies tie and the order becomes arbitrary
        # — pin it explicitly so batch 1 really precedes batch 2
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _scd2_changes,
        outputStructType=SCD2_OUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    got = sorted(
        (
            (r["user_id"], r["version"], r["status"], r["valid_from"], r["valid_to"])
            for r in _run_to_memory(out, "scd2_two_batches", "append").collect()
        )
    )
    ts = pd.Timestamp
    want = sorted(
        [
            (1, 1, "A", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
            (2, 1, "A", ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
            (2, 2, "B", ts("2024-01-01 02:00:00"), ts("2024-01-02 03:00:00")),
        ]
    )
    assert [(u, v, s) for u, v, s, *_ in got] == [
        (u, v, s) for u, v, s, *_ in want
    ]
    assert [tuple(map(pd.Timestamp, (f, t))) for *_, f, t in got] == [
        (f, t) for *_, f, t in want
    ]
