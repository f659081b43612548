"""VERDICT r10 #5: streaming_mv_refresh's documented production body —
the foreachBatch fold landing in a REAL `storage.Warehouse` table via
`upsert` — exercised end-to-end and pinned equal to the registered
plan's driver-dict result."""

from __future__ import annotations

import pandas as pd

from compendium_spark.storage import PARTITION_SPEC, Warehouse
from compendium_spark.streaming.windows import (
    MV_HOURLY_SCHEMA,
    mv_refresh_updates,
    read_events_stream,
    run_mv_refresh_warehouse,
    streaming_mv_refresh,
)

from .conftest import SF_ORACLE


def _mv_wh(spark, tmp_path):
    return Warehouse(
        spark, str(tmp_path / "wh"), extra_tables={"mv_hourly": MV_HOURLY_SCHEMA}
    )


def test_warehouse_mv_equals_driver_dict(spark, tmp_path):
    """The stored MV after draining the stream equals the registered
    plan's driver-dict state (same add-merge invariant), modulo the
    plan's 4-dp emit quantization."""
    wh = _mv_wh(spark, tmp_path)
    stored = run_mv_refresh_warehouse(
        mv_refresh_updates(read_events_stream(spark, SF_ORACLE)), wh
    )
    got = (
        stored.toPandas()
        .assign(total_value=lambda d: d.total_value.round(4))
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    want = (
        streaming_mv_refresh(spark, SF_ORACLE)
        .toPandas()
        .assign(total_value=lambda d: d.total_value.round(4))
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=False, atol=1e-9)
    assert len(got) > 0


def test_warehouse_mv_fold_is_additive(spark, tmp_path):
    """Draining the SAME stream twice through the warehouse sink
    doubles every count and sum — the fold is add-merge on stored
    state (a replayed availableNow drain is a new batch of data, not
    an idempotent overwrite; exactly-once across restarts is the
    checkpoint's job, pinned by the streaming progress tests)."""
    wh = _mv_wh(spark, tmp_path)
    once = run_mv_refresh_warehouse(
        mv_refresh_updates(read_events_stream(spark, SF_ORACLE)), wh
    ).toPandas()
    twice = run_mv_refresh_warehouse(
        mv_refresh_updates(read_events_stream(spark, SF_ORACLE)), wh
    ).toPandas()
    m = once.merge(twice, on=["hour", "event_type"], suffixes=("_1", "_2"))
    assert len(m) == len(once) == len(twice)
    assert (m.n_events_2 == 2 * m.n_events_1).all()
    assert (m.total_value_2 - 2 * m.total_value_1).abs().max() < 1e-6


def test_extra_table_is_isolated(spark, tmp_path):
    """extra_tables extends one Warehouse instance only: the reference
    nine stay intact, other instances still reject the MV name, and
    the MV stays unpartitioned unless added to PARTITION_SPEC."""
    import pytest

    wh = _mv_wh(spark, tmp_path)
    assert set(wh.tables) >= {"samples", "status", "mv_hourly"}
    assert "mv_hourly" not in PARTITION_SPEC
    plain = Warehouse(spark, str(tmp_path / "wh2"))
    with pytest.raises(KeyError):
        plain.path("mv_hourly")
