"""w10_funnel_conversion edge semantics on constructed data.

The oracle parity run proves Spark == DuckDB on the synthetic corpus;
this file pins the SEMANTICS on hand-built cases where the expected
counts are derivable by eye: strict after-ness (ties excluded),
out-of-order stages not counted, missing stages truncating the chain.
"""

from __future__ import annotations

import datetime as dt

import pytest

from compendium_spark.plans.windows import w10_funnel_conversion


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    rows = [
        # user 1: full ordered chain -> counts in all four stages
        (1, 1, "signup", _ts(0)),
        (2, 1, "view", _ts(1)),
        (3, 1, "click", _ts(2)),
        (4, 1, "purchase", _ts(3)),
        # user 2: click BEFORE the first view -> chain stops at view
        (5, 2, "signup", _ts(0)),
        (6, 2, "click", _ts(1)),
        (7, 2, "view", _ts(2)),
        (8, 2, "purchase", _ts(3)),  # no click after view -> not counted
        # user 3: view at the SAME instant as signup -> strict > excludes
        (9, 3, "signup", _ts(5)),
        (10, 3, "view", _ts(5)),
        # user 4: signup only
        (11, 4, "signup", _ts(0)),
        # user 5: no signup at all -> no stage counts
        (12, 5, "view", _ts(0)),
        (13, 5, "click", _ts(1)),
        # user 6: second view after the stray click still satisfies the
        # click stage (first view strictly before a later click)
        (14, 6, "signup", _ts(0)),
        (15, 6, "view", _ts(1)),
        (16, 6, "click", _ts(4)),
        (17, 6, "view", _ts(2)),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id long, user_id long, event_type string, ts timestamp"
    ).selectExpr(
        "event_id", "ts", "user_id", "event_type",
        "CAST(1.0 AS DOUBLE) AS value", "CAST(NULL AS STRING) AS props",
    )
    d = tmp_path_factory.mktemp("funnel_sf")
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_funnel_edge_semantics(spark, funnel_dir):
    row = w10_funnel_conversion(spark, funnel_dir).collect()[0]
    # signups: users 1, 2, 3, 4, 6 -> 5
    assert row.n_signup == 5
    # view strictly after signup: users 1, 2, 6 (user 3 tied -> out)
    assert row.n_view == 3
    # click strictly after that first view: users 1, 6
    assert row.n_click == 2
    # purchase strictly after that click: user 1 only
    assert row.n_purchase == 1
