"""Registry-wide analysis smoke test — runs FIRST (filename-ordered).

Round 2 lesson: the driver regenerated /root/testdata between rounds and
the new parquet's `ts` column came back TIMESTAMP_NTZ, which made four
plans throw at *analysis* time — and because nothing cheap checked
analysis across the whole registry early, the failure surfaced only in
the driver gate and took the entire bench artifact down with it
(BENCH_r02.json: rc=1, no timings).

This test forces Catalyst analysis (``df.schema``) of every registered
plan against the real testdata at the smoke scale factor. No execution,
no collect — it's seconds for all plans — so any dtype drift from a
testdata regeneration fails here, immediately, with the plan name.
"""

from __future__ import annotations

import pytest

from compendium_spark.plans import all_plans

from .conftest import SF_SMOKE

PLANS = all_plans()


@pytest.mark.parametrize("name", sorted(PLANS))
def test_plan_analyzes(spark, name):
    df = PLANS[name].fn(spark, SF_SMOKE)
    schema = df.schema  # triggers full Catalyst analysis, nothing more
    assert len(schema.fields) > 0, f"{name}: empty schema"
