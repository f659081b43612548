"""Registry-wide analysis smoke test — runs FIRST (filename-ordered).

Round 2 lesson: the driver regenerated /root/testdata between rounds and
the new parquet's `ts` column came back TIMESTAMP_NTZ, which made four
plans throw at *analysis* time — and because nothing cheap checked
analysis across the whole registry early, the failure surfaced only in
the driver gate and took the entire bench artifact down with it
(BENCH_r02.json: rc=1, no timings).

This test calls every registered plan's fn against the real testdata at
the smoke scale factor and checks its analyzed schema. For purely
declarative plans that is Catalyst analysis only (milliseconds); note
however that a minority of plan fns execute work eagerly inside the fn
itself — the iterative algorithms (cluster_kmeans, graph_pagerank),
driver-side eig consumers (emb_pca_variance_check, emb_whiten_check),
and every streaming_* plan (drains its stream before returning) — so
this file costs a couple of minutes wall, not seconds. That cost buys
the early-warning property: any dtype drift from a testdata
regeneration fails here, immediately, with the plan name.

It also asserts no plan's schema contains TIMESTAMP_NTZ: all reads go
through tables.load / read_events_stream which normalize the physical
type, so an NTZ leaking into any plan output means a new read path
bypassed the normalization (or the driver regenerated testdata into a
layout the probes don't cover) — fail loudly here, not in the gate.
"""

from __future__ import annotations

import pytest

from compendium_spark.plans import all_plans

from .conftest import SF_SMOKE

PLANS = all_plans()


@pytest.mark.parametrize("name", sorted(PLANS))
def test_plan_analyzes(spark, name):
    df = PLANS[name].fn(spark, SF_SMOKE)
    schema = df.schema  # triggers full Catalyst analysis
    assert len(schema.fields) > 0, f"{name}: empty schema"
    assert "timestamp_ntz" not in schema.simpleString().lower(), (
        f"{name}: TIMESTAMP_NTZ in output schema — a read path bypassed "
        f"tables.load's normalization (round-2 regression class)"
    )
