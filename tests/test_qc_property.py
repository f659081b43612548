"""Property-based QC check (SURVEY §7.2 step 5: "property-test it").

The QC disposition is the subtlest semantics in the reference
(`/root/reference/projects.py:599-629` per-sample math with bare
try/except on zero denominators; `projects.py:233-311` per-project
proportions, ALL-paired rule, and the re_run short-circuit). This test
reimplements that math as a direct Python model and asserts the
DataFrame engine (`compendium_spark.functions.qc`) agrees on randomly
generated inputs — including the degenerate ones (zero denominators,
single-end mixes, empty-ish projects) that example tests miss.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from compendium_spark.functions.qc import (
    DEFAULT_THRESHOLDS as T,
)
from compendium_spark.functions.qc import (
    project_disposition,
    project_qc,
    sample_qc,
)

COLS = [
    "project",
    "srr",
    "dinput",
    "filter",
    "forwd",
    "revse",
    "merged",
    "length",
    "nonchim",
    "is_paired",
]

counts = st.integers(min_value=0, max_value=40)
sample_rows = st.tuples(
    st.sampled_from(["P1", "P2"]),
    counts,  # dinput
    counts,  # filter
    counts,  # forwd
    counts,  # revse
    counts,  # merged
    counts,  # length
    counts,  # nonchim
    st.booleans(),  # is_paired
)


def _model_sample(r: dict) -> dict:
    """Reference per-sample math (projects.py:599-629): None on zero
    denominators (the bare-except), flags False when the pct is None."""
    chimera = 1 - r["nonchim"] / r["length"] if r["length"] else None
    merged = (
        r["merged"] / r["forwd"] if (r["is_paired"] and r["forwd"]) else None
    )
    retained = r["nonchim"] / r["dinput"] if r["dinput"] else None
    flag = lambda c: bool(c) if c is not None else False  # noqa: E731
    return {
        "chimeric_warn": flag(chimera is not None and chimera > T.chimera_worrisome),
        "chimeric_error": flag(chimera is not None and chimera > T.chimera_error),
        "merged_warn": flag(merged is not None and merged < T.merged_worrisome),
        "merged_error": flag(merged is not None and merged < T.merged_error),
        "retained_warn": flag(
            retained is not None and retained < T.retained_worrisome
        ),
        "retained_error": flag(retained is not None and retained < T.retained_error),
    }


def _model_project(samples: list[dict]) -> dict:
    n = len(samples)
    flags = [_model_sample(s) for s in samples]
    paired = all(s["is_paired"] for s in samples)
    mean = lambda k: sum(f[k] for f in flags) / n  # noqa: E731
    stats = {
        "sample_count": n,
        "paired": paired,
        "chimeric_warn": mean("chimeric_warn"),
        "chimeric_error": mean("chimeric_error"),
        "merged_warn": mean("merged_warn") if paired else None,
        "merged_error": mean("merged_error") if paired else None,
        "retained_warn": mean("retained_warn"),
        "retained_error": mean("retained_error"),
    }
    m_warn = stats["merged_warn"] is not None and (
        stats["merged_warn"] > T.project_merged_worrisome
    )
    m_err = stats["merged_error"] is not None and (
        stats["merged_error"] > T.project_merged_error
    )
    re_run = m_warn or m_err
    discard = not re_run and (
        stats["retained_warn"] > T.project_retained_worrisome
        or stats["retained_error"] > T.project_retained_error
        or stats["chimeric_warn"] > T.project_chimera_worrisome
        or stats["chimeric_error"] > T.project_chimera_error
    )
    stats["re_run"] = re_run
    stats["discard"] = discard
    stats["decision"] = "discard" if discard else ("re_run" if re_run else "save")
    return stats


@settings(max_examples=12, deadline=None)
@given(st.lists(sample_rows, min_size=1, max_size=16))
def test_qc_engine_matches_reference_model(spark, rows):
    data = [
        dict(
            zip(
                COLS,
                (proj, f"SRR{i}", d, fl, fo, re_, me, le, no, ip),
            )
        )
        for i, (proj, d, fl, fo, re_, me, le, no, ip) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [tuple(r[c] for c in COLS) for r in data],
        schema=(
            "project string, srr string, dinput long, filter long, forwd long,"
            " revse long, merged long, length long, nonchim long, is_paired boolean"
        ),
    )
    got_samples = {r["srr"]: r for r in map(lambda x: x.asDict(), sample_qc(df).collect())}
    for r in data:
        want = _model_sample(r)
        got = got_samples[r["srr"]]
        for k, v in want.items():
            assert bool(got[k]) == v, (r, k, got[k], v)

    got_projects = {
        r["project"]: r.asDict()
        for r in project_disposition(project_qc(sample_qc(df))).collect()
    }
    by_project: dict[str, list[dict]] = {}
    for r in data:
        by_project.setdefault(r["project"], []).append(r)
    for proj, samples in by_project.items():
        want = _model_project(samples)
        got = got_projects[proj]
        assert got["decision"] == want["decision"], (proj, got, want)
        assert got["re_run"] == want["re_run"]
        assert got["discard"] == want["discard"]
        assert got["sample_count"] == want["sample_count"]
        assert got["paired"] == want["paired"]
        for k in ("chimeric_warn", "retained_error", "merged_warn"):
            g, w = got[k], want[k]
            if w is None:
                assert g is None, (proj, k, g)
            else:
                assert math.isclose(g, w, rel_tol=0, abs_tol=0), (proj, k, g, w)
