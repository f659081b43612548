"""QC engine: per-sample flags, project aggregation, disposition.

Reference semantics under test: `/root/reference/projects.py:599-629`
(sample), `projects.py:233-311` (project), `config_template.py:42-77`
(thresholds).
"""

from __future__ import annotations

import pytest

from compendium_spark.functions.qc import project_disposition, project_qc, sample_qc

COLS = "project string, srr string, dinput long, filter long, forwd long, revse long, merged long, length long, nonchim long, is_paired boolean"


def _mk(spark, rows):
    return spark.createDataFrame(rows, COLS)


def good(project="P1", srr="SRR1", paired=True):
    # retained = 0.88, chimera = 1 - 44000/44800 ≈ 0.018, merged ≈ 0.957
    return (project, srr, 50000, 48000, 47000, 46500 if paired else None,
            45000 if paired else None, 44800, 44000, paired)


def test_sample_flags_good(spark):
    df = sample_qc(_mk(spark, [good()]))
    r = df.collect()[0]
    assert not any([r.chimeric_warn, r.chimeric_error, r.merged_warn,
                    r.merged_error, r.retained_warn, r.retained_error])
    assert r.retained_percent == pytest.approx(0.88)


def test_sample_zero_division_flags_false(spark):
    """F6: zero length/forwd/dinput → flags default False
    (projects.py:603-610, 616-621)."""
    rows = [("P1", "SRR1", 0, 0, 0, 0, 0, 0, 0, True)]
    r = sample_qc(_mk(spark, rows)).collect()[0]
    assert r.chimera_percent is None and r.merged_percent is None
    assert not any([r.chimeric_warn, r.chimeric_error, r.merged_warn,
                    r.merged_error, r.retained_warn, r.retained_error])


def test_sample_threshold_edges(spark):
    # chimera: 1 - nonchim/length > 0.10 warn, > 0.20 error (strict >)
    rows = [
        ("P1", "A", 1000, 900, 800, 700, 700, 1000, 900, True),   # chimera exactly 0.10 → no warn
        ("P1", "B", 1000, 900, 800, 700, 700, 1000, 880, True),   # 0.12 → warn only
        ("P1", "C", 1000, 900, 800, 700, 700, 1000, 700, True),   # 0.30 → warn+error
    ]
    out = {r.srr: r for r in sample_qc(_mk(spark, rows)).collect()}
    assert not out["A"].chimeric_warn
    assert out["B"].chimeric_warn and not out["B"].chimeric_error
    assert out["C"].chimeric_warn and out["C"].chimeric_error


def test_sample_merged_and_retained_flags(spark):
    rows = [
        # merged = 600/800 = 0.75 < 0.80 warn, not < 0.65
        ("P1", "A", 1000, 900, 800, 700, 600, 1000, 900, True),
        # merged = 500/800 = 0.625 < 0.65 → warn+error
        ("P1", "B", 1000, 900, 800, 700, 500, 1000, 900, True),
        # retained = 500/1000 = 0.5 < 0.59 → warn+error
        ("P1", "C", 1000, 900, 800, 700, 700, 1000, 500, True),
    ]
    out = {r.srr: r for r in sample_qc(_mk(spark, rows)).collect()}
    assert out["A"].merged_warn and not out["A"].merged_error
    assert out["B"].merged_warn and out["B"].merged_error
    assert out["C"].retained_warn and out["C"].retained_error


def test_single_end_sample_has_no_merged_flags(spark):
    rows = [("P1", "A", 1000, 900, 800, None, None, 1000, 900, False)]
    r = sample_qc(_mk(spark, rows)).collect()[0]
    assert r.merged_percent is None
    assert not r.merged_warn and not r.merged_error


def test_project_pairedness_all_rule(spark):
    """A5: paired iff EVERY sample paired; merged stats NULL otherwise."""
    rows = [good("P1", "S1", True), good("P1", "S2", False),
            good("P2", "S3", True), good("P2", "S4", True)]
    stats = {r.project: r for r in project_qc(sample_qc(_mk(spark, rows))).collect()}
    assert stats["P1"].paired is False and stats["P1"].merged_warn is None
    assert stats["P2"].paired is True and stats["P2"].merged_warn == 0.0


def test_project_proportions(spark):
    rows = [
        ("P1", "A", 1000, 900, 800, 700, 700, 1000, 700, True),  # chimera warn+error
        ("P1", "B", 1000, 900, 800, 700, 700, 1000, 880, True),  # chimera warn
        good("P1", "C"),
        good("P1", "D"),
    ]
    r = project_qc(sample_qc(_mk(spark, rows))).collect()[0]
    assert r.sample_count == 4
    assert r.chimeric_warn == pytest.approx(0.5)
    assert r.chimeric_error == pytest.approx(0.25)


def _pstats(spark, **over):
    base = dict(project="P1", sample_count=10, paired=True,
                chimeric_warn=0.0, chimeric_error=0.0,
                merged_warn=0.0, merged_error=0.0,
                retained_warn=0.0, retained_error=0.0)
    base.update(over)
    schema = ("project string, sample_count long, paired boolean, "
              "chimeric_warn double, chimeric_error double, "
              "merged_warn double, merged_error double, "
              "retained_warn double, retained_error double")
    return spark.createDataFrame([tuple(base.values())], schema)


def test_disposition_save(spark):
    r = project_disposition(_pstats(spark)).collect()[0]
    assert r.decision == "save" and r.errors == []


def test_disposition_rerun_short_circuit(spark):
    """merged over threshold → re_run; retained/chimera checks skipped
    even if they would discard (projects.py:294-296)."""
    r = project_disposition(
        _pstats(spark, merged_warn=0.5, retained_error=0.9, chimeric_error=0.9)
    ).collect()[0]
    assert r.decision == "re_run"
    assert r.errors == ["50% of samples had warning for merged read count."]


def test_disposition_discard(spark):
    r = project_disposition(_pstats(spark, retained_error=0.25)).collect()[0]
    assert r.decision == "discard"
    assert r.errors == ["25% of samples had ERROR for reads retained."]


def test_disposition_null_merged_never_reruns(spark):
    """Not-fully-paired project: NULL merged stats can't trigger re_run."""
    r = project_disposition(
        _pstats(spark, paired=False, merged_warn=None, merged_error=None,
                chimeric_error=0.3)
    ).collect()[0]
    assert r.decision == "discard"  # chimera fires, merged silent


def test_disposition_threshold_strictness(spark):
    """Comparisons are strict > (projects.py:283-311)."""
    r = project_disposition(_pstats(spark, merged_warn=0.40)).collect()[0]
    assert r.decision == "save"  # exactly at threshold → no trigger
    r2 = project_disposition(_pstats(spark, merged_warn=0.41)).collect()[0]
    assert r2.decision == "re_run"
