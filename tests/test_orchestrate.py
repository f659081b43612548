"""Orchestration lifecycle (ref `main.py:36-134`, `management.py:8-66`,
REACT `projects.py:554-571`) with injected side-effect adapters."""

from __future__ import annotations

import pytest

from compendium_spark.pipeline.orchestrate import (
    Adapters,
    advance_projects,
    autoforward,
    determine_projects,
    dir_probe,
    discard_project,
    initialize_pipeline,
    run_project,
)
from compendium_spark.sources.tsv import read_summary
from compendium_spark.storage import Warehouse

GOOD_ROW = "SRR{i}_1.fastq\t50000\t48000\t47000\t46500\t45000\t44800\t44000\n"
BAD_ROW = "SRR{i}_1.fastq\t50000\t48000\t47000\t46500\t20000\t44800\t44000\n"
HEADER = "\tdinput\tfilter\tforwd\trevse\tmerged\tlength\tnonchim\n"


@pytest.fixture()
def wh(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.init_tables()
    # eligible samples for the find_todo picker: 60 samples in PRJNEW
    rows = [
        (f"SRS{i}", "PRJNEW", "tx", ["SRR%d" % i], "AMPLICON", "GENOMIC",
         None, None, None, None)
        for i in range(60)
    ]
    samples = spark.createDataFrame(
        rows,
        "srs string, project string, taxon string, srr array<string>, "
        "library_strategy string, library_source string, instrument string, "
        "pubdate timestamp, total_bases long, geo_loc_name string",
    )
    wh.write("samples", samples)
    return wh


def _mk_project(tmp_path, project: str, rows: str, running: bool = False):
    d = tmp_path / "projects" / project
    d.mkdir(parents=True, exist_ok=True)
    if running:
        (d / "running.txt").write_text("")
    else:
        (d / "summary.tsv").write_text(
            HEADER + "".join(rows.format(i=i) for i in range(6))
        )


def _adapters(spark, tmp_path, log):
    projects_dir = str(tmp_path / "projects")

    def load_summary(project):
        path = f"{projects_dir}/{project}/summary.tsv"
        try:
            return read_summary(spark, path, project=project)
        except Exception:
            return None

    return Adapters(
        probe=dir_probe(projects_dir),
        load_summary=load_summary,
        submit=lambda p: log.append(("submit", p)),
        clone=lambda p: log.append(("clone", p)),
    )


def test_lifecycle_transitions(spark, wh, tmp_path):
    log = []
    a = _adapters(spark, tmp_path, log)
    initialize_pipeline(wh, "PRJA", a)
    assert ("clone", "PRJA") in log
    run_project(wh, "PRJA", a)
    got = {r.project: r.status for r in wh.read("status").collect()}
    assert got["PRJA"] == "running"
    assert ("submit", "PRJA") in log

    discard_project(wh, "PRJA", "bad data")
    row = wh.read("status").filter("project = 'PRJA'").collect()[0]
    assert row.status == "failed" and row.note1 == "bad data"


def test_determine_and_advance(spark, wh, tmp_path):
    log = []
    a = _adapters(spark, tmp_path, log)
    for p in ("PRJGOOD", "PRJBAD", "PRJRUN"):
        initialize_pipeline(wh, p, a)
        run_project(wh, p, a)
    _mk_project(tmp_path, "PRJGOOD", GOOD_ROW)
    _mk_project(tmp_path, "PRJBAD", BAD_ROW)  # merged 20k/47k → re_run
    _mk_project(tmp_path, "PRJRUN", GOOD_ROW, running=True)

    done, running, not_done = determine_projects(wh, a)
    assert sorted(done) == ["PRJBAD", "PRJGOOD"]
    assert running == ["PRJRUN"]

    decisions = advance_projects(wh, done, a, auto=True)
    assert decisions == {"PRJGOOD": "save", "PRJBAD": "re_run"}
    got = {r.project: r.status for r in wh.read("status").collect()}
    # re_run under auto resubmits → running again (projects.py:314-329)
    assert got["PRJBAD"] == "running"
    assert got["PRJGOOD"] == "complete"
    assert ("submit", "PRJBAD") in log[-2:]


def test_autoforward_fills_capacity(spark, wh, tmp_path):
    log = []
    a = _adapters(spark, tmp_path, log)
    result = autoforward(wh, a, max_projects=2)
    # nothing tracked yet → PRJNEW (60 eligible samples, in the 50..1000
    # band) gets picked, initialized, and submitted
    assert result["launched"] == ["PRJNEW"]
    got = {r.project: r.status for r in wh.read("status").collect()}
    assert got["PRJNEW"] == "running"
    assert ("submit", "PRJNEW") in log

    # second sweep: PRJNEW counts toward capacity (not_done — no files),
    # and the anti-join (Q3 fix) prevents re-picking it
    result2 = autoforward(wh, a, max_projects=2)
    assert result2["launched"] == []
    assert result2["not_done"] == ["PRJNEW"]
