"""Orchestration sweep: the reference's project lifecycle commands
(`/root/reference/main.py:36-134`, `management.py:8-66`,
`projects.py:108-135/408-415/554-571`) over the Spark warehouse.

Side effects (git clone, sbatch, filesystem probes) are injected as
`Adapters` callables — the engine stays pure DataFrame transforms and
the orchestration loop touches at most `max_projects` driver-side rows
(SURVEY §7.4: collect() only for ≤max_projects orchestration rows).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from compendium_spark.functions.qc import project_disposition, project_qc, sample_qc
from compendium_spark.pipeline.status import find_todo, non_terminal_projects
from compendium_spark.storage import Warehouse

MAX_PROJECTS = 8  # config_template.py:17


def _noop(*_args, **_kw) -> None:
    return None


@dataclass
class Adapters:
    """Injection points for everything the reference shells out for.

    probe(project) -> 'done' | 'running' | 'not_done'
        (`projects.py:137-154`: result files exist? running.txt exists?)
    submit(project): sbatch stand-in (`projects.py:127-135`)
    clone(project): git-clone stand-in (`projects.py:121`)
    load_summary(project) -> DataFrame | None: summary.tsv for a done
        project (`projects.py:203-231`)
    """

    probe: Callable[[str], str]
    load_summary: Callable[[str], DataFrame | None]
    submit: Callable[[str], None] = field(default=_noop)
    clone: Callable[[str], None] = field(default=_noop)


def dir_probe(projects_dir: str) -> Callable[[str], str]:
    """Filesystem probe mirroring the reference's checks: a project is
    done when its summary.tsv exists, running while running.txt exists,
    otherwise not_done (`projects.py:137-154`)."""

    def probe(project: str) -> str:
        d = Path(projects_dir) / project
        if (d / "summary.tsv").exists():
            return "done"
        if (d / "running.txt").exists():
            return "running"
        return "not_done"

    return probe


def set_project_status(
    wh: Warehouse, project: str, status: str, note1: str | None = None
) -> None:
    """One state-machine transition as a keyed upsert (K2/J6;
    `projects.py:87-106`)."""
    row = wh.spark.createDataFrame(
        [(project, status, 0, None, note1, None)],
        "project string, status string, rerun_as_single_end int, paired int, "
        "note1 string, note2 string",
    )
    wh.upsert("status", row, key="project")


def initialize_pipeline(wh: Warehouse, project: str, adapters: Adapters) -> None:
    """`projects.py:108-125`: register the project and stage its
    pipeline checkout (clone injected)."""
    set_project_status(wh, project, "initialized")
    adapters.clone(project)
    set_project_status(wh, project, "accession_list_created")


def run_project(wh: Warehouse, project: str, adapters: Adapters) -> None:
    """`projects.py:127-135`: submit (injected sbatch) → running."""
    adapters.submit(project)
    set_project_status(wh, project, "running")


def discard_project(wh: Warehouse, project: str, reason: str) -> None:
    """`projects.py:408-415`: status=failed, reason recorded; the
    rmtree of pipeline outputs stays outside the engine."""
    set_project_status(wh, project, "failed", note1=reason)


def determine_projects(
    wh: Warehouse, adapters: Adapters
) -> tuple[list[str], list[str], list[str]]:
    """`management.py:8-39`: classify every non-terminal project via
    the injected filesystem probe → (done, running, not_done)."""
    projects = [r.project for r in non_terminal_projects(wh.read("status")).collect()]
    done, running, not_done = [], [], []
    for p in projects:
        {"done": done, "running": running, "not_done": not_done}[
            adapters.probe(p)
        ].append(p)
    return done, running, not_done


def advance_projects(
    wh: Warehouse, done: list[str], adapters: Adapters, auto: bool = False
) -> dict[str, str]:
    """`management.py:56-66` + REACT (`projects.py:554-571`): QC each
    completed project and take its transition — discard → failed,
    re_run → to_re_run + resubmit, else complete. Returns the decision
    per project for reporting."""
    decisions: dict[str, str] = {}
    for project in done:
        summary = adapters.load_summary(project)
        if summary is None:
            continue
        disp = project_disposition(project_qc(sample_qc(summary))).collect()[0]
        decisions[project] = disp.decision
        if disp.decision == "discard":
            discard_project(wh, project, "; ".join(disp.errors))
        elif disp.decision == "re_run":
            set_project_status(
                wh, project, "to_re_run", note1="; ".join(disp.errors)
            )
            if auto:
                run_project(wh, project, adapters)
        else:
            set_project_status(wh, project, "complete")
    return decisions


def autoforward(
    wh: Warehouse,
    adapters: Adapters,
    max_projects: int = MAX_PROJECTS,
    max_samples: int = 1000,
    seed: int = 42,
) -> dict:
    """`main.py:113-134`: advance completed projects, then fill free
    capacity with new ones from the A1 picker (find_todo; the
    reference's tuple-membership bug Q3 fixed by a real anti-join)."""
    done, running, not_done = determine_projects(wh, adapters)
    decisions = advance_projects(wh, done, adapters, auto=True)
    tostart = max_projects - len(running + not_done)
    launched: list[str] = []
    if tostart > 0:
        todo = find_todo(
            wh.read("samples"),
            wh.read("status"),
            max_samples=max_samples,
            needed=tostart,
            seed=seed,
        )
        for r in todo.collect():  # ≤ max_projects rows
            initialize_pipeline(wh, r.project, adapters)
            run_project(wh, r.project, adapters)
            launched.append(r.project)
    return {
        "done": done,
        "running": running,
        "not_done": not_done,
        "decisions": decisions,
        "launched": launched,
    }
