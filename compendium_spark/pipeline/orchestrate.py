"""Orchestration sweep: the reference's project lifecycle commands
(`/root/reference/main.py:36-134`, `management.py:8-66`,
`projects.py:108-135/408-415/554-571`) over the Spark warehouse.

Side effects (git clone, sbatch, filesystem probes) are injected as
`Adapters` callables — the engine stays pure DataFrame transforms and
the orchestration loop touches at most `max_projects` driver-side rows
(SURVEY §7.4: collect() only for ≤max_projects orchestration rows).
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from compendium_spark.functions.qc import project_disposition, project_qc, sample_qc
from compendium_spark.localframe import local_df
from compendium_spark.operators.merge import partial_upsert
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
    prepare_rerun(project): single-end re-run file prep — remove
        previous DADA outputs + reverse reads (`projects.py:331-380`);
        see rerun_file_prep for the real-filesystem form
    archive(project): result archive sink, the reference's tar.gz
        (`projects.py:530-548`, SURVEY K5); see tar_archive
    cleanup(project): delete pipeline files after archiving
        (`projects.py:550-551`)
    """

    probe: Callable[[str], str]
    load_summary: Callable[[str], DataFrame | None]
    submit: Callable[[str], None] = field(default=_noop)
    clone: Callable[[str], None] = field(default=_noop)
    prepare_rerun: Callable[[str], None] = field(default=_noop)
    archive: Callable[[str], None] = field(default=_noop)
    cleanup: Callable[[str], None] = field(default=_noop)

# Files produced by a previous DADA2 attempt, removed before a re-run
# (`projects.py:358-371`). fastq/ extractions are NOT in this list.
_DADA_OUTPUTS = (
    "filtered_out.rds",
    "forward_error_model.pdf",
    "reverse_error_model.pdf",
    "err_forward_reads.rds",
    "err_reverse_reads.rds",
    "ASV.tsv",
    "asv.rds",
    "ASVs.fa",
    "ASVs_counts.tsv",
    "ASVs_taxonomy.tsv",
)


def rerun_file_prep(projects_dir: str) -> Callable[[str], None]:
    """Real-filesystem prepare_rerun adapter mirroring the reference's
    `_remove_previous_dada` + `_remove_reverse_reads`
    (`projects.py:331-380`, unit-tested at tests/projects_test.py:16-53):
    delete prior DADA2 outputs and the intermediate/ dir, keep the old
    summary via the rename chain summary.tsv → previous_summary.tsv →
    previous_previous_summary.tsv, then drop the reverse-read files so
    the next attempt runs single-ended."""

    def prep(project: str) -> None:
        if not project:
            raise ValueError(f"project id value is unexpected: {project!r}")
        d = Path(projects_dir) / project
        # _remove_previous_dada (projects.py:344-380)
        shutil.rmtree(d / "intermediate", ignore_errors=True)
        for name in _DADA_OUTPUTS:
            (d / name).unlink(missing_ok=True)
        if (d / "previous_summary.tsv").exists():
            (d / "previous_summary.tsv").rename(
                d / "previous_previous_summary.tsv"
            )
        if (d / "summary.tsv").exists():
            (d / "summary.tsv").rename(d / "previous_summary.tsv")
        # _remove_reverse_reads (projects.py:331-342)
        for f in (d / "fastq").glob("*_2.fastq"):
            f.unlink(missing_ok=True)

    return prep


def tar_archive(projects_dir: str, archive_dir: str) -> Callable[[str], None]:
    """Archive adapter: tar.gz the project's result files (the
    reference archives logs + ASV outputs, `projects.py:530-548`) and
    verify the archive landed before the caller advances the status."""
    import tarfile

    def archive(project: str) -> None:
        d = Path(projects_dir) / project
        out = Path(archive_dir) / f"{project}.tar.gz"
        out.parent.mkdir(parents=True, exist_ok=True)
        with tarfile.open(out, "w:gz") as tf:
            for f in sorted(d.rglob("*")):
                if f.is_file():
                    tf.add(f, arcname=str(f.relative_to(d.parent)))
        if not out.exists():  # projects.py:546-548
            raise RuntimeError(f"archive of project {project} not found")

    return archive


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
    wh: Warehouse, project: str, status: str, note1: str | None = None,
    note2: str | None = None,
) -> None:
    """One state-machine transition as a keyed PARTIAL upsert
    (`projects.py:87-106`): only status and any provided notes change —
    rerun_as_single_end, paired, and unmentioned notes keep their
    values, exactly like the reference's column-wise UPDATEs. A new
    project inserts with rerun_as_single_end=0 (the table DEFAULT,
    db.py:137-146)."""
    row = local_df(
        wh.spark,
        [(project, status, note1, note2)],
        "project string, status string, note1 string, note2 string",
    )
    wh.write(
        "status",
        partial_upsert(
            wh.read("status"), row, key="project",
            defaults={"rerun_as_single_end": 0},
        ),
    )


def set_rerun_flag(wh: Warehouse, project: str) -> None:
    """`projects.py:322-327`: UPDATE status SET rerun_as_single_end=1 —
    a one-column partial update, nothing else touched."""
    row = local_df(
        wh.spark, [(project, 1)], "project string, rerun_as_single_end int"
    )
    wh.partial_update("status", row, key="project")


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


def rerun_single_end(
    wh: Warehouse, project: str, adapters: Adapters,
    note1: str | None = None, auto: bool = True,
) -> None:
    """`projects.py:313-329` Rerun_as_single_end: refuse if the project
    is known single-ended, prep the files (remove previous DADA outputs
    + reverse reads — injected, rerun_file_prep for the real form), set
    rerun_as_single_end=1, transition to to_re_run, and (auto) resubmit.
    """
    row = wh.read("status").filter(F.col("project") == project).collect()
    if row and row[0].paired == 0:
        raise ValueError(
            f"cannot re-run {project} as single-end; it wasn't paired-end"
        )
    adapters.prepare_rerun(project)
    set_rerun_flag(wh, project)
    set_project_status(wh, project, "to_re_run", note1=note1)
    if auto:
        run_project(wh, project, adapters)


def archive_project(wh: Warehouse, project: str, adapters: Adapters) -> None:
    """`projects.py:525-551`: complete → archived → done. The archive
    sink (tar.gz, SURVEY K5) and the file deletion are injected; each
    status only advances after its side effect succeeded, so a failed
    archive leaves the project at 'complete' exactly like the
    reference's existence check."""
    adapters.archive(project)
    set_project_status(wh, project, "archived")
    adapters.cleanup(project)
    set_project_status(wh, project, "done")


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
            rerun_single_end(
                wh, project, adapters, note1="; ".join(disp.errors), auto=auto
            )
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


# (category, [(label, relative path, is_dir), ...]) — the reference's
# Report_progress probe table (`projects.py:156-198`) verbatim: three
# stage groups, each check a filesystem existence test relative to the
# project directory.
PROGRESS_CHECKS: list[tuple[str, list[tuple[str, str, bool]]]] = [
    (
        "Initialization",
        [
            ("Directory created", ".", True),
            ("Repository cloned", "workflow", True),
            ("Accession list created", "SraAccList.txt", False),
            ("Virtual environment created", "venv", True),
        ],
    ),
    (
        "Pipeline",
        [
            ("1/6 Prefetch job started", ".snakemake/slurm_logs/rule_sra_prefetch", False),
            ("2/6 SRA data extraction job started", ".snakemake/slurm_logs/rule_sra_to_fastq", False),
            ("3/6 FASTQ filtering job started", ".snakemake/slurm_logs/rule_filter", False),
            ("4/6 Error modeling job started", ".snakemake/slurm_logs/rule_errormodel", False),
            ("5/6 ASV calculation job started", ".snakemake/slurm_logs/rule_make_asv_table", False),
            ("6/6 Taxonomic assignment job started", ".snakemake/slurm_logs/rule_assign_taxonomy", False),
        ],
    ),
    (
        "Results",
        [
            ("Result file: ASVs.fa", "ASVs.fa", False),
            ("Result file: ASVs_counts.tsv", "ASVs_counts.tsv", False),
            ("Result file: ASVs_taxonomy.tsv", "ASVs_taxonomy.tsv", False),
        ],
    ),
]

# the reference's check_if_done file list (`projects.py:137-148`)
_DONE_FILES = ("ASVs.fa", "ASVs_counts.tsv", "ASVs_taxonomy.tsv")


def progress_report(projects_dir: str, project: str) -> dict:
    """The reference's per-project stage report (`Report_progress`,
    projects.py:156-198) as a pure filesystem probe: which pipeline
    stages have started, whether the run is live (running.txt —
    check_if_running, projects.py:149-154), whether all result files
    exist (check_if_done, projects.py:137-148), and the EARLIEST
    failing check (the reference's single `<<<` arrow). Returns a
    plain dict so the CLI renderer and tests share one source."""
    d = Path(projects_dir) / project
    done = all((d / f).exists() for f in _DONE_FILES)
    running = (d / "running.txt").exists()
    cats = []
    arrow: str | None = None
    for cat, checks in PROGRESS_CHECKS:
        rows = []
        for label, rel, is_dir in checks:
            p = d if rel == "." else d / rel
            ok = p.is_dir() if is_dir else p.exists()
            if not ok and arrow is None:
                arrow = label
            rows.append((label, ok))
        cats.append((cat, rows))
    return {
        "project": project,
        "done": done,
        "running": running,
        "categories": cats,
        "arrow": arrow,
    }


def render_progress(report: dict) -> str:
    """Text rendering in the reference's format (projects.py:156-197),
    byte-exact (ADVICE r9 #3): the header is the Project __str__
    (`Project <id>`, projects.py:575-576), DONE! short-circuits, a
    CURRENTLY RUNNING banner when live, then per-category check lists
    with one arrow at the earliest failure. Every check line carries
    the reference's trailing space after the label (its f-string
    always emits `{label} {arrow-or-empty}`, projects.py:194), so a
    non-arrowed line ends in one space and an arrowed line reads
    `label   <<< XXXXXXX <<<`."""
    lines = [f"Project {report['project']}"]
    if report["done"]:
        lines.append("DONE!")
        return "\n".join(lines)
    if report["running"]:
        lines.append("\n===============\nCURRENTLY RUNNING\n===============\n")
    for cat, rows in report["categories"]:
        lines.append(f"\n======{cat}======")
        for label, ok in rows:
            arrow = "  <<< XXXXXXX <<<" if report["arrow"] == label else ""
            lines.append(f"{'✓' if ok else 'X'}   {label} {arrow}")
    return "\n".join(lines)
