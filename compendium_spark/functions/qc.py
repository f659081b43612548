"""QC engine: per-sample metrics, per-project aggregation, disposition.

Re-expresses the reference's Sample/Project QC math
(`/root/reference/projects.py:599-629` per-sample,
`projects.py:233-311` per-project) as pure DataFrame transforms.
Thresholds from `config_template.py:42-53` (sample) and
`config_template.py:69-77` (project).

Null-division semantics (F6): the reference wraps chimera and merged
ratios in bare try/except — a zero denominator (control sample) makes
both flags False (`projects.py:603-610`, `projects.py:616-621`).
Spark's x/0 → NULL, and NULL comparisons are false in `when()`, so
coalesce(flag, False) reproduces the semantics exactly.

Documented divergences:
  * retained_percent has NO try/except in the reference
    (`projects.py:625`) — a zero dinput would crash it. We null-safe
    it like the others (flags False).
  * Project merged stats: the reference intends to null them for
    not-all-paired projects but unconditionally overwrites after the
    loop break (`projects.py:250-265` — the assignments after the
    `for` run regardless), making the result order-dependent. We
    implement the documented intent (SURVEY A5): a not-fully-paired
    project has NULL merged proportions, which never trigger re_run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QCThresholds:
    # sample-level (config_template.py:42-53)
    retained_worrisome: float = 0.69  # MINIMUM
    retained_error: float = 0.59
    chimera_worrisome: float = 0.10  # MAXIMUM
    chimera_error: float = 0.20
    merged_worrisome: float = 0.80  # MINIMUM
    merged_error: float = 0.65
    # project-level flagged-sample proportions (config_template.py:69-77)
    project_retained_worrisome: float = 0.70
    project_retained_error: float = 0.20
    project_merged_worrisome: float = 0.40
    project_merged_error: float = 0.15
    project_chimera_worrisome: float = 0.40
    project_chimera_error: float = 0.20


DEFAULT_THRESHOLDS = QCThresholds()


def _flag(cond: Column) -> Column:
    """NULL-safe boolean flag: NULL comparison → False (F6)."""
    return F.coalesce(cond, F.lit(False))


def sample_qc(summary: DataFrame, t: QCThresholds = DEFAULT_THRESHOLDS) -> DataFrame:
    """Per-sample QC metrics + warn/error flags.

    Input: summary rows (see sources.tsv.read_summary) with columns
    project, srr, dinput, filter, forwd, revse, merged, length,
    nonchim, is_paired.
    """
    # nullif(denominator, 0) → NULL → ratio NULL → flags False
    chimera_pct = 1 - F.col("nonchim") / F.nullif(F.col("length"), F.lit(0))
    merged_pct = F.when(
        F.col("is_paired"), F.col("merged") / F.nullif(F.col("forwd"), F.lit(0))
    )
    retained_pct = F.col("nonchim") / F.nullif(F.col("dinput"), F.lit(0))
    return summary.select(
        "*",
        chimera_pct.alias("chimera_percent"),
        merged_pct.alias("merged_percent"),
        retained_pct.alias("retained_percent"),
        _flag(chimera_pct > t.chimera_worrisome).alias("chimeric_warn"),
        _flag(chimera_pct > t.chimera_error).alias("chimeric_error"),
        _flag(merged_pct < t.merged_worrisome).alias("merged_warn"),
        _flag(merged_pct < t.merged_error).alias("merged_error"),
        _flag(retained_pct < t.retained_worrisome).alias("retained_warn"),
        _flag(retained_pct < t.retained_error).alias("retained_error"),
    )


def project_qc(samples_qc: DataFrame) -> DataFrame:
    """Per-project flagged-sample proportions (A4) + pairedness (A5).

    One hash aggregation; every proportion is a mean-of-booleans.
    paired = ALL samples paired (min of int flags). For not-fully-
    paired projects the merged proportions are NULL (see module
    docstring).
    """
    n = F.count(F.lit(1))
    paired = F.min(F.col("is_paired").cast("int")) == 1
    mean = lambda c: F.sum(F.col(c).cast("int")) / n  # noqa: E731
    agg = samples_qc.groupBy("project").agg(
        n.alias("sample_count"),  # A7, projects.py:226
        paired.alias("paired"),
        mean("chimeric_warn").alias("chimeric_warn"),
        mean("chimeric_error").alias("chimeric_error"),
        mean("merged_warn").alias("_merged_warn"),
        mean("merged_error").alias("_merged_error"),
        mean("retained_warn").alias("retained_warn"),
        mean("retained_error").alias("retained_error"),
    )
    return agg.select(
        "project",
        "sample_count",
        "paired",
        "chimeric_warn",
        "chimeric_error",
        F.when(F.col("paired"), F.col("_merged_warn")).alias("merged_warn"),
        F.when(F.col("paired"), F.col("_merged_error")).alias("merged_error"),
        "retained_warn",
        "retained_error",
    )


def project_disposition(
    project_stats: DataFrame, t: QCThresholds = DEFAULT_THRESHOLDS
) -> DataFrame:
    """Threshold decision aggregate (A6, ref `projects.py:281-311`).

    re_run if merged proportions exceed thresholds; if re_run, the
    retained/chimera checks are SKIPPED (`projects.py:294-296` — the
    short-circuit), else discard on retained/chimera. Error strings
    reproduce the reference's `int(p*100)%` formatting
    (`projects.py:285-311`); NULL merged stats never fire (Spark NULL
    > x is NULL → when() false).
    """
    pct = lambda c: (F.col(c) * 100).cast("int")  # noqa: E731
    m_warn = F.col("merged_warn") > t.project_merged_worrisome
    m_err = F.col("merged_error") > t.project_merged_error
    r_warn = F.col("retained_warn") > t.project_retained_worrisome
    r_err = F.col("retained_error") > t.project_retained_error
    c_warn = F.col("chimeric_warn") > t.project_chimera_worrisome
    c_err = F.col("chimeric_error") > t.project_chimera_error

    re_run = _flag(m_warn) | _flag(m_err)
    discard = ~re_run & (_flag(r_warn) | _flag(r_err) | _flag(c_warn) | _flag(c_err))

    msg = F.format_string
    errors = F.array_compact(
        F.array(
            F.when(_flag(m_warn), msg("%d%% of samples had warning for merged read count.", pct("merged_warn"))),
            F.when(_flag(m_err), msg("%d%% of samples had ERROR for merged read count.", pct("merged_error"))),
            F.when(~re_run & _flag(r_warn), msg("%d%% of samples had warning for reads retained.", pct("retained_warn"))),
            F.when(~re_run & _flag(r_err), msg("%d%% of samples had ERROR for reads retained.", pct("retained_error"))),
            F.when(~re_run & _flag(c_warn), msg("%d%% of samples had warning for chimeric read count.", pct("chimeric_warn"))),
            F.when(~re_run & _flag(c_err), msg("%d%% of samples had ERROR for chimeric read count.", pct("chimeric_error"))),
        )
    )
    # REACT precedence (projects.py:554-571): discard checked first,
    # then re_run, else save.
    decision = (
        F.when(discard, "discard").when(re_run, "re_run").otherwise("save")
    )
    return project_stats.select(
        "*",
        re_run.alias("re_run"),
        discard.alias("discard"),
        errors.alias("errors"),
        decision.alias("decision"),
    )
