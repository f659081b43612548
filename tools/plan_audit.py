"""Physical-plan audit: one line per registered plan.

Prints, for every plan in the registry, the properties that matter at
100 TB: number of exchanges (shuffles), join strategies chosen,
whether parquet scans carry pushed filters, and how many columns the
widest scan reads. Run after changing a plan; commit the regenerated
PLANS_AUDIT.md so plan-shape regressions show up in review diffs.

Usage:
    python tools/plan_audit.py [sf_dir] > PLANS_AUDIT.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compendium_spark.plans import all_plans  # noqa: E402
from compendium_spark.session import get_session  # noqa: E402

JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def audit_plan(df) -> dict:
    df.collect()  # run it so AQE settles on the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the adaptive plan echoes the pre-AQE plan below a marker line —
    # keep only the final plan so nothing double-counts
    plan = plan.split("== Initial Plan ==")[0]
    joins = {k: plan.count(k) for k in JOIN_KINDS if plan.count(k)}
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    pushed = len(re.findall(r"PushedFilters: \[[^\]]*\w", plan))
    widest = max((len(s.split(",")) for s in scans), default=0)
    # duplicate-scan detector: the same parquet location appearing in
    # more than one FileScan. A REVIEW flag, not an error: a table can
    # legitimately play two roles (TPC-H q8 reads nation once per join
    # role; set-operation legs re-read by definition), but a dup scan
    # caused by a SHARED SUBTREE being re-derived per reference is the
    # shape bug the round-6 a23/bloom/w17 fixes removed (checkpoint
    # the shared frame, or explode instead of union). Any nonzero
    # value should be justified in the plan docstring.
    locs = re.findall(r"Location: \w+\([^)]*\)\s*\[([^\]]*)\]", plan)
    dup = len(locs) - len(set(locs))
    return {
        "exchanges": plan.count("Exchange"),
        "joins": joins,
        "n_scans": len(scans),
        "widest_scan_cols": widest,
        "scans_with_pushdown": pushed,
        "dup_scans": dup,
        # codegen'd operators print as "*(n) Op" in the final plan
        "codegen": len(re.findall(r"\*\(\d+\)", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plan_audit")
    print(f"# PLANS_AUDIT — physical plan shapes at {sf_dir}\n")
    print(
        "| plan | shuffles | joins | scans | widest scan (cols) |"
        " pushed-filter scans | dup scans | codegen spans |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name, p in sorted(all_plans().items()):
        try:
            a = audit_plan(p.fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover
            print(f"| {name} | ERROR: {exc} | | | | | |")
            continue
        joins = (
            ", ".join(f"{k}×{v}" for k, v in a["joins"].items()) or "—"
        )
        print(
            f"| {name} | {a['exchanges']} | {joins} | {a['n_scans']} |"
            f" {a['widest_scan_cols']} | {a['scans_with_pushdown']} |"
            f" {a['dup_scans']} | {a['codegen']} |"
        )


if __name__ == "__main__":
    main()
