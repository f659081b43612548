"""Dump explain('formatted') for named plans to an output directory.

Usage:
    python tools/dump_explain.py --plans a,b,c --tag before \
        [--out /root/repo/plans/r15] [--sf-dir /root/testdata/sf0.1]

Runs from any checkout (the repo root is derived from this file), so a
git worktree at an older commit can write its dumps into the main
tree's plans/rN directory for before/after diffs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from compendium_spark.plans import all_plans
    from compendium_spark.session import get_session

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump_explain")
    plans = all_plans()
    for name in args.plans.split(","):
        df = plans[name].fn(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
