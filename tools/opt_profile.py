"""Per-plan optimization profiler (round 14).

For each named plan: run it ``--reps`` times (min taken) under BOTH the
bench action (``.count()``) and the guide §1.4 noop sink (computes every
column, isolates computation from the sink), label the jobs so a UI /
event-log reader can attribute stages, and optionally dump
``explain('formatted')`` to ``plans/r15/<name>_<tag>.txt``.

Usage:
    python tools/opt_profile.py --plans a,b,c [--reps 3] [--explain-tag before]
    python tools/opt_profile.py --worst 15 [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default="")
    ap.add_argument("--worst", type=int, default=0,
                    help="profile the N worst plans of BENCH_DETAIL_r14.json")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--explain-tag", default="",
                    help="if set, write plans/r15/<name>_<tag>.txt")
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop-sink action")
    args = ap.parse_args()

    from compendium_spark.plans import all_plans
    from compendium_spark.session import get_session

    plans = all_plans()
    names = [n for n in args.plans.split(",") if n]
    if args.worst:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_DETAIL_r14.json")) as f:
            q = json.load(f)["queries"]
        names += [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.worst]
                  if k not in names]
    for n in names:
        if n not in plans:
            print(f"unknown plan: {n}", file=sys.stderr)
            return 1

    spark = get_session("opt_profile")
    # same warmup as bench.py: JVM + Python daemon pool
    plans["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()
    (
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: (pdf for pdf in it), schema="id long")
        .count()
    )

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    if args.explain_tag:
        os.makedirs(out_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = plans[name].fn
        tc = []
        tn = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.perf_counter()
            rows = fn(spark, args.sf_dir).count()
            tc.append(time.perf_counter() - t0)
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                tn.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "count_min": round(min(tc), 3),
            "count_all": [round(t, 3) for t in tc],
            "rows": rows,
        }
        if tn:
            results[name]["noop_min"] = round(min(tn), 3)
        line = f"{name}: count={min(tc):.3f}s rows={rows}"
        if tn:
            line += f" noop={min(tn):.3f}s"
        print(line, flush=True)
        if args.explain_tag:
            df = fn(spark, args.sf_dir)
            path = os.path.join(out_dir, f"{name}_{args.explain_tag}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
    print(json.dumps(results, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
