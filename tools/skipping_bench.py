"""Layout × data-skipping A/B: measure how much scan I/O the manifest
column stats (storage_versioned) save under a clustered layout vs a
scattered one — the zone-map story, quantified on real data.

The mechanism being measured: every VersionedWarehouse commit records
per-file (min, max, null_count) from the parquet footers;
``read(..., where=...)`` drops files whose range provably cannot
match. How much that saves is pure LAYOUT: a time-range probe against
a table clustered on the time column touches the few files whose
ranges intersect; the same probe against a scattered layout touches
every file, because every file's range spans the whole domain.

At 100 TB this is the difference between a scan planning step that
schedules ~1/N of the files and one that schedules all of them — the
reason Delta/Iceberg pair OPTIMIZE ZORDER with stats pruning. The
write-side cost of clustering is one repartitionByRange (a shuffle you
pay once, amortized over every subsequent probe).

Usage:
    python tools/skipping_bench.py            # sf0.1, 16 files
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from compendium_spark.session import get_session  # noqa: E402
from compendium_spark.storage_versioned import VersionedWarehouse  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 16

PROBES = [
    (
        "1-month ship window",
        [("l_shipdate", ">=", datetime(1995, 1, 1)),
         ("l_shipdate", "<", datetime(1995, 2, 1))],
    ),
    (
        "1-year ship window",
        [("l_shipdate", ">=", datetime(1995, 1, 1)),
         ("l_shipdate", "<", datetime(1996, 1, 1))],
    ),
    (
        "point orderkey",
        [("l_orderkey", "=", 1)],
    ),
]


def build(spark, root: str, layout: str) -> VersionedWarehouse:
    src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    wh = VersionedWarehouse(
        spark,
        root,
        extra_tables={"lineitem": src.schema},
        # point-lookup hints (VERDICT r11 #7): per-file bloom over the
        # key column, harvested at commit — the only pruner that works
        # for `key = ?` on the scattered layout, where every file's
        # [min, max] spans the whole key domain
        hint_columns={"lineitem": ["l_orderkey"]},
    )
    if layout == "clustered":
        # range-cluster on the probe column: files get disjoint spans
        df = src.repartitionByRange(N_FILES, "l_shipdate").sortWithinPartitions(
            "l_shipdate"
        )
    else:
        # scatter: every file a uniform slice of the whole domain
        df = src.repartition(N_FILES)
    wh.write("lineitem", df)
    return wh


def measure(wh: VersionedWarehouse, where) -> tuple[int, int, int, float, int]:
    kept, skipped = wh.scan_files("lineitem", where=where)
    man = wh.manifest("lineitem", wh.latest("lineitem"))
    tdir = wh._tdir("lineitem")
    kept_bytes = sum((tdir / f).stat().st_size for f in kept)
    best = float("inf")
    rows = 0
    for _ in range(3):
        t0 = time.time()
        rows = wh.read("lineitem", where=where).count()
        best = min(best, time.time() - t0)
    return len(kept), len(skipped), kept_bytes, best, rows


def main() -> None:
    spark = get_session("skipping-bench")
    base = tempfile.mkdtemp(prefix="cs_skipping_bench_")
    try:
        whs = {
            layout: build(spark, f"{base}/{layout}", layout)
            for layout in ("scattered", "clustered")
        }
        print("## Layout × data skipping (tools/skipping_bench.py)")
        print()
        print(f"lineitem @ {SF_DIR}, {N_FILES} files per layout; scan wall is")
        print("min-of-3 of `read(where=...).count()`. Same rows either way —")
        print("pruning is plan-time I/O elision, the residual filter keeps")
        print("semantics.")
        print()
        print("| probe | layout | files kept | bytes read | scan wall | rows |")
        print("|---|---|---|---|---|---|")
        for label, where in PROBES:
            row_check = set()
            for layout, wh in whs.items():
                k, s, kb, t, rows = measure(wh, where)
                row_check.add(rows)
                print(
                    f"| {label} | {layout} | {k}/{k + s} "
                    f"| {kb / 1e6:.1f} MB | {t:.3f} s | {rows} |"
                )
            assert len(row_check) == 1, f"layouts disagree on {label}"
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
