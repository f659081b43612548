"""Partition-pruned merge benchmark: measure what PARTITION_SPEC buys.

tests/test_storage_partitions.py proves the IO contract (untouched
partitions' files stay byte-identical); this tool quantifies the wall
and file-count effect at a synthetic scale big enough to see it:
a samples-shaped table of N_ROWS rows across N_PARTS taxon partitions,
then one enrichment-style partial_update touching keys in exactly one
taxon, measured two ways:

  * pruned  — the shipped Warehouse.partial_update (partition-pruned
    read + merge + per-partition swap);
  * full    — the pre-round-10 behavior (read whole table, merge,
    rewrite everything), reproduced inline for the comparison.

At 100 TB the ratio is bounded by touched/total partitions; locally
the driver-side constants dominate, so read the FILE counts (exact)
alongside the wall ratio (indicative).

Usage:
    python tools/merge_bench.py [n_rows] [n_parts]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from compendium_spark.operators.merge import partial_update  # noqa: E402
from compendium_spark.schemas import SAMPLES  # noqa: E402
from compendium_spark.session import get_session  # noqa: E402
from compendium_spark.storage import Warehouse  # noqa: E402


def _files(root) -> int:
    return sum(
        1
        for p in root.rglob("*")
        if p.is_file() and not p.name.startswith("_") and not p.name.startswith(".")
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_session("merge_bench")
    import tempfile

    rows = (
        spark.range(n_rows)
        .select(
            F.format_string("SRS%09d", F.col("id")).alias("srs"),
            F.format_string("PRJ%04d", (F.col("id") % 500)).alias("project"),
            F.format_string("txid%02d", (F.col("id") % n_parts)).alias("taxon"),
        )
        .withColumns(
            {
                f.name: F.lit(None).cast(f.dataType)
                for f in SAMPLES.fields
                if f.name not in ("srs", "project", "taxon")
            }
        )
        .select(*[f.name for f in SAMPLES.fields])
    )
    updates = spark.createDataFrame(
        [(f"SRS{i:09d}", "AMPLICON") for i in range(0, n_rows, n_parts)][:2000],
        "srs string, library_strategy string",
    )  # 2000 keys, all congruent 0 mod n_parts -> ONE taxon partition

    with tempfile.TemporaryDirectory() as tmp:
        wh = Warehouse(spark, f"{tmp}/wh")
        wh.write("samples", rows)
        total_files = _files(wh.path("samples"))

        t0 = time.time()
        wh.partial_update("samples", updates, key="srs")
        pruned_s = time.time() - t0
        # files rewritten = files now newer than the pre-update write
        touched = sum(
            1
            for p in wh.path("samples").rglob("*")
            if p.is_file()
            and not p.name.startswith("_")
            and p.stat().st_mtime >= t0
        )

        # production sweep shape: the update batch CARRIES the
        # partition column (a per-project/taxon sweep knows it), so the
        # pruned path skips the key->partition mapping scan entirely
        upd_pcol = updates.withColumn("taxon", F.lit("txid00"))
        t0 = time.time()
        wh.partial_update("samples", upd_pcol, key=["srs", "taxon"])
        pruned_pcol_s = time.time() - t0

        t0 = time.time()
        merged = partial_update(wh.read("samples"), updates, key="srs")
        wh.write("samples", merged)  # the pre-r10 full-rewrite path
        full_s = time.time() - t0
        full_files = _files(wh.path("samples"))

    print(
        f"rows={n_rows} partitions={n_parts} update_keys=2000 (1 taxon)\n"
        f"pruned (keys only):    {pruned_s:.2f} s, rewrote {touched}"
        f"/{total_files} files\n"
        f"pruned (pcol carried): {pruned_pcol_s:.2f} s\n"
        f"full-rewrite form:     {full_s:.2f} s, rewrote {full_files}"
        f"/{full_files} files\n"
        f"wall ratios vs full: {full_s / pruned_s:.2f}x / "
        f"{full_s / pruned_pcol_s:.2f}x"
    )


if __name__ == "__main__":
    main()
