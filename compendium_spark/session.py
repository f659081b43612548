"""SparkSession factory tuned for the engine.

Local-mode settings mirror what we would set on a real cluster where it
matters for plan shape (AQE, adaptive coalescing, broadcast threshold,
session timezone); ``spark.sql.shuffle.partitions`` is sized to cores
locally and would be sized to ~2-3x total executor cores at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "compendium_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    AQE is on: at 100 TB it handles skew-join splitting and post-shuffle
    partition coalescing at runtime, which no static setting can.
    Arrow is on: every Pandas-UDF operator in this package moves data
    JVM<->Python in columnar batches, not rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Timezone-less parquet timestamps read as TIMESTAMP (UTC), not
        # TIMESTAMP_NTZ: keeps unix_micros()/time funcs valid directly on
        # the scan output (no cast Project) regardless of how the driver
        # regenerates testdata. tables._normalize_timestamps covers
        # sessions not built through this factory.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Write timestamps as INT64 micros, not Spark's legacy INT96:
        # INT96 carries NO parquet column statistics, which silently
        # disables both parquet row-group pushdown and the versioned
        # warehouse's manifest-stats file skipping on every time
        # column — the single most common pruning axis at scale.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Generated-class compile cache (static conf, default 100
        # entries). A session running this engine's full registry
        # compiles ~18 distinct codegen classes per plan, so at the
        # default size every re-run of a plan misses the cache and
        # re-invokes Janino for every WholeStageCodegen/projection in
        # it: measured 1687 compiles on the FIRST sweep of 60 plans
        # and 1718 AGAIN on the second sweep (~0.3 s of driver-side
        # compile work per plan per run, plus the JIT churn of ~3400
        # throwaway classes). At 8192 entries the second sweep
        # compiles 10. Not a local-only win: any long-lived session
        # serving a many-query workload (the 100 TB posture is exactly
        # that) pays the same recompile tax; sized to ~1.5x the
        # registry's distinct-class count, env-overridable.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "8192"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
