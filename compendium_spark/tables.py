"""Test-data table loading.

The driver provides deterministic TPC-H-ish parquet at
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md). These helpers load
them with explicit paths — in production these would be catalog tables
(``spark.table``) partitioned/bucketed per §"scale notes" in each plan
module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP.

    The driver's parquet stores `events.ts` as timezone-less
    timestamp[us]; Spark 4 infers TIMESTAMP_NTZ for it, but functions
    like ``F.unix_micros`` require TIMESTAMP. The session timezone is
    pinned to UTC (session.py), so the cast is lossless — wall-clock
    values are unchanged — and doing it once here keeps every plan free
    of per-column casts (and immune to future testdata dtype drift).
    """
    ntz_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Analyzed-scan cache: (applicationId, sf_dir, name) -> DataFrame.
# This is the session CATALOG role (the module docstring's "in
# production these would be catalog tables"): a bare
# spark.read.parquet(path) re-lists the directory, re-reads parquet
# footers and re-analyzes the relation on EVERY call — measured
# ~85 ms of driver-side work per call, ~357 load() calls per registry
# sweep. A catalog/metastore resolves a table to an already-analyzed
# relation once per session; caching the DataFrame here is exactly
# that (metadata only — the PLAN is cached, never data or results:
# every action still scans the parquet files afresh, and nothing is
# persisted). Keyed by applicationId so a stopped/rebuilt session can
# never serve stale JVM references; stale-app entries are purged on
# insert to keep the dict bounded.
_scan_cache: dict[tuple[str, str, str], DataFrame] = {}


def clear_scan_cache() -> None:
    """Invalidate every cached analyzed scan (the catalog's REFRESH
    TABLE). Needed only if files under an sf_dir are regenerated
    mid-application — cached frames pin the relation's file listing,
    so a regeneration would otherwise serve deleted/stale listings
    (ADVICE r14)."""
    _scan_cache.clear()


def table_num_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet FOOTER metadata — zero Spark jobs.

    This is the catalog-statistics read the regime guards document
    ("the count is a parquet metadata read"): a production metastore
    answers COUNT(*) bounds from table stats without scheduling a
    scan. Returns None when the footprint cannot be read (caller
    falls back to a real ``.count()`` job). Handles both a single
    ``<name>.parquet`` file and a directory of part files."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq  # noqa: PLC0415

        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(
                            os.path.join(root, f)
                        ).metadata.num_rows
            return total
        return None
    except Exception:  # noqa: BLE001 — stats miss → caller runs count()
        return None


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet → full pushdown/pruning.

    Timestamp handling has to survive driver-side data regeneration:
    older testdata stored `events.ts` as parquet TIMESTAMP(NANOS)
    (read as long + converted), newer testdata stores timestamp[us]
    with no timezone (inferred TIMESTAMP_NTZ, normalized to TIMESTAMP).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    app = spark.sparkContext.applicationId
    key = (app, os.path.abspath(sf_dir), name)
    cached = _scan_cache.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = _normalize_timestamps(df)
    else:
        df = _normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    for k in [k for k in _scan_cache if k[0] != app]:
        del _scan_cache[k]
    _scan_cache[key] = df
    return df


# Broadcast only dims whose on-disk parquet stays under this budget.
# nation/region are constant-size (25/5 rows at every SF) and always
# qualify; customer/part/supplier grow linearly with SF and fall back
# to AQE's runtime strategy choice once they outgrow the budget —
# a forced F.broadcast() on an SF-scaling table is an executor OOM at
# 100 TB, so the hint must be size-gated, never unconditional.
BROADCAST_BUDGET_BYTES = 64 * 1024 * 1024


def _on_disk_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    if not os.path.isdir(path):
        # unknown footprint must mean NO hint — os.walk on a missing
        # path yields nothing, which would read as "0 bytes, broadcast!"
        raise OSError(f"no such table path: {path}")
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def spread_parts(spark: SparkSession, sf_dir: str, name: str) -> int | None:
    """Width for the manual compute-spread repartition over ``name``,
    or None when the repartition should be SKIPPED because the scan's
    natural splits already provide it.

    The testdata tables are one parquet file each, so a heavy
    per-row stage (tokenize+shingle+md5, Arrow kernels) downstream of
    a bare scan runs on ONE core; the plan files spread such scans to
    ``defaultParallelism``. But that constant is a LOCAL-MODE fact: at
    100 TB the same table scans as thousands of natural splits and the
    unconditional repartition becomes a full shuffle of the corpus
    that only REDUCES parallelism. The r14/r15 docstrings said "at
    scale this is a no-op to remove" — by hand. This derives it
    mechanically (guide §2: scale-adaptive partitioning, never a
    constant tuned for local mode or the cluster): splits ≈ on-disk
    bytes / maxPartitionBytes; once that reaches core count the
    repartition vanishes. Below the threshold the width is exactly
    ``defaultParallelism`` — the plan at every bench SF is
    byte-identical to the constant it replaces (the r15 width-
    narrowing probe measured 16/8 WORSE for shingle-heavy plans, so
    the local width is deliberately untouched).
    """
    par = spark.sparkContext.defaultParallelism
    try:
        b = _on_disk_bytes(f"{sf_dir}/{name}.parquet")
    except OSError:
        return par  # unknown footprint: keep the conservative spread
    mpb = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default
    if b // mpb >= par:
        return None
    return par


def maybe_broadcast(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame | None = None
) -> DataFrame:
    """Load ``name`` (or take a pre-filtered ``df`` over it) and attach
    a broadcast hint only if the table's files fit the broadcast
    budget. In production (catalog tables) the same gate would read the
    catalog's table statistics instead of the filesystem."""
    out = df if df is not None else load(spark, sf_dir, name)
    try:
        small = _on_disk_bytes(f"{sf_dir}/{name}.parquet") <= BROADCAST_BUDGET_BYTES
    except OSError:
        small = False
    return F.broadcast(out) if small else out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
