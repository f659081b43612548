"""Parquet warehouse — the engine's stored-table layer.

Replaces the reference's single SQLite file (`db.py:24`) with a
directory of parquet tables, one per schema in schemas.ALL_TABLES.
`init_tables` is the idempotent DDL (`db.py:29`, `db.py:85-186`:
CREATE TABLE IF NOT EXISTS); writes go through a staging directory so
a table can be rewritten from a plan that reads it (no partial state
on failure).

At scale the warehouse maps onto a real catalog (saveAsTable +
partitioning: samples by project prefix, asv_counts bucketed by
sample); the parquet-dir form keeps the engine dependency-free here.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.operators.merge import partial_update, upsert
from compendium_spark.operators.validate import validate_schema
from compendium_spark.schemas import ALL_TABLES

# Tables stored hive-partitioned on their natural partition key. An
# upsert on a partitioned table rewrites ONLY the touched partitions
# (partition-level swap below) — at 100 TB this is the difference
# between a per-project merge costing O(project) and O(warehouse).
PARTITION_SPEC: dict[str, str] = {
    "asv_sequences": "project",
    "asv_inference": "project",
}


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, name: str) -> Path:
        if name not in ALL_TABLES:
            raise KeyError(f"unknown table {name!r}")
        return self.root / name

    def exists(self, name: str) -> bool:
        return (self.path(name) / "_SUCCESS").exists()

    def init_tables(self) -> None:
        """Idempotent: create any missing table as an empty parquet
        dataset with its declared schema."""
        for name, schema in ALL_TABLES.items():
            if not self.exists(name):
                empty = self.spark.createDataFrame([], schema)
                self._writer(name, empty).mode("overwrite").parquet(
                    str(self.path(name))
                )

    def _writer(self, name: str, df: DataFrame):
        pcol = PARTITION_SPEC.get(name)
        w = df.write
        return w.partitionBy(pcol) if pcol else w

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            return self.spark.createDataFrame([], ALL_TABLES[name])
        df = self.spark.read.schema(ALL_TABLES[name]).parquet(str(self.path(name)))
        # partition discovery may reorder columns; restore declared order
        return df.select(*[f.name for f in ALL_TABLES[name].fields])

    def write(self, name: str, df: DataFrame) -> None:
        """Full overwrite via staging dir (safe when df reads the
        target table). Schema-validated: a drifted ingest fails here,
        not at the next read."""
        df = validate_schema(df, ALL_TABLES[name], name)
        target = self.path(name)
        staging = target.with_suffix(".staging")
        self._writer(name, df).mode("overwrite").parquet(str(staging))
        if target.exists():
            shutil.rmtree(target)
        staging.rename(target)

    def append(self, name: str, df: DataFrame) -> None:
        df = validate_schema(df, ALL_TABLES[name], name)
        self._writer(name, df).mode("append").parquet(str(self.path(name)))

    def upsert(self, name: str, updates: DataFrame, key: str | list[str]) -> None:
        pcol = PARTITION_SPEC.get(name)
        if pcol is not None and self.exists(name):
            self._merge_partitions(name, updates, key, pcol)
            return
        self.write(name, upsert(self.read(name), updates, key))

    def _merge_partitions(
        self, name: str, updates: DataFrame, key: str | list[str], pcol: str
    ) -> None:
        """Partition-level MERGE: merge only the partitions the updates
        touch, stage them, then swap just those partition directories.
        Untouched partitions are never read or rewritten — the parquet
        analogue of Delta's MERGE with partition pruning."""
        touched = [r[0] for r in updates.select(pcol).distinct().collect()]
        if not touched:
            return
        # null-safe partition selection: isin() never matches NULL, so a
        # null partition value needs its own predicate
        non_null = [v for v in touched if v is not None]
        cond = F.col(pcol).isin(non_null) if non_null else F.lit(False)
        if len(non_null) != len(touched):
            cond = cond | F.col(pcol).isNull()
        current = self.read(name).filter(cond)
        merged = validate_schema(upsert(current, updates, key), ALL_TABLES[name], name)
        target = self.path(name)
        staging = target.with_suffix(".staging")
        self._writer(name, merged).mode("overwrite").parquet(str(staging))
        # Swap the partition dirs Spark actually wrote: their names carry
        # Spark's own escaping (URL-escaped specials, and
        # __HIVE_DEFAULT_PARTITION__ for null), so reconstructing
        # f"{pcol}={value}" by hand would miss any value needing escaping
        # and silently drop the merged data.
        for part_dir in sorted(staging.iterdir()):
            if not part_dir.is_dir():
                continue
            dest = target / part_dir.name
            if dest.exists():
                shutil.rmtree(dest)
            part_dir.rename(dest)
        shutil.rmtree(staging)

    def partial_update(self, name: str, updates: DataFrame, key: str | list[str]) -> None:
        self.write(name, partial_update(self.read(name), updates, key))
