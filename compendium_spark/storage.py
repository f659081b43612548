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

from compendium_spark.operators.merge import partial_update, upsert
from compendium_spark.schemas import ALL_TABLES


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
                empty.write.mode("overwrite").parquet(str(self.path(name)))

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            return self.spark.createDataFrame([], ALL_TABLES[name])
        return self.spark.read.schema(ALL_TABLES[name]).parquet(str(self.path(name)))

    def write(self, name: str, df: DataFrame) -> None:
        """Full overwrite via staging dir (safe when df reads the
        target table)."""
        target = self.path(name)
        staging = target.with_suffix(".staging")
        df.write.mode("overwrite").parquet(str(staging))
        if target.exists():
            shutil.rmtree(target)
        staging.rename(target)

    def append(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(str(self.path(name)))

    def upsert(self, name: str, updates: DataFrame, key: str | list[str]) -> None:
        self.write(name, upsert(self.read(name), updates, key))

    def partial_update(self, name: str, updates: DataFrame, key: str | list[str]) -> None:
        self.write(name, partial_update(self.read(name), updates, key))
