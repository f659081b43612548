"""FASTA as a Spark 4 Python DataSource: ``spark.read.format("fasta")``.

The catalog-integrated form of the S6 source (SURVEY §2.1,
reference `/root/reference/projects.py:446-459`): the same strict
2-line record format (`>header` then sequence, leading `>` stripped),
but registered as a first-class format so FASTA paths compose with the
normal reader API — schema projection, `.filter`, downstream joins —
instead of the text+window pairing in `fasta.py`.

Scale model: one input partition per file (a FASTA *record* spans two
lines, so naive byte-range splits would tear records; multi-GB single
files would extend `partitions()` with byte ranges re-aligned to the
next ``>`` boundary, the same recovery rule Hadoop's text splits use
for newlines). Many-file corpora — the common case for reference
pipelines, one file per project — parallelize file-per-task with no
shuffle.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FastaPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastaDataSource(DataSource):
    """``spark.read.format("fasta").load(path_or_glob)``."""

    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return "asv string, seq string, file string"

    def reader(self, schema) -> "FastaReader":  # noqa: ANN001
        return FastaReader(self.options)


class FastaReader(DataSourceReader):
    def __init__(self, options):  # noqa: ANN001
        path = options.get("path")
        if not path:
            raise ValueError("fasta source requires a path")
        self._paths = sorted(
            p
            for p in (
                glob.glob(os.path.join(path, "*")) if os.path.isdir(path) else glob.glob(path)
            )
            if os.path.isfile(p)
        )

    def partitions(self) -> list[_FastaPartition]:
        # One task per file; empty list is invalid, so fall back to a
        # single no-op partition for an empty glob.
        return [_FastaPartition(p) for p in self._paths] or [_FastaPartition("")]

    def read(self, partition: _FastaPartition) -> Iterator[tuple]:
        if not partition.path:
            return
        header: str | None = None
        with open(partition.path, encoding="utf-8") as fh:
            for raw in fh:
                line = raw.rstrip("\n")
                if not line:
                    continue
                if line.startswith(">"):
                    header = line[1:]  # projects.py:455 strip
                elif header is not None:
                    yield (header, line, partition.path)
                    header = None


def register(spark) -> None:  # noqa: ANN001
    """Idempotently register the format on a session."""
    try:
        spark.dataSource.register(FastaDataSource)
    except Exception as exc:  # already registered
        if "already" not in str(exc).lower():
            raise
