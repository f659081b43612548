"""WARC (Web ARChive) as a Spark 4 Python DataSource:
``spark.read.format("warc")``.

WARC is the crawl interchange format every web-scale training corpus
starts from (Common Crawl ships it); ingesting it is the first stage
of an LLM data pipeline. This reader parses the WARC/1.0 record
framing — a version line, CRLF-separated named headers, then exactly
``Content-Length`` bytes of payload, then a blank-line record
separator — and yields one row per record with the headers that
matter downstream (record type, target URI, date, content type,
record id) plus the raw payload bytes as a BINARY column for the
multimodal/text operators to decode.

Supported on-disk forms: plain ``.warc`` and whole-file-gzipped
``.warc.gz`` (decompressed streamwise — a gzip member concatenation,
the common per-record-gzip layout, decompresses transparently the
same way because gzip members concatenate).

Scale model: one input partition per file — the Common Crawl layout
is many ~1 GB segment files, so file-per-task parallelism is the
natural unit and needs no shuffle. Records inside a file MUST be read
sequentially (framing is length-prefixed, and per-record gzip members
don't self-identify offsets without an index); splitting within a
file would require a ``.cdx`` offset index, which is exactly how
production crawls do it — ``partitions()`` is the extension point.
Malformed trailing garbage ends the file's record stream rather than
killing the task (torn final records are a fact of crawl life); the
count of bytes skipped is surfaced per-row-stream via the
``truncated`` flag on the last record.
"""

from __future__ import annotations

import glob
import gzip
import io
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WARC_SCHEMA = (
    "record_id string, record_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary, truncated boolean, file string"
)


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _open(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")


def parse_warc(fh: io.BufferedReader, file_label: str) -> Iterator[tuple]:
    """Parse one WARC stream. Yields schema-shaped tuples; stops (with
    a truncated=True final record when applicable) on torn framing."""
    while True:
        # skip inter-record blank lines
        line = fh.readline()
        while line in (b"\r\n", b"\n"):
            line = fh.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            # trailing garbage / torn record boundary: end the stream
            return
        headers: dict[str, str] = {}
        while True:
            hline = fh.readline()
            if hline in (b"\r\n", b"\n", b""):
                break
            try:
                k, _, v = hline.decode("utf-8", "replace").partition(":")
            except Exception:
                continue
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = fh.read(length)
        truncated = len(payload) < length
        yield (
            headers.get("warc-record-id", ""),
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            headers.get("content-type", ""),
            length,
            payload,
            truncated,
            file_label,
        )
        if truncated:
            return


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(path_or_glob)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> "WarcReader":  # noqa: ANN001
        return WarcReader(self.options)


class WarcReader(DataSourceReader):
    def __init__(self, options):  # noqa: ANN001
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a path")
        self._paths = sorted(
            p
            for p in (
                glob.glob(os.path.join(path, "*"))
                if os.path.isdir(path)
                else glob.glob(path)
            )
            if os.path.isfile(p)
        )

    def partitions(self) -> list[_WarcPartition]:
        return [_WarcPartition(p) for p in self._paths] or [_WarcPartition("")]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        if not partition.path:
            return
        with _open(partition.path) as fh:
            yield from parse_warc(fh, os.path.basename(partition.path))


def register(spark) -> None:  # noqa: ANN001
    """Idempotently register the format on a session."""
    try:
        spark.dataSource.register(WarcDataSource)
    except Exception as exc:  # already registered
        if "already" not in str(exc).lower():
            raise
