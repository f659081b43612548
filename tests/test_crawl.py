"""Crawl → corpus pipeline: WARC responses become documents-shaped
rows that the existing curation plans accept unchanged."""

from __future__ import annotations

import gzip

from compendium_spark.pipeline.crawl import html_to_text, warc_responses_to_documents
from compendium_spark.sources.warc_datasource import register

from .test_sources import _make_warc_bytes


def test_html_to_text_strips_markup():
    src = (
        "<html><head><style>b{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Title</h1><p>Hello &amp; welcome<br/>to the "
        "<b>corpus</b>.</p></body></html>"
    )
    assert html_to_text(src) == "Title Hello & welcome to the corpus ."


_PAGES = [
    ("http://a.example.org/page1", b"<html><p>alpha text one</p></html>", 200),
    ("http://b.example.org/page2", b"<html><p>beta text two</p></html>", 200),
    ("http://a.example.org/gone", b"<html>not found</html>", 404),
]


def _crawl_records():
    recs = [
        (
            {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": "<urn:uuid:info>",
                "Content-Type": "application/warc-fields",
            },
            b"software: t/1",
        )
    ]
    for uri, body, status in _PAGES:
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n".encode()
            + body
        )
        recs.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{uri}>",
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    return recs


def test_warc_to_documents_end_to_end(spark, tmp_path):
    (tmp_path / "seg.warc.gz").write_bytes(
        gzip.compress(_make_warc_bytes(_crawl_records()))
    )
    register(spark)
    warc = spark.read.format("warc").load(str(tmp_path))
    docs = warc_responses_to_documents(warc)
    rows = {r["source"]: r for r in docs.collect()}
    # 404 dropped, 200s kept, markup stripped, host extracted
    assert set(rows) == {"a.example.org", "b.example.org"}
    assert rows["a.example.org"]["text"] == "alpha text one"
    assert rows["b.example.org"]["text"] == "beta text two"
    for r in rows.values():
        assert r["n_chars"] == len(r["text"])
        assert isinstance(r["doc_id"], int)
    # deterministic ids: re-reading yields identical doc_ids
    again = {
        r["source"]: r["doc_id"]
        for r in warc_responses_to_documents(
            spark.read.format("warc").load(str(tmp_path))
        ).collect()
    }
    assert again == {k: v["doc_id"] for k, v in rows.items()}


def test_crawl_documents_compose_with_curation(spark, tmp_path):
    """The produced frame drops straight into an existing dedup plan
    shape: exact dedup over normalized text finds the duplicate page."""
    from pyspark.sql import functions as F

    recs = _crawl_records()
    # duplicate page1's body under a different URI
    recs.append(
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:dup>",
                "WARC-Target-URI": "http://c.example.org/copy",
                "Content-Type": "application/http; msgtype=response",
            },
            b"HTTP/1.1 200 X\r\nContent-Type: text/html\r\n\r\n"
            b"<html><p>alpha text one</p></html>",
        )
    )
    (tmp_path / "seg.warc").write_bytes(_make_warc_bytes(recs))
    register(spark)
    docs = warc_responses_to_documents(
        spark.read.format("warc").load(str(tmp_path / "seg.warc"))
    )
    groups = (
        docs.groupBy(F.md5(F.trim(F.lower(F.col("text")))).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep"))
        .collect()
    )
    assert sorted(g["n"] for g in groups) == [1, 2]
