"""Crawl → corpus: turn WARC response records into `documents`-shaped
rows ready for the curation plans.

The missing first mile of the training-data pipeline: everything in
plans/curation.py, plans/quality.py and the dedup family operates on a
``documents(doc_id, text, lang, source, n_chars)`` frame; this module
produces that frame from raw crawl archives read through the WARC
DataSource (sources/warc_datasource.py). Stages — all scan-stage
expression work, no shuffle until the caller aggregates:

1. keep ``response`` records with an HTTP 200 status line and an
   HTML-ish content type;
2. split HTTP headers from the body (first CRLFCRLF), decode UTF-8
   with replacement (crawl bytes are dirty by definition);
3. strip markup: drop script/style subtrees, strip tags, unescape the
   common entities, collapse whitespace — the html2text-lite every
   crawl pipeline starts with (a production pipeline swaps in a real
   extractor like trafilatura INSIDE the same mapInPandas seam);
4. derive the standard corpus columns: doc_id (xxhash64 of URI —
   deterministic, re-ingestion produces identical ids), source (URI
   host), n_chars, and a cheap lang guess hook (left 'und' here;
   plans/text.text_lang_id is the real classifier and composes
   downstream).

Scale: WARC files parallelize file-per-task; both the HTML strip and
the header split are per-row expression work inside one mapInPandas
pass (the payload bytes never reach a shuffle); output is a plain
DataFrame any curation plan accepts.
"""

from __future__ import annotations

import html
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCRIPT_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")


def html_to_text(markup: str) -> str:
    """Markup → visible text (html2text-lite; see module docstring)."""
    no_blocks = _SCRIPT_RE.sub(" ", markup)
    no_tags = _TAG_RE.sub(" ", no_blocks)
    return _WS_RE.sub(" ", html.unescape(no_tags)).strip()


def warc_responses_to_documents(warc: DataFrame) -> DataFrame:
    """WARC rows (sources/warc_datasource schema) → documents-shaped
    frame. Pure DataFrame + one Arrow pass for the HTML strip."""
    import pandas as pd  # noqa: PLC0415

    responses = warc.filter(
        (F.col("record_type") == "response")
        & F.col("content_type").startswith("application/http")
        & ~F.col("truncated")
    ).select("target_uri", "payload")

    def extract(batches):
        for pdf in batches:
            uris, texts = [], []
            for uri, payload in zip(pdf["target_uri"], pdf["payload"]):
                raw = bytes(payload)
                head, sep, body = raw.partition(b"\r\n\r\n")
                if not sep:
                    continue
                status = head.split(b"\r\n", 1)[0]
                # explicit status-token parse — a substring test over
                # the whole line would accept any reason phrase
                # containing " 200" and malformed lines
                parts = status.split()
                if len(parts) < 2 or parts[1] != b"200":
                    continue
                if b"text/html" not in head.lower() and not body.lstrip()[
                    :1
                ].startswith(b"<"):
                    # non-HTML 200s (images etc.) belong to the
                    # multimodal path, not the text corpus
                    continue
                text = html_to_text(body.decode("utf-8", "replace"))
                if text:
                    uris.append(uri)
                    texts.append(text)
            yield pd.DataFrame({"target_uri": uris, "text": texts})

    extracted = responses.mapInPandas(
        extract, schema="target_uri string, text string"
    )
    host = F.regexp_extract(F.col("target_uri"), r"^[a-z]+://([^/]+)", 1)
    return extracted.select(
        F.xxhash64("target_uri").alias("doc_id"),
        "text",
        F.lit("und").alias("lang"),
        host.alias("source"),
        F.length("text").alias("n_chars"),
    )
