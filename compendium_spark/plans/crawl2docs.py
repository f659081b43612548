"""crawl_to_documents — the crawl→corpus extraction pipeline
(pipeline/crawl.py) as an oracle-checked plan.

The pipeline's unit tests drive it from WARC fixture bytes; this plan
puts the SAME code path under the driver's value-hash gate by
fabricating HTTP response records deterministically from `documents`
(the multimodal plans' fixture pattern): every row becomes a full
HTTP/1.1 response whose HTML body wraps the document text in markup
with a script block, a style block and extra whitespace, and rows are
routed through the pipeline's reject branches by doc_id residue —
%7==0 gets a 404 status line, %7==1 arrives truncated, %7==2 is a
`request` record. `warc_responses_to_documents` must drop exactly
those and emit, for the survivors, the stripped text ("Doc <id> " +
whitespace-collapsed body), the URI host, and length — every one of
which the DuckDB oracle recomputes symbolically from the same
`documents` rows. The pipeline's xxhash64 doc ids are exercised (and
their determinism unit-tested in tests/test_crawl.py) but not emitted:
DuckDB has no xxhash64, so the plan round-trips the ORIGINAL doc id
through the synthetic URI instead, proving the URI/payload plumbing
end-to-end.

Scale: payload fabrication is scan-stage expression work; extraction
is the pipeline's one mapInPandas pass (payload bytes never shuffle);
the only shuffle is the final presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.pipeline.crawl import warc_responses_to_documents
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

CRAWL2DOCS_SQL = r"""
SELECT doc_id AS orig_id,
       'd' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' AS source,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' '
         || TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')) AS text,
       CAST(LENGTH('Doc ' || CAST(doc_id AS VARCHAR) || ' '
         || TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS BIGINT)
         AS n_chars
FROM documents
WHERE doc_id % 7 NOT IN (0, 1, 2)
  AND regexp_matches(text, '^[ -~]*$')
  AND NOT regexp_matches(text, '[<>&]')
  AND TRIM(text) <> ''
ORDER BY orig_id
"""


@plan("crawl_to_documents", oracle=CRAWL2DOCS_SQL)
def crawl_to_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricated-HTTP crawl extraction under the hash gate — see
    module docstring. The input domain is made EXPLICIT so the plan is
    total over it: printable ASCII only (Python's ``\\s`` collapses
    unicode whitespace like \\xa0 that RE2's ``\\s`` keeps — the one
    place the pipeline and the oracle could disagree), no [<>&] (keeps
    the HTML strip exactly invertible in SQL), and non-blank after
    trim (a whitespace-only body would strip to "Doc <id>" while the
    oracle keeps the trailing space and the id round-trip regex needs
    it). All three guards are applied identically on both engines."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("^[ -~]*$"))
        .filter(~F.col("text").rlike("[<>&]"))
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", "text")
    )
    res = F.col("doc_id") % 7
    status = F.when(
        res == 0, F.lit("HTTP/1.1 404 Not Found")
    ).otherwise(F.lit("HTTP/1.1 200 OK"))
    uri = F.concat(
        F.lit("http://d"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.org/doc/"),
        F.col("doc_id").cast("string"),
    )
    body = F.concat(
        F.lit(
            "<html><head><style>p{margin:0}</style>"
            "<script>var t='ignore me';</script></head>"
            "<body><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1>  <p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    payload = F.encode(
        F.concat(
            status,
            F.lit("\r\nContent-Type: text/html\r\n\r\n"),
            body,
        ),
        "utf-8",
    )
    warc_shaped = docs.select(
        uri.alias("target_uri"),
        payload.alias("payload"),
        F.when(res == 2, F.lit("request"))
        .otherwise(F.lit("response"))
        .alias("record_type"),
        F.lit("application/http; msgtype=response").alias("content_type"),
        (res == 1).alias("truncated"),
        F.col("doc_id").alias("orig_id"),
    )
    extracted = warc_responses_to_documents(
        warc_shaped.drop("orig_id")
    )
    # round-trip the original id out of the synthetic URI the pipeline
    # carried through extraction (pipeline emits host as `source`;
    # the id is recoverable from the stripped text's "Doc <id>" lead)
    return (
        extracted.select(
            F.regexp_extract("text", r"^Doc (\d+) ", 1)
            .cast("long")
            .alias("orig_id"),
            "source",
            "text",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("orig_id")
    )
