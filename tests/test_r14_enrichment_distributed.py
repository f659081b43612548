"""VERDICT r13 #6: the distributed enrichment twin — batch-id
partitions → mapInPandas transport (same make_eutils_fetch seam) →
staging DataFrame → idempotent MERGE — unit-tested alongside the
serial reference-parity loop.

The injected transport synthesizes a valid EFetch response from the
accessions the adapter itself put into the ESearch URL, so URL
building, WebEnv threading, parsing and staging are all exercised
through the UNMOCKED path inside executors. Pins:
  * staged rows equal the serial loop's rows on the same batches;
  * a failing batch lands as an ERROR ROW; non-consecutive failures
    pass check_two_strikes, consecutive ones raise TwoStrikeError
    (the reference's db.py:292 rule, applied post hoc);
  * UrlTooLongError fails the JOB (reference exit(1)), never a row;
  * the staged frame MERGEs via apply_enrichment identically to the
    serial path.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from compendium_spark.pipeline.enrichment import (
    TwoStrikeError,
    UPDATE_FIELDS,
    apply_enrichment,
    check_two_strikes,
    fetch_batches,
    fetch_batches_distributed,
    make_eutils_fetch,
    with_batch_ids,
)

ESEARCH_OK = "<eSearchResult><WebEnv>NCID_TEST_01</WebEnv></eSearchResult>"


def _efetch_xml(accs):
    pkgs = "".join(
        f"""<EXPERIMENT_PACKAGE>
  <EXPERIMENT><LIBRARY_STRATEGY>AMPLICON</LIBRARY_STRATEGY>
  <LIBRARY_SOURCE>METAGENOMIC</LIBRARY_SOURCE>
  <INSTRUMENT_MODEL>Illumina MiSeq</INSTRUMENT_MODEL></EXPERIMENT>
  <SAMPLE accession="{a}">
    <EXTERNAL_ID namespace="BioProject">PRJ{a[-3:]}</EXTERNAL_ID>
  </SAMPLE>
  <RUN accession="SRR{a[3:]}" published="2020-01-0{int(a[-1]) % 9 + 1}"
       total_bases="{1000 + int(a[-3:])}"/>
</EXPERIMENT_PACKAGE>"""
        for a in accs
    )
    return f"<EXPERIMENT_PACKAGE_SET>{pkgs}</EXPERIMENT_PACKAGE_SET>"


def _transport_factory(fail_accs=()):
    """Builds the REAL two-request adapter around a synthetic wire:
    ESearch echoes a WebEnv; EFetch answers with packages for exactly
    the accessions the adapter batched. Batches containing any
    ``fail_accs`` member raise ConnectionError at the ESearch hop."""
    fail = set(fail_accs)

    def factory():
        state = {}

        def get(url):
            if "esearch" in url:
                accs = re.findall(r"(SRS\d+)\[accn\]", url)
                if fail & set(accs):
                    raise ConnectionError("synthetic transport down")
                state["accs"] = accs
                return ESEARCH_OK
            return _efetch_xml(state["accs"])

        return make_eutils_fetch(get=get, sleep=lambda s: None)

    return factory


def _candidates(spark, n=7):
    return spark.createDataFrame(
        [(f"SRS00{i}",) for i in range(1, n + 1)], "srs string"
    )


def _staged_rows(df):
    return {
        r["srs"]: (r["srr"], r["project"], r["total_bases"])
        for r in df.collect()
        if r["srs"] is not None
    }


def test_distributed_equals_serial_on_same_batches(spark):
    batched = with_batch_ids(_candidates(spark), per_query=3)  # 3 batches
    staged = fetch_batches_distributed(batched, _transport_factory())
    good = check_two_strikes(staged)

    serial_batches = [
        [r["srs"] for r in batched.filter(F.col("batch") == b).orderBy("srs").collect()]
        for b in range(3)
    ]
    serial = fetch_batches(serial_batches, _transport_factory()())
    assert _staged_rows(good) == {
        d["srs"]: (d["srr"], d["project"], d["total_bases"]) for d in serial
    }
    # batch ids rode through for lineage/debugging
    assert {r["batch"] for r in good.collect()} == {0, 1, 2}


def test_failed_batch_is_an_error_row_not_a_crash(spark):
    batched = with_batch_ids(_candidates(spark), per_query=3)
    # batch 1 holds SRS004 (sorted srs order): it fails; 0 and 2 pass
    staged = fetch_batches_distributed(
        batched, _transport_factory(fail_accs=["SRS004"])
    )
    errs = staged.filter(F.col("error").isNotNull()).collect()
    assert len(errs) == 1 and errs[0]["batch"] == 1
    assert "ConnectionError" in errs[0]["error"]
    good = check_two_strikes(staged)  # 1 failure, non-consecutive: OK
    assert set(_staged_rows(good)) == {
        "SRS001", "SRS002", "SRS003", "SRS007"
    }


def test_two_consecutive_failed_batches_bail(spark):
    batched = with_batch_ids(_candidates(spark), per_query=3)
    staged = fetch_batches_distributed(
        batched, _transport_factory(fail_accs=["SRS004", "SRS007"])
    )
    with pytest.raises(TwoStrikeError):
        check_two_strikes(staged)  # batches 1 AND 2 failed


def test_url_too_long_fails_the_job(spark):
    """The reference exit(1)s on the length guard; in the distributed
    twin that surfaces as a failed Spark job, not an error row."""
    many = spark.createDataFrame(
        [(f"SRS{i:09d}",) for i in range(200)], "srs string"
    )
    batched = with_batch_ids(many, per_query=200)  # one overlong batch
    with pytest.raises(Exception, match="TOO LONG"):
        fetch_batches_distributed(batched, _transport_factory()).collect()


def test_staged_frame_merges_like_the_serial_path(spark):
    samples = spark.createDataFrame(
        [
            ("SRS001", None, None, None, None, None, None, None),
            ("SRS002", None, None, None, None, None, None, None),
            ("SRS999", "KEEP", None, None, None, None, None, None),
        ],
        "srs string, project string, srr array<string>, "
        "library_strategy string, library_source string, "
        "pubdate string, total_bases bigint, instrument string",
    )
    batched = with_batch_ids(_candidates(spark, n=2), per_query=2)
    good = check_two_strikes(
        fetch_batches_distributed(batched, _transport_factory())
    )
    merged = apply_enrichment(samples, good.select("srs", *UPDATE_FIELDS))
    got = {r["srs"]: r for r in merged.collect()}
    assert got["SRS001"]["srr"] == ["SRR001"]
    assert got["SRS001"]["library_strategy"] == "AMPLICON"
    assert got["SRS002"]["total_bases"] == 1002
    assert got["SRS999"]["project"] == "KEEP"  # untouched bystander
