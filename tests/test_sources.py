"""Source parsers: BioSample XML, FASTA, summary/counts/taxonomy TSVs."""

from __future__ import annotations

import textwrap

import pytest

from compendium_spark.sources.biosample_xml import read_biosample_xml, to_samples, to_tags
from compendium_spark.sources.fasta import read_fasta
from compendium_spark.sources.tsv import (
    assemble_asv_tables,
    melt_counts,
    read_counts_wide,
    read_summary,
    read_taxonomy,
)

BIOSAMPLE_XML = """<?xml version="1.0"?>
<BioSampleSet>
  <BioSample>
    <Ids>
      <Id db="BioSample">SAMN001</Id>
      <Id db="SRA">SRS001</Id>
    </Ids>
    <Attributes>
      <Attribute attribute_name="geo loc name" harmonized_name="geo_loc_name">USA: Minnesota</Attribute>
      <Attribute attribute_name="host body product">Stool</Attribute>
      <Attribute attribute_name="host body product">FECAL</Attribute>
      <Attribute attribute_name="empty"></Attribute>
    </Attributes>
  </BioSample>
  <BioSample>
    <Ids><Id db="BioSample">SAMN002</Id></Ids>
    <Attributes>
      <Attribute attribute_name="ignored">nope</Attribute>
    </Attributes>
  </BioSample>
  <BioSample>
    <Ids><Id db="SRA">SRS003</Id></Ids>
    <Attributes>
      <Attribute attribute_name="env">Soil</Attribute>
    </Attributes>
  </BioSample>
</BioSampleSet>
"""


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("xml") / "biosamples.xml"
    p.write_text(BIOSAMPLE_XML)
    return str(p)


def test_xml_skips_samples_without_sra_id(spark, xml_path):
    parsed = read_biosample_xml(spark, xml_path)
    srs = sorted(r.srs for r in parsed.select("srs").collect())
    assert srs == ["SRS001", "SRS003"]  # SAMN002 skipped (db.py:233-237)


def test_xml_tag_semantics(spark, xml_path):
    """harmonized_name precedence, lower(), empty-skip, last-wins."""
    parsed = read_biosample_xml(spark, xml_path)
    tags = to_tags(parsed)
    rows = {(r.srs, r.tag): r.value for r in tags.collect()}
    assert rows[("SRS001", "geo_loc_name")] == "usa: minnesota"  # harmonized + lower
    assert rows[("SRS001", "host body product")] == "fecal"  # duplicate → last wins
    assert ("SRS001", "empty") not in rows  # empty text skipped
    assert rows[("SRS003", "env")] == "soil"
    # deterministic tagid
    ids = [r.tagid for r in tags.collect()]
    assert len(ids) == len(set(ids))


def test_xml_to_samples_anti_join(spark, xml_path):
    parsed = read_biosample_xml(spark, xml_path)
    existing = spark.createDataFrame([("SRS001",)], "srs string")
    out = to_samples(parsed, taxon="txid408170", existing=existing)
    rows = out.collect()
    assert [(r.srs, r.taxon) for r in rows] == [("SRS003", "txid408170")]


FASTA = ">ASV_1\nCCTACGGGAGGCAGCAG\n>ASV_2\nTTGACGTTACCCGCAGA\n"


def test_fasta_pairing(spark, tmp_path):
    p = tmp_path / "ASVs.fa"
    p.write_text(FASTA)
    df = read_fasta(spark, str(p))
    rows = {r.asv: r.seq for r in df.collect()}
    assert rows == {"ASV_1": "CCTACGGGAGGCAGCAG", "ASV_2": "TTGACGTTACCCGCAGA"}


SUMMARY_PAIRED = textwrap.dedent(
    """\
    \tdinput\tfilter\tforwd\trevse\tmerged\tlength\tnonchim
    SRR001_1.fastq\t50000\t48000\t47000\t46500\t45000\t44800\t44000
    SRR002_1.fastq\t60000\t58000\t57000\t56500\t55000\t54800\t54000
    """
)

SUMMARY_SINGLE = textwrap.dedent(
    """\
    \tdinput\tfilter\tforwd\tlength\tnonchim
    SRR003_1.fastq\t50000\t48000\t47000\t46800\t46000
    """
)


def test_summary_paired(spark, tmp_path):
    p = tmp_path / "summary.tsv"
    p.write_text(SUMMARY_PAIRED)
    df = read_summary(spark, str(p), project="PRJ1")
    rows = {r.srr: r for r in df.collect()}
    assert set(rows) == {"SRR001", "SRR002"}  # 8-char suffix stripped
    assert rows["SRR001"].is_paired is True
    assert rows["SRR001"].merged == 45000
    assert rows["SRR001"].project == "PRJ1"


def test_summary_single_end(spark, tmp_path):
    p = tmp_path / "summary_se.tsv"
    p.write_text(SUMMARY_SINGLE)
    df = read_summary(spark, str(p))
    r = df.collect()[0]
    assert r.srr == "SRR003"
    assert r.is_paired is False
    assert r.revse is None and r.merged is None


COUNTS = "\tSRR001\tSRR002\tSRR003\nASV_1\t23\t0\t114\nASV_2\t0\t7\t9\n"


def test_melt_counts_drops_zeros(spark, tmp_path):
    p = tmp_path / "ASVs_counts.tsv"
    p.write_text(COUNTS)
    wide = read_counts_wide(spark, str(p))
    long = melt_counts(wide)
    cells = {(r.sample, r.asv): r["count"] for r in long.collect()}
    assert cells == {
        ("SRR001", "ASV_1"): 23,
        ("SRR003", "ASV_1"): 114,
        ("SRR002", "ASV_2"): 7,
        ("SRR003", "ASV_2"): 9,
    }  # zero cells dropped (projects.py:438)
    ids = [r.entryid for r in long.collect()]
    assert len(ids) == len(set(ids))


TAXONOMY = (
    "\tKingdom\tPhylum\tClass\tOrder\tFamily\tGenus\n"
    "ASV_1\tBacteria\tBacteroidota\tBacteroidia\tBacteroidales\tBacteroidaceae\tBacteroides\n"
    "ASV_2\tBacteria\tFirmicutes\tClostridia\tOscillospirales\tRuminococcaceae\t\n"
)


def test_taxonomy_and_assembly(spark, tmp_path):
    tax_p = tmp_path / "ASVs_taxonomy.tsv"
    tax_p.write_text(TAXONOMY)
    fa_p = tmp_path / "ASVs.fa"
    fa_p.write_text(FASTA)
    tax = read_taxonomy(spark, str(tax_p))
    assert tax.collect()[0].tdatabase == "silva_nr99_v138_train_set"  # projects.py:517
    fasta = read_fasta(spark, str(fa_p))
    seqs, assigns = assemble_asv_tables(fasta, tax, project="PRJ1")
    s = {r.asv: r.asv_id for r in seqs.collect()}
    a = {r.asv_id for r in assigns.collect()}
    # deterministic key join: assignments carry the same asv_id without
    # any read-back (the reference's J3 remap join is gone)
    assert set(s.values()) == a


def test_fasta_datasource_format(spark, tmp_path):
    """spark.read.format('fasta') — the Spark 4 Python DataSource form
    of S6 — must agree with the text+window parser and parallelize one
    partition per file."""
    from compendium_spark.sources.fasta_datasource import register

    for i, (asv, seq) in enumerate(
        [("ASV_1", "CCTACGGGAGGCAGCAG"), ("ASV_2", "TTGACGTTACCCGCAGA")]
    ):
        (tmp_path / f"f{i}.fa").write_text(f">{asv}\n{seq}\n")
    register(spark)
    df = spark.read.format("fasta").load(str(tmp_path))
    rows = {r.asv: r.seq for r in df.collect()}
    assert rows == {"ASV_1": "CCTACGGGAGGCAGCAG", "ASV_2": "TTGACGTTACCCGCAGA"}
    assert df.rdd.getNumPartitions() == 2
    # registration is idempotent
    register(spark)


# ---------------------------------------------------------------------------
# JSONL source/sink
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip(spark, tmp_path):
    """documents -> JSONL shards -> read back with explicit schema:
    values survive, shard count honors the knob, no inference pass."""
    from compendium_spark.sources.jsonl import read_jsonl, write_jsonl
    from compendium_spark.tables import load

    from .conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, shards=4)
    files = [p for p in __import__("os").listdir(out) if p.startswith("part-")]
    assert len(files) == 4
    back = read_jsonl(
        spark,
        out,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_jsonl_corrupt_lines_are_quarantined(spark, tmp_path):
    """A torn line neither kills the read nor leaks into the data;
    keep_corrupt=True surfaces it for counting."""
    from compendium_spark.sources.jsonl import CORRUPT_COL, read_jsonl

    p = tmp_path / "shard.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "{torn json line\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    clean = read_jsonl(spark, str(p), "doc_id bigint, text string")
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    kept = read_jsonl(
        spark, str(p), "doc_id bigint, text string", keep_corrupt=True
    )
    rows = kept.collect()
    corrupt = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(corrupt) == 1 and "torn" in corrupt[0][CORRUPT_COL]


def test_jsonl_gzip_codec(spark, tmp_path):
    from compendium_spark.sources.jsonl import read_jsonl, write_jsonl

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    out = str(tmp_path / "gz")
    write_jsonl(df, out, codec="gzip", shards=1)
    import os

    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = read_jsonl(spark, out, "id bigint, s string")
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b")]


# ---------------------------------------------------------------------------
# WARC crawl source
# ---------------------------------------------------------------------------


def _make_warc_bytes(records) -> bytes:
    out = b""
    for headers, payload in records:
        out += b"WARC/1.0\r\n"
        headers = dict(headers)
        headers.setdefault("Content-Length", str(len(payload)))
        for k, v in headers.items():
            out += f"{k}: {v}\r\n".encode()
        out += b"\r\n" + payload + b"\r\n\r\n"
    return out


_WARC_RECORDS = [
    (
        {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": "<urn:uuid:info-1>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "Content-Type": "application/warc-fields",
        },
        b"software: test-crawler/1.0",
    ),
    (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:resp-1>",
            "WARC-Target-URI": "http://example.org/a",
            "WARC-Date": "2024-01-01T00:00:01Z",
            "Content-Type": "application/http; msgtype=response",
        },
        b"HTTP/1.1 200 OK\r\n\r\nhello world",
    ),
    (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:resp-2>",
            "WARC-Target-URI": "http://example.org/b",
            "WARC-Date": "2024-01-01T00:00:02Z",
            "Content-Type": "application/http; msgtype=response",
        },
        b"HTTP/1.1 200 OK\r\n\r\n<html>binary \x00\xff ok</html>",
    ),
]


def test_warc_datasource_reads_records(spark, tmp_path):
    import gzip

    from compendium_spark.sources.warc_datasource import register

    raw = _make_warc_bytes(_WARC_RECORDS)
    (tmp_path / "seg-0.warc").write_bytes(raw)
    (tmp_path / "seg-1.warc.gz").write_bytes(gzip.compress(raw))
    register(spark)
    df = spark.read.format("warc").load(str(tmp_path))
    rows = df.collect()
    # both files parsed, 3 records each, payload bytes exact
    assert len(rows) == 6
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append(r)
    assert set(by_file) == {"seg-0.warc", "seg-1.warc.gz"}
    for frows in by_file.values():
        assert [r["record_type"] for r in frows] == [
            "warcinfo",
            "response",
            "response",
        ]
        resp = [r for r in frows if r["record_type"] == "response"]
        assert resp[0]["target_uri"] == "http://example.org/a"
        assert bytes(resp[1]["payload"]).endswith(b"<html>binary \x00\xff ok</html>")
        assert all(not r["truncated"] for r in frows)
    # the reader composes with normal DataFrame ops
    n = (
        df.filter(df.record_type == "response")
        .groupBy("file")
        .count()
        .collect()
    )
    assert sorted(r["count"] for r in n) == [2, 2]


def test_warc_torn_record_truncates_not_crashes(spark, tmp_path):
    from compendium_spark.sources.warc_datasource import register

    raw = _make_warc_bytes(_WARC_RECORDS[:2])
    # tear the last record: claim 1000 payload bytes, supply few
    torn = raw + (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:torn>\r\n"
        b"Content-Length: 1000\r\n"
        b"\r\n"
        b"only-a-little"
    )
    (tmp_path / "torn.warc").write_bytes(torn)
    register(spark)
    rows = spark.read.format("warc").load(str(tmp_path / "torn.warc")).collect()
    assert len(rows) == 3
    assert rows[-1]["truncated"] is True
    assert bytes(rows[-1]["payload"]) == b"only-a-little"
    assert all(not r["truncated"] for r in rows[:-1])
