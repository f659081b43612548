"""Differential fuzz of the BioSample XML source (S1/U4).

Hypothesis generates random BioSampleSet documents — samples with and
without SRA ids, multiple SRA ids, attributes with harmonized/
attribute/no name attributes, empty and duplicate and unicode and
numeric-looking values — serializes them with ElementTree (always
well-formed), and runs them through BOTH engine parse paths:

  * the native Spark XML reader (`read_biosample_xml` → `_project_native`)
  * the `mapInPandas` ElementTree fallback (`_read_via_pandas`)

Both results (after `to_samples` + `to_tags`, i.e. the full
reference semantics: skip-no-SRA, empty-text skip, name precedence,
lower-casing, last-wins dedup) must equal a ~15-line dict model
transcribed from the reference's documented behavior
(`/root/reference/db.py:228-259`) — and therefore each other.

This fuzz FOUND (and now pins) three real parity divergences, fixed
in r14:
  * multiple SRA ids: the reference's loop keeps the LAST
    (db.py:230-232); the native path took array element [0];
  * an Attribute with NEITHER harmonized_name nor attribute_name:
    the reference's if/elif drops it (db.py:253-256); the fallback
    recorded a null-tag row;
  * a present-but-EMPTY harmonized_name is the tag key under the
    reference's `in attrib` presence check; the fallback's
    truthiness `or` fell through to attribute_name.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from compendium_spark.sources.biosample_xml import (  # noqa: E402
    _read_via_pandas,
    read_biosample_xml,
    to_samples,
    to_tags,
)

MISSING = object()

# XML-legal, no leading/trailing whitespace (the native reader trims
# surrounding whitespace by default; the reference's ET does not —
# surrounding-whitespace parity is out of scope for the semantics
# under test), no control chars
_text = st.text(
    alphabet="AbZ9y&Àß._-",
    min_size=1,
    max_size=6,
)
_attr_name = st.one_of(st.just(MISSING), st.just(""), _text)
_attr = st.tuples(
    _attr_name,  # harmonized_name ("" = present but empty)
    _attr_name,  # attribute_name
    st.one_of(st.none(), st.just(""), _text, st.just("007"), st.just("UP low")),
)
_id = st.tuples(
    st.sampled_from(["SRA", "BioSample", MISSING]),  # db attribute
    _text,
)
_sample = st.tuples(
    st.lists(_id, min_size=0, max_size=3),
    st.lists(_attr, min_size=0, max_size=4),
)
_doc = st.lists(_sample, min_size=0, max_size=3)


def _serialize(doc, path) -> None:
    root = ET.Element("BioSampleSet")
    for n, (ids, attrs) in enumerate(doc):
        sample = ET.SubElement(root, "BioSample")
        ids_el = ET.SubElement(sample, "Ids")
        for db, text in ids:
            id_el = ET.SubElement(ids_el, "Id")
            if db is not MISSING:
                id_el.set("db", db)
            # unique id text per sample slot so two samples never
            # share an srs (the reference would insert duplicate
            # sample rows; engine output is keyed — out of scope)
            id_el.text = f"{text}_{n}"
        attrs_el = ET.SubElement(sample, "Attributes")
        for hname, aname, text in attrs:
            a = ET.SubElement(attrs_el, "Attribute")
            if hname is not MISSING:
                a.set("harmonized_name", hname)
            if aname is not MISSING:
                a.set("attribute_name", aname)
            a.text = text
    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)


def _model(doc):
    """The reference's parse, as a dict model (db.py:228-259)."""
    samples, tags = set(), {}
    for n, (ids, attrs) in enumerate(doc):
        sra = None
        for db, text in ids:
            if db == "SRA":
                sra = f"{text}_{n}"  # loop overwrites: LAST wins
        if sra is None:
            continue
        samples.add(sra)
        all_tags = {}
        for hname, aname, text in attrs:
            if text is None or text == "":
                continue
            if hname is not MISSING:
                all_tags[hname] = text.lower()
            elif aname is not MISSING:
                all_tags[aname] = text.lower()
            # neither name: dropped (no else branch)
        tags[sra] = all_tags
    return samples, tags


def _observed(parsed):
    samples = {
        r.srs for r in to_samples(parsed, taxon="t").select("srs").collect()
    }
    tags: dict[str, dict] = {s: {} for s in samples}
    for r in to_tags(parsed).collect():
        tags[r.srs][r.tag] = r.value
    return samples, tags


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(doc=_doc)
def test_both_parse_paths_match_reference_model(spark, tmp_path_factory, doc):
    path = str(tmp_path_factory.mktemp("xmlfuzz") / "doc.xml")
    _serialize(doc, path)
    expect = _model(doc)
    assert _observed(_read_via_pandas(spark, path)) == expect
    assert _observed(read_biosample_xml(spark, path)) == expect


def test_fuzz_findings_pinned_explicitly(spark, tmp_path):
    """The three r14 divergences as a deterministic example: two SRA
    ids (last wins), a nameless attribute (dropped), an empty-but-
    present harmonized_name (used as the key), plus a numeric-looking
    value and an uppercase value (lower-cased, never type-inferred)."""
    doc = [
        (
            [("SRA", "SRSfirst"), ("BioSample", "SAMN1"), ("SRA", "SRSlast")],
            [
                (MISSING, MISSING, "orphan"),  # nameless → dropped
                ("", "fallback_name", "EmptyHName"),  # "" is the key
                ("lat", MISSING, "007"),  # stays the string "007"
                (MISSING, "env", "UP low"),
                ("env2", "ignored", "Second"),  # harmonized beats attr
            ],
        ),
        ([("BioSample", "SAMN2")], [("x", MISSING, "y")]),  # no SRA: skipped
    ]
    path = str(tmp_path / "doc.xml")
    _serialize(doc, path)
    expect = (
        {"SRSlast_0"},
        {
            "SRSlast_0": {
                "": "emptyhname",
                "lat": "007",
                "env": "up low",
                "env2": "second",
            }
        },
    )
    assert _model(doc) == expect
    assert _observed(_read_via_pandas(spark, path)) == expect
    assert _observed(read_biosample_xml(spark, path)) == expect
