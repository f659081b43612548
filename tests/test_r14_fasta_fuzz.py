"""Differential fuzz of the FASTA source (S6) against the reference's
dict-accumulation loop (`/root/reference/projects.py:447-459`),
restricted to well-formed 2-line records — the format DADA2 emits and
the scope both implementations share (read_fasta's docstring records
the deliberate divergence on alternation-slipped malformed files).

Generates random 2-line FASTA files: arbitrary header tokens
INCLUDING DUPLICATES (the reference's `seqs[asv] = seq` keeps the
last — r14 aligned the engine to the same last-wins), empty and
repeated sequence lines, single-record and empty files. The engine's
(asv, seq) rows must equal the reference model's dict items.
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from compendium_spark.sources.fasta import read_fasta  # noqa: E402

_header = st.sampled_from(["ASV_1", "ASV_2", "ASV_2", "x y", "s.p|z", ""])
_seq = st.sampled_from(["ACGT", "acgtn", "A", "ACGTACGTACGT", ""])
_records = st.lists(st.tuples(_header, _seq), min_size=0, max_size=6)


def _model(records):
    seqs = {}
    for asv, seq in records:
        seqs[asv] = seq  # projects.py:459 — last wins
    return seqs


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(records=_records)
def test_read_fasta_matches_reference_dict(spark, tmp_path_factory, records):
    path = tmp_path_factory.mktemp("fasta") / "ASVs.fa"
    path.write_text("".join(f">{a}\n{s}\n" for a, s in records))
    got = {r.asv: r.seq for r in read_fasta(spark, str(path)).collect()}
    rows = read_fasta(spark, str(path)).count()
    assert got == _model(records)
    assert rows == len(got), "duplicate headers must dedup last-wins"


def test_duplicate_header_keeps_last_sequence(spark, tmp_path):
    (tmp_path / "ASVs.fa").write_text(">A\nFIRST\n>B\nKEEP\n>A\nLAST\n")
    got = {
        r.asv: r.seq
        for r in read_fasta(spark, str(tmp_path / "ASVs.fa")).collect()
    }
    assert got == {"A": "LAST", "B": "KEEP"}
