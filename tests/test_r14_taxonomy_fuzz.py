"""Differential fuzz of the taxonomy TSV source + ASV table assembly
(S7/J3) against the reference's dict-accumulation semantics
(`/root/reference/projects.py:442-523`).

Random (ASVs.fa, ASVs_taxonomy.tsv) pairs — duplicate taxonomy
labels, fasta-only ASVs, taxonomy-only ASVs — through read_fasta +
read_taxonomy + assemble_asv_tables, compared to a dict model of the
reference loop. Pins the two r14 findings:

  * duplicate taxonomy ASV labels resolve LAST-wins
    (`taxa[line[0]] = line[1:]`, projects.py:467) — the engine
    previously emitted both rows, fanning out assignments;
  * `asv_sequences` rows exist only for ASVs in the TAXONOMY file
    (the reference iterates `taxa.keys()`, projects.py:478) — the
    engine previously saved every fasta record. The reference's
    KeyError crash on a taxonomy-only ASV is deliberately softened
    to "no sequence row" (documented in assemble_asv_tables).
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from compendium_spark.sources.fasta import read_fasta  # noqa: E402
from compendium_spark.sources.tsv import (  # noqa: E402
    assemble_asv_tables,
    read_taxonomy,
)

_asv = st.sampled_from(["ASV_1", "ASV_2", "ASV_2", "ASV_3", "ASV_9"])
_rank = st.sampled_from(["Bacteria", "Firmicutes", "NA", "g__x"])
_fasta = st.lists(
    st.tuples(_asv, st.sampled_from(["ACGT", "GGCC", "A"])),
    min_size=0,
    max_size=5,
)
_tax = st.lists(
    st.tuples(_asv, _rank, _rank, _rank, _rank, _rank, _rank),
    min_size=0,
    max_size=5,
)


def _model(fasta_records, tax_rows):
    seqs_d = {}
    for a, s in fasta_records:
        seqs_d[a] = s  # projects.py:459 — last wins
    taxa = {}
    for row in tax_rows:
        taxa[row[0]] = tuple(row[1:])  # projects.py:467 — last wins
    seqs = {a: seqs_d[a] for a in taxa if a in seqs_d}  # projects.py:478
    return seqs, taxa


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(fasta_records=_fasta, tax_rows=_tax)
def test_assembly_matches_reference_dicts(
    spark, tmp_path_factory, fasta_records, tax_rows
):
    d = tmp_path_factory.mktemp("asv")
    (d / "ASVs.fa").write_text(
        "".join(f">{a}\n{s}\n" for a, s in fasta_records)
    )
    (d / "ASVs_taxonomy.tsv").write_text(
        "\tKingdom\tPhylum\tClass\tOrder\tFamily\tGenus\n"
        + "".join("\t".join(r) + "\n" for r in tax_rows)
    )
    fasta = read_fasta(spark, str(d / "ASVs.fa"))
    taxonomy = read_taxonomy(spark, str(d / "ASVs_taxonomy.tsv"))
    seqs, assigns = assemble_asv_tables(fasta, taxonomy, project="PRJX")

    want_seqs, want_taxa = _model(fasta_records, tax_rows)
    got_seqs = {r.asv: r.seq for r in seqs.collect()}
    assert got_seqs == want_seqs
    assert all(r.project == "PRJX" for r in seqs.collect())

    got_assigns = sorted(
        (r.kingdom, r.phylum, r.tclass, r.torder, r.family, r.genus)
        for r in assigns.collect()
    )
    assert got_assigns == sorted(want_taxa.values())
    assert assigns.count() == len(want_taxa), "duplicates must last-win"


def test_findings_pinned_explicitly(spark, tmp_path):
    (tmp_path / "ASVs.fa").write_text(
        ">ASV_1\nAAAA\n>ASV_2\nCCCC\n>FASTA_ONLY\nGGGG\n"
    )
    (tmp_path / "ASVs_taxonomy.tsv").write_text(
        "\tK\tP\tC\tO\tF\tG\n"
        "ASV_1\tk1\tp\tc\to\tf\tg\n"
        "ASV_1\tk2\tp\tc\to\tf\tg\n"  # duplicate: k2 wins
        "ASV_2\tk3\tp\tc\to\tf\tg\n"
        "TAX_ONLY\tk4\tp\tc\to\tf\tg\n"  # ref crashes; engine: no seq row
    )
    fasta = read_fasta(spark, str(tmp_path / "ASVs.fa"))
    taxonomy = read_taxonomy(spark, str(tmp_path / "ASVs_taxonomy.tsv"))
    seqs, assigns = assemble_asv_tables(fasta, taxonomy, project="P")
    assert {r.asv: r.seq for r in seqs.collect()} == {
        "ASV_1": "AAAA",
        "ASV_2": "CCCC",
    }
    kingdoms = sorted(r.kingdom for r in assigns.collect())
    assert kingdoms == ["k2", "k3", "k4"]
