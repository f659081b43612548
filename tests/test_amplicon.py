"""Amplicon region inference: find_region, the SW aligner, the
grouped-map kernel (`/root/reference/amplicon.py` semantics)."""

from __future__ import annotations

import pytest

from compendium_spark.pipeline.amplicon import (
    BOUNDARIES,
    WHOLE_16S,
    find_region,
    infer_regions,
    inference_work_queue,
    process_project,
    sw_align,
)


class TestFindRegion:
    def test_before_region_forward(self):
        assert find_region(50, "f") == "v1"  # before v1 start (69)

    def test_between_regions_forward(self):
        assert find_region(120, "f") == "v2"  # after v1, before v2 (137)

    def test_inside_region_covered_forward(self):
        # v4 = (576, 682); start at 600 covers (682-600)/106 ≈ 0.77 ≥ 0.5
        assert find_region(600, "f") == "v4"

    def test_inside_region_uncovered_forward(self):
        # start at 660 covers only (682-660)/106 ≈ 0.21 < 0.5 → falls to v5
        assert find_region(660, "f") == "v5"

    def test_after_all_regions_forward(self):
        assert find_region(1500, "f") is None

    def test_reverse_after_region(self):
        assert find_region(1500, "r") == "v9"  # past v9 end (1465)

    def test_reverse_inside_covered(self):
        # v4 end at 660: covers (660-576)/106 ≈ 0.79 ≥ 0.5
        assert find_region(660, "r") == "v4"

    def test_reverse_inside_uncovered(self):
        # end at 590 covers (590-576)/106 ≈ 0.13 → falls through to v3
        assert find_region(590, "r") == "v3"

    def test_bad_direction(self):
        with pytest.raises(ValueError):
            find_region(100, "x")


class TestSWAlign:
    def test_exact_substring(self):
        sub = WHOLE_16S[576:682]
        begin, end, score = sw_align(WHOLE_16S, sub)
        assert begin == 576
        assert end == 576 + len(sub) - 1
        assert score == 2 * len(sub)

    def test_substring_with_mismatches(self):
        sub = list(WHOLE_16S[433:600])
        sub[50] = "a" if sub[50] != "a" else "c"
        sub[100] = "g" if sub[100] != "g" else "t"
        begin, end, score = sw_align(WHOLE_16S, "".join(sub))
        assert abs(begin - 433) <= 2
        assert score >= 2 * len(sub) - 2 * (2 + 3)

    def test_no_similarity(self):
        # sequence alphabet disjoint from the gene's acgt
        begin, end, score = sw_align("acgtacgtacgt", "nnnnnnnn")
        assert score <= 2  # nothing meaningful aligns

    def test_gap_handling(self):
        sub = WHOLE_16S[700:800]
        gapped = sub[:40] + sub[45:]  # 5-base deletion
        begin, end, score = sw_align(WHOLE_16S, gapped)
        assert abs(begin - 700) <= 2
        assert end >= 790


def _mm(s: str, i: int) -> str:
    """Flip base i of s to a guaranteed-mismatching base."""
    return s[:i] + ("a" if s[i] != "a" else "c") + s[i + 1 :]


# Golden alignment vectors (VERDICT r9 #6): (target construction,
# expected query_begin, query_end INCLUSIVE, score) under published
# StripedSmithWaterman semantics with the reference's 2/-3/5/2 scoring
# (skbio.alignment.StripedSmithWaterman fields query_begin/query_end/
# optimal_alignment_score; ref amplicon.py:58-66). Each optimum is
# UNIQUE by construction, so any SSW-semantics aligner must reproduce
# the triple exactly — this is the swap-in contract for the cluster's
# NumPy kernel and for a future skbio path alike. SSW gap model:
# a length-L gap costs open + (L-1)*extend (first base opens at 5,
# each further base extends at 2).
SSW_GOLDEN = [
    # exact V4 substring: full-span perfect local alignment
    ("exact_v4", WHOLE_16S[576:682], 576, 681, 2 * 106),
    # one internal mismatch: span unchanged (79*2-3=155 > 80 prefix)
    ("mid_mismatch", _mm(WHOLE_16S[200:280], 40), 200, 279, 2 * 79 - 3),
    # 3-base DELETION in the target: query spans the gap, one open +
    # two extends
    ("del3", WHOLE_16S[300:350] + WHOLE_16S[353:400], 300, 399,
     2 * 97 - (5 + 2 * 2)),
    # 1-base deletion: open only, no extend
    ("del1", WHOLE_16S[700:740] + WHOLE_16S[741:780], 700, 779, 2 * 79 - 5),
    # 3-base INSERTION in the target (gap in the query dimension):
    # query span is contiguous, same affine cost
    ("ins3", WHOLE_16S[300:350] + "acg"[::-1] * 1 + WHOLE_16S[350:400],
     300, 399, 2 * 100 - (5 + 2 * 2)),
    # junk flanks that can never match (n ∉ acgt): local alignment
    # clips them, begin/end unchanged
    ("flanked", "nn" + WHOLE_16S[500:560] + "nn", 500, 559, 2 * 60),
]


class TestSSWGoldenVectors:
    """The aligner-contract table: every (begin, end, score) triple is
    hand-derived from SSW's published recurrences, so this pins the
    NumPy kernel to the reference aligner's exact outputs — not just
    its scores (tests/test_sw_golden.py) but its coordinates."""

    @pytest.mark.parametrize(
        "name,target,begin,end,score", SSW_GOLDEN, ids=[g[0] for g in SSW_GOLDEN]
    )
    def test_golden_vector(self, name, target, begin, end, score):
        got = sw_align(WHOLE_16S, target)
        assert got == (begin, end, score)

    @pytest.mark.parametrize(
        "name,target,begin,end,score", SSW_GOLDEN, ids=[g[0] for g in SSW_GOLDEN]
    )
    def test_golden_vector_skbio(self, name, target, begin, end, score):
        """When skbio IS importable (not in this image), the same table
        must hold for the real StripedSmithWaterman — the differential
        proof that the two aligner paths are interchangeable."""
        skbio = pytest.importorskip(
            "skbio.alignment",
            reason="scikit-bio is not in this image — DEFERRED PARITY: "
            "the golden (query_begin, query_end, score) table must also "
            "hold for skbio.alignment.StripedSmithWaterman under the "
            "reference's 2/-3/5/2 scoring (ref amplicon.py:58-66); this "
            "test runs automatically the moment skbio lands.",
        )
        ssw = skbio.StripedSmithWaterman(
            WHOLE_16S, match_score=2, mismatch_score=-3,
            gap_open_penalty=5, gap_extend_penalty=2,
        )
        res = ssw(target)
        assert (res.query_begin, res.query_end, res.optimal_alignment_score) == (
            begin, end, score,
        )


class TestProcessProject:
    def test_v4_project(self):
        # start just before the v4 boundary (576) — an exact-boundary
        # start classifies as the NEXT region in the reference's
        # find_region (amplicon.py:25 strict <), which is also tested
        # in TestFindRegion
        asvs = [WHOLE_16S[570:690], WHOLE_16S[572:688], WHOLE_16S[570:691]]
        region, length = process_project(asvs)
        assert region == "v4"
        assert length == pytest.approx((120 + 116 + 121) / 3)

    def test_v3_v4_project(self):
        asvs = [WHOLE_16S[425:690], WHOLE_16S[428:688], WHOLE_16S[425:691]]
        region, length = process_project(asvs)
        assert region == "v3-v4"

    def test_majority_rule(self):
        # 2 of 5 align well to v4 → no majority for any start region;
        # 3 junk ASVs don't vote
        junk = "nnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnn"
        asvs = [WHOLE_16S[570:690], WHOLE_16S[570:690], junk, junk, junk]
        region, length = process_project(asvs)
        assert region == "None"

    def test_empty(self):
        region, length = process_project([])
        assert region == "None"


class TestInferRegions:
    def test_grouped_inference(self, spark):
        rows = [
            ("PRJ_V4", f"ASV_{i}", WHOLE_16S[570:690]) for i in range(3)
        ] + [
            ("PRJ_V34", f"ASV_{i}", WHOLE_16S[425:690]) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "project string, asv string, seq string")
        out = {r.project: r for r in infer_regions(df).collect()}
        assert out["PRJ_V4"].region == "v4"
        assert out["PRJ_V34"].region == "v3-v4"
        assert out["PRJ_V4"].length == pytest.approx(120.0)

    def test_work_queue(self, spark):
        seqs = spark.createDataFrame(
            [("P1", "A", "acgt"), ("P2", "B", "acgt"), ("P3", "C", "acgt")],
            "project string, asv string, seq string",
        )
        inference = spark.createDataFrame(
            [("P1", "v4", 106.0), ("P2", None, None)],
            "project string, region string, length double",
        )
        todo = sorted(r.project for r in inference_work_queue(seqs, inference).collect())
        assert todo == ["P2", "P3"]  # P2 partial, P3 missing (db.py:483-491)


class TestSkbioFixtureParity:
    """VERDICT r12 #8: the numpy-SW ↔ skbio differential on the
    FIXTURE ASVs themselves (not just the hand-derived golden table).
    Skipped until scikit-bio exists in the image; the skip reason
    names the exact parity being deferred so a future image bump
    turns it on with zero edits."""

    # the infer_regions/process_project fixture ASVs: clean V4 reads,
    # V3-V4 spans, off-by-two starts, and unalignable junk
    FIXTURE_ASVS = [
        WHOLE_16S[570:690],
        WHOLE_16S[572:688],
        WHOLE_16S[570:691],
        WHOLE_16S[425:690],
        WHOLE_16S[428:688],
        WHOLE_16S[425:691],
        "nnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnnn",
    ]

    @pytest.mark.parametrize("i", range(7))
    def test_numpy_sw_equals_skbio_on_fixture_asvs(self, i):
        skbio = pytest.importorskip(
            "skbio.alignment",
            reason="scikit-bio is not in this image — DEFERRED PARITY: "
            "sw_align (pipeline/amplicon.py numpy kernel) must return "
            "the identical (query_begin, query_end, "
            "optimal_alignment_score) triple as "
            "skbio.alignment.StripedSmithWaterman for every fixture "
            "ASV under the reference's match=2 mismatch=-3 gap_open=5 "
            "gap_extend=2 scoring (ref amplicon.py:58-66); runs "
            "automatically once skbio lands in the image.",
        )
        target = self.FIXTURE_ASVS[i]
        ssw = skbio.StripedSmithWaterman(
            WHOLE_16S, match_score=2, mismatch_score=-3,
            gap_open_penalty=5, gap_extend_penalty=2,
        )
        res = ssw(target)
        assert sw_align(WHOLE_16S, target) == (
            res.query_begin, res.query_end, res.optimal_alignment_score,
        )
