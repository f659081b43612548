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
