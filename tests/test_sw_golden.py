"""Aligner verification: differential + golden scores.

The reference aligns with skbio's StripedSmithWaterman (SSW,
reference amplicon.py:58, scoring match=2 mismatch=-3 gap_open=5
gap_extend=2); our cluster path is the vectorized NumPy kernel in
pipeline/amplicon.sw_align (skbio isn't in this image). An aligner-swap
must not silently change region calls, so this file pins the kernel two
ways:

1. *Differential*: an independent, deliberately naive O(m·n) affine-gap
   Smith-Waterman (triple-loop, textbook recurrences, no shared code
   with the vectorized kernel) must produce the identical optimal score
   on random sequences — including forced-gap and forced-mismatch
   constructions. Optimal score is unique even when the alignment path
   is not, so scores compare exactly.
2. *Golden*: hand-derivable cases with exact expected scores under
   2/-3/5/2 scoring (pure match runs, single mismatch, single k-gap),
   matching what SSW reports for the same inputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from compendium_spark.pipeline.amplicon import (
    GAP_EXTEND,
    GAP_OPEN,
    MATCH,
    MISMATCH,
    WHOLE_16S,
    sw_align,
)

NEG = -(10**9)


def naive_sw_score(query: str, target: str) -> int:
    """Textbook affine-gap local alignment (Gotoh), scalar loops."""
    q, t = query.lower(), target.lower()
    m, n = len(q), len(t)
    best = 0
    h = [[0] * (n + 1) for _ in range(m + 1)]
    e = [[NEG] * (n + 1) for _ in range(m + 1)]  # gap in query (along target)
    f = [[NEG] * (n + 1) for _ in range(m + 1)]  # gap in target (along query)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = MATCH if q[i - 1] == t[j - 1] else MISMATCH
            e[i][j] = max(h[i][j - 1] - GAP_OPEN, e[i][j - 1] - GAP_EXTEND)
            f[i][j] = max(h[i - 1][j] - GAP_OPEN, f[i - 1][j] - GAP_EXTEND)
            h[i][j] = max(0, h[i - 1][j - 1] + sub, e[i][j], f[i][j])
            best = max(best, h[i][j])
    return best


DNA = st.text(alphabet="acgt", min_size=1, max_size=28)


class TestDifferential:
    @settings(max_examples=120, deadline=None)
    @given(DNA, DNA)
    def test_random_pairs(self, query, target):
        _b, _e, score = sw_align(query, target)
        assert score == naive_sw_score(query, target)

    @settings(max_examples=60, deadline=None)
    @given(DNA, st.integers(1, 6), st.integers(0, 27))
    def test_forced_deletion(self, seq, gap_len, pos):
        # target = seq with a gap_len-base deletion at pos
        pos = min(pos, len(seq))
        target = seq[:pos] + seq[pos + gap_len :]
        if not target:
            target = "a"
        _b, _e, score = sw_align(seq, target)
        assert score == naive_sw_score(seq, target)

    @settings(max_examples=60, deadline=None)
    @given(DNA, st.sampled_from("acgt"), st.integers(0, 27))
    def test_forced_mismatch(self, seq, base, pos):
        pos = min(pos, len(seq) - 1)
        target = seq[:pos] + base + seq[pos + 1 :]
        _b, _e, score = sw_align(seq, target)
        assert score == naive_sw_score(seq, target)


class TestGoldenScores:
    """Exact scores derivable by hand under 2/-3/5/2 — what SSW reports."""

    def test_perfect_match_run(self):
        sub = WHOLE_16S[100:180]
        assert sw_align(WHOLE_16S, sub)[2] == MATCH * 80

    def test_single_internal_mismatch(self):
        # 40 matches + 1 mismatch + 39 matches: 79*2 - 3 = 155 beats
        # splitting into the 40-match prefix (80)
        sub = list(WHOLE_16S[200:280])
        sub[40] = "a" if sub[40] != "a" else "c"
        assert sw_align(WHOLE_16S, "".join(sub))[2] == MATCH * 79 + MISMATCH

    def test_single_3gap(self):
        # 50 + 47 matches around a 3-base deletion:
        # 97*2 - (5 + 2*2) = 194 - 9 = 185. SSW's recurrence is
        # e = max(h - gap_open, e - gap_extend): the FIRST gap base
        # costs open, each additional costs extend, so a length-L gap
        # costs open + (L-1)*extend — the kernel mirrors that exactly.
        sub = WHOLE_16S[300:350] + WHOLE_16S[353:400]
        assert sw_align(WHOLE_16S, sub)[2] == MATCH * 97 - (
            GAP_OPEN + 2 * GAP_EXTEND
        )

    def test_end_positions_exact_substring(self):
        sub = WHOLE_16S[576:682]
        begin, end, _ = sw_align(WHOLE_16S, sub)
        assert (begin, end) == (576, 681)
