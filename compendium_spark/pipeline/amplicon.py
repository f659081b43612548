"""16S hypervariable-region inference (SURVEY §2.8 U1/U2).

Re-expresses `/root/reference/amplicon.py` as a grouped-map Pandas UDF
over `asv_sequences`: one group per project, Smith-Waterman-align each
ASV against the canonical whole-16S sequence, classify alignment
endpoints into hypervariable regions, majority-vote the project's
start/end regions, extrapolate a missing end from average ASV length.

Semantics preserved:
  * region boundary table (`amplicon.py:7-17`; coordinates from
    Baker/Smith/Cowan via PMC2562909 — public literature);
  * ≥50%-coverage rule when an endpoint lands inside a region
    (`amplicon.py:27-47`);
  * 70% aligned-span acceptance filter (`amplicon.py:71-73`);
  * majority threshold `votes > n_asvs/2` (`amplicon.py:77,84`);
  * average-length extrapolation fallback (`amplicon.py:92-107`);
  * start>end rejection (string compare works for v1..v9,
    `amplicon.py:111-114`);
  * assignment string `'v3-v4'` / `'v4'` / `'None'` (`amplicon.py:116`);
  * returned length = mean of ALL ASV lengths (`amplicon.py:53-56`).

Documented divergence: the reference early-exits its scan once both
regions reach majority (`amplicon.py:88-89`), so later ASVs never
vote. We tally ALL qualifying ASVs — deterministic, order-independent,
and parallel (the early exit is a sequential optimization that can
only find fewer regions, SURVEY §2.4 A9).

Aligner: `skbio.alignment.StripedSmithWaterman` when importable (same
scoring as the reference: match 2 / mismatch -3 / gap open 5 /
gap extend 2); otherwise a vectorized NumPy Smith-Waterman with
identical scoring (affine gaps, local alignment, start-propagation
instead of traceback). skbio is not in this image, so tests exercise
the NumPy path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# amplicon.py:7-17 (Baker et al. region coordinates on the E. coli gene)
BOUNDARIES: dict[str, tuple[int, int]] = {
    "v1": (69, 99),
    "v2": (137, 242),
    "v3": (433, 497),
    "v4": (576, 682),
    "v5": (822, 879),
    "v6": (986, 1043),
    "v7": (1117, 1173),
    "v8": (1243, 1294),
    "v9": (1435, 1465),
}

# E. coli 16S rRNA gene, GenBank J01859 (public; amplicon.py:19-20)
WHOLE_16S = (
    "aaattgaagagtttgatcatggctcagattgaacgctggcggcaggcctaacacatgcaagtcgaacggtaacaggaagaagcttgctctttgctgacg"
    "agtggcggacgggtgagtaatgtctgggaaactgcctgatggagggggataactactggaaacggtagctaataccgcataacgtcgcaagaccaaaga"
    "gggggaccttcgggcctcttgccatcggatgtgcccagatgggattagctagtaggtggggtaacggctcacctaggcgacgatccctagctggtctga"
    "gaggatgaccagccacactggaactgagacacggtccagactcctacgggaggcagcagtggggaatattgcacaatgggcgcaagcctgatgcagcca"
    "tgccgcgtgtatgaagaaggccttcgggttgtaaagtactttcagcggggaggaagggagtaaagttaatacctttgctcattgacgttacccgcagaa"
    "gaagcaccggctaactccgtgccagcagccgcggtaatacggagggtgcaagcgttaatcggaattactgggcgtaaagcgcacgcaggcggtttgtta"
    "agtcagatgtgaaatccccgggctcaacctgggaactgcatctgatactggcaagcttgagtctcgtagaggggggtagaattccaggtgtagcggtga"
    "aatgcgtagagatctggaggaataccggtggcgaaggcggccccctggacgaagactgacgctcaggtgcgaaagcgtggggagcaaacaggattagat"
    "accctggtagtccacgccgtaaacgatgtcgacttggaggttgtgcccttgaggcgtggcttccggagctaacgcgttaagtcgaccgcctggggagta"
    "cggccgcaaggttaaaactcaaatgaattgacgggggcccgcacaagcggtggagcatgtggtttaattcgatgcaacgcgaagaaccttacctggtct"
    "tgacatccacggaagttttcagagatgagaatgtgccttcgggaaccgtgagacaggtgctgcatggctgtcgtcagctcgtgttgtgaaatgttggg"
    "ttaagtcccgcaacgagcgcaacccttatcctttgttgccagcggtccggccgggaactcaaaggagactgccagtgataaactggaggaaggtgggga"
    "tgacgtcaagtcatcatggcccttacgaccagggctacacacgtgctacaatggcgcatacaaagagaagcgacctcgcgagagcaagcggacctcat"
    "aaagtgcgtcgtagtccggattggagtctgcaactcgactccatgaagtcggaatcgctagtaatcgtggatcagaatgccacggtgaatacgttccc"
    "gggccttgtacacaccgcccgtcacaccatgggagtgggttgcaaaagaagtaggtagcttaaccttcgggagggcgcttaccactttgtgattcatg"
    "actggggtgaagtcgtaacaaggtaaccgtaggggaacctgcggttggatcacctcctta"
)

MATCH, MISMATCH, GAP_OPEN, GAP_EXTEND = 2, -3, 5, 2


def find_region(location: float, direction: str = "f") -> str | None:
    """Classify a coordinate on the 16S gene into a hypervariable
    region (`amplicon.py:22-49`), with the ≥50%-coverage rule for
    endpoints landing inside a region."""
    if direction == "f":
        for v, (lo, hi) in BOUNDARIES.items():
            if location < lo:
                return v
            if lo < location < hi:
                if (hi - location) / (hi - lo) >= 0.5:
                    return v
        return None
    if direction == "r":
        for v, (lo, hi) in reversed(list(BOUNDARIES.items())):
            if location > hi:
                return v
            if lo < location < hi:
                if (location - lo) / (hi - lo) >= 0.5:
                    return v
        return None
    raise ValueError('direction parameter must be "f" or "r".')


def _encode(seq: str) -> np.ndarray:
    return np.frombuffer(seq.lower().encode("ascii"), dtype=np.uint8)


def sw_align(query: str, target: str) -> tuple[int, int, int]:
    """Local (Smith-Waterman) alignment of `target` against `query`.

    Returns (query_begin, query_end, score) with query_end inclusive —
    the fields the reference reads from skbio's result
    (`amplicon.py:66-75`). Affine gaps, vectorized one row per query
    base; alignment start is tracked by propagation (no traceback
    matrices).
    """
    q = _encode(query)
    t = _encode(target)
    m, n = len(q), len(t)
    neg = -(10**9)

    h_prev = np.zeros(n + 1, dtype=np.int64)
    f_prev = np.full(n + 1, neg, dtype=np.int64)
    # start-row propagation: which query row the local path began at
    sh_prev = np.zeros(n + 1, dtype=np.int64)
    sf_prev = np.zeros(n + 1, dtype=np.int64)

    best_score, best_i, best_start = 0, 0, 0
    ks = np.arange(n, dtype=np.int64)

    for i in range(1, m + 1):
        sub = np.where(t == q[i - 1], MATCH, MISMATCH)
        diag = h_prev[:-1] + sub
        sdiag = np.where(h_prev[:-1] > 0, sh_prev[:-1], i - 1)

        f_cur = np.maximum(h_prev[1:] - GAP_OPEN, f_prev[1:] - GAP_EXTEND)
        sf_cur = np.where(h_prev[1:] - GAP_OPEN >= f_prev[1:] - GAP_EXTEND,
                          sh_prev[1:], sf_prev[1:])

        base = np.maximum(diag, f_cur)
        sbase = np.where(diag >= f_cur, sdiag, sf_cur)
        started = base > 0
        base = np.where(started, base, 0)
        sbase = np.where(started, sbase, i)  # fresh start at this cell

        # E scan (gap in target): E[j] = max_{k<j}(base[k]-open-extend*(j-1-k))
        tvals = base - GAP_OPEN + GAP_EXTEND * ks
        g = np.maximum.accumulate(tvals)
        gi = np.maximum.accumulate(
            np.where(tvals == g, ks, 0)
        )  # index of scan max (first achieving)
        e_cur = np.empty(n, dtype=np.int64)
        se_cur = np.empty(n, dtype=np.int64)
        e_cur[0] = neg
        se_cur[0] = i
        if n > 1:
            # E[j] = max_{k<j}(base[k] - open - extend*(j-1-k)) = g[j-1] - extend*(j-1)
            e_cur[1:] = g[:-1] - GAP_EXTEND * (ks[1:] - 1)
            src = gi[:-1]
            se_cur[1:] = sbase[src]

        h_cur_row = np.maximum(base, e_cur)
        sh_cur_row = np.where(base >= e_cur, sbase, se_cur)
        h_cur_row = np.maximum(h_cur_row, 0)

        h_cur = np.concatenate(([0], h_cur_row))
        sh_cur = np.concatenate(([i], sh_cur_row))
        f_cur_full = np.concatenate(([neg], f_cur))
        sf_cur_full = np.concatenate(([i], sf_cur))

        j_best = int(np.argmax(h_cur_row))
        if h_cur_row[j_best] > best_score:
            best_score = int(h_cur_row[j_best])
            best_i = i  # 1-based row of alignment end
            best_start = int(sh_cur_row[j_best])

        h_prev, f_prev = h_cur, f_cur_full
        sh_prev, sf_prev = sh_cur, sf_cur_full

    # query_begin = first aligned query index (0-based); query_end inclusive
    return best_start, best_i - 1, best_score


def _get_aligner():
    try:  # same kernel the reference uses, when available
        from skbio.alignment import StripedSmithWaterman  # noqa: PLC0415

        ssw = StripedSmithWaterman(WHOLE_16S)

        def align(asv: str) -> tuple[int, int, int]:
            r = ssw(asv)
            return r.query_begin, r.query_end, r.optimal_alignment_score

        return align
    except ImportError:
        return lambda asv: sw_align(WHOLE_16S, asv)


def process_project(asvs: list[str]) -> tuple[str, float]:
    """Infer (region string, avg length) for one project's ASVs —
    the `amplicon.py:51-128` kernel with full (non-early-exit) tallies."""
    if not asvs:
        return "None", float("nan")
    avglength = float(np.mean([len(a) for a in asvs]))
    align = _get_aligner()
    n = len(asvs)

    forwards: dict[str, int] = {}
    reverses: dict[str, int] = {}
    for asv in asvs:
        begin, end, _score = align(asv)
        if end - begin <= len(asv) * 0.7:  # amplicon.py:71-73
            continue
        fr = find_region(begin, "f")
        rr = find_region(end, "r")
        forwards[fr] = forwards.get(fr, 0) + 1
        reverses[rr] = reverses.get(rr, 0) + 1

    def majority(votes: dict[str, int]) -> str | None:
        for region, count in votes.items():
            if region is not None and count > n / 2:  # amplicon.py:77,84
                return region
        return None

    start = majority(forwards)
    end = majority(reverses)

    if start is not None and end is None:  # amplicon.py:92-97
        end = find_region(BOUNDARIES[start][0] + avglength, "r")
    if start is None and end is not None:  # amplicon.py:100-107
        start = find_region(BOUNDARIES[end][1] - avglength, "f")
    if start is not None and end is not None and start > end:  # amplicon.py:111-114
        start = None
        end = None
    assignment = f"{start}{f'-{end}' if end != start else ''}"  # amplicon.py:116
    return assignment, avglength


def infer_regions(asv_sequences: DataFrame) -> DataFrame:
    """Grouped-map inference over `asv_sequences(project, asv, seq)` →
    `asv_inference(project, region, length)` (ref `db.py:473-516`).

    applyInPandas: one task per project; the CPU-bound alignment
    kernel parallelizes across projects (SURVEY §4 note 2). At scale,
    salt mega-projects or cap ASVs per group.
    """

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        project = pdf["project"].iloc[0]
        region, length = process_project(pdf["seq"].dropna().tolist())
        return pd.DataFrame(
            {"project": [project], "region": [region], "length": [length]}
        )

    return asv_sequences.select("project", "seq").groupBy("project").applyInPandas(
        infer, schema="project string, region string, length double"
    )


def inference_work_queue(
    asv_sequences: DataFrame, asv_inference: DataFrame, limit: int | None = None, seed: int = 42
) -> DataFrame:
    """Projects still needing inference (J1/P9, ref `db.py:483-491`):
    left join + IS NULL filter, random-order limit (O1)."""
    seq_projects = asv_sequences.select("project").distinct()
    ai = asv_inference.select("project", "region", "length")
    out = (
        seq_projects.join(ai, "project", "left")
        .filter(F.col("region").isNull() | F.col("length").isNull())
        .select("project")
    )
    if limit is not None:
        out = out.orderBy(F.rand(seed)).limit(limit)
    return out
