"""Misra-Gries sketch invariants, property-tested without Spark: the
partition-split + row-at-a-time merge used by `a18_freq_items_sketch`
must honor est <= true and true - est <= 2n/(k+1) for EVERY item on
EVERY stream and split."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from compendium_spark.plans.olap_ext import _mg_merge


def _mg_stream(tokens: list[str], k: int) -> dict:
    """The per-partition fold from a18's `partials` kernel."""
    summary: dict = {}
    for t in tokens:
        if t in summary:
            summary[t] += 1
        elif len(summary) < k:
            summary[t] = 1
        else:
            drop = [u for u in summary if summary[u] == 1]
            for u in summary:
                summary[u] -= 1
            for u in drop:
                del summary[u]
    return summary


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from([f"t{i}" for i in range(40)]), min_size=0, max_size=400
    ),
    k=st.integers(2, 16),
    n_parts=st.integers(1, 5),
)
def test_mg_bound_holds_under_split_and_merge(tokens, k, n_parts):
    # split the stream into contiguous partitions, fold each, then
    # merge row-at-a-time exactly as the plan's driver loop does
    n = len(tokens)
    bounds = [round(i * n / n_parts) for i in range(n_parts + 1)]
    merged: dict = {}
    for lo, hi in zip(bounds, bounds[1:]):
        part = _mg_stream(tokens[lo:hi], k)
        for t, c in part.items():
            merged = _mg_merge(merged, {t: c}, k)
    true = Counter(tokens)
    err = 2.0 * n / (k + 1)
    for t, tc in true.items():
        est = merged.get(t, 0)
        assert est <= tc, (t, est, tc)
        assert tc - est <= err, (t, est, tc, err)
    # no phantom items: everything in the summary really occurred
    for t in merged:
        assert t in true


def test_mg_merge_respects_capacity():
    acc: dict = {}
    for i in range(100):
        acc = _mg_merge(acc, {f"x{i}": 1}, 8)
    assert len(acc) <= 8


# ---------------------------------------------------------------------------
# a20 HyperLogLog: the SQL rho CASE must equal Python's bit_length rho
# ---------------------------------------------------------------------------


def _py_rho(w: int, wbits: int) -> int:
    """Leading zeros of the wbits-bit word + 1 (paper definition)."""
    return wbits - w.bit_length() + 1


@settings(max_examples=300, deadline=None)
@given(w=st.integers(0, (1 << 26) - 1))
def test_hll_rho_case_matches_bit_length(w):
    """The generated CASE chain (shared verbatim by Spark and DuckDB)
    computes the same rho as Python's int.bit_length for every 26-bit
    word, including the all-zeros sentinel (rho = 27)."""
    import duckdb

    from compendium_spark.plans.sketches import HLL_WBITS, _rho_case

    got = duckdb.sql(f"SELECT {_rho_case(str(w))} AS r").fetchone()[0]
    assert got == _py_rho(w, HLL_WBITS)


def test_hll_harmonic_sum_exact_any_order():
    """Every 2^-r term (r in 1..27) is a multiple of 2^-27 and the
    64-register sum stays below 2^7, so IEEE addition is EXACT and
    order-independent — the property the plan's parity story rests on."""
    import itertools
    import random
    from fractions import Fraction

    rng = random.Random(7)
    regs = [rng.randint(1, 27) for _ in range(64)]
    exact = sum(Fraction(1, 2**r) for r in regs)
    sums = set()
    for _ in range(20):
        rng.shuffle(regs)
        acc = 0.0
        for r in regs:
            acc += 2.0**-r
        sums.add(acc)
    assert sums == {float(exact)}


def test_hll_estimate_within_bound_small_sim():
    """Pure-Python simulation of the plan's exact pipeline (md5 hash,
    bucket/word split, rho, harmonic estimate) on a known cardinality:
    the estimate must sit within the 0.35 relative bound the plan
    asserts as its oracle-checked boolean."""
    import hashlib

    from compendium_spark.plans.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_WBITS,
    )

    n = 2000
    regs = [0] * HLL_M
    for i in range(n):
        hv = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        j, w = hv % HLL_M, hv // HLL_M
        regs[j] = max(regs[j], _py_rho(w, HLL_WBITS))
    hsum = sum(2.0**-r for r in regs)
    est = HLL_ALPHA * HLL_M * HLL_M / hsum
    assert abs(est - n) <= 0.35 * n


# ---------------------------------------------------------------------------
# a21 histogram quantile: interpolation error is bounded by bin width
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(
        st.floats(0.0, 100.0, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=300,
    ),
    width=st.sampled_from([1.0, 5.0, 25.0]),
)
def test_histogram_median_bin_invariants(values, width):
    """The TRUE invariants of the fixed-bin sketch (a within-one-bin
    claim vs quantile_cont would be FALSE in general — with n even the
    exact median interpolates toward the order statistic at position
    n/2+1, which can sit many empty bins to the right; Hypothesis
    found est 1.5 widths from exact on a 2-element input):

      1. the estimate lies inside the median bin [B_lo, B_hi];
      2. the mass-median order statistic (1-indexed ceil(n/2)) lies in
         that same bin — so est is within one bin width of the
         *discrete* median always;
      3. whenever BOTH central order statistics fall in the median bin
         (the dense-data case the plan's boolean reports on), the
         continuous median does satisfy |est - exact| <= width.
    """
    import math

    n = len(values)
    s = sorted(values)
    h = 0.5 * (n - 1)
    lo, hi = s[math.floor(h)], s[math.ceil(h)]
    exact = lo + (h - math.floor(h)) * (hi - lo)
    from collections import Counter

    counts = Counter(math.floor(v / width) for v in values)
    half_n = 0.5 * n
    cum = 0
    for b in sorted(counts):
        cum_before, cum = cum, cum + counts[b]
        if cum >= half_n:
            est = b * width + width * (half_n - cum_before) / counts[b]
            break
    eps = 1e-9
    # 1. estimate inside the median bin
    assert b * width - eps <= est <= (b + 1) * width + eps
    # 2. discrete median in the same bin
    disc = s[math.ceil(half_n) - 1]
    assert math.floor(disc / width) == b
    assert abs(est - disc) <= width + eps
    # 3. dense case -> continuous median within one bin of the estimate
    if math.floor(lo / width) == b and math.floor(hi / width) == b:
        assert abs(est - exact) <= width + eps


# ---------------------------------------------------------------------------
# a22 HLL set ops / a23 Count-Min: the merge laws, property-tested
# ---------------------------------------------------------------------------


def _hll_registers(items) -> list:
    import hashlib

    from compendium_spark.plans.sketches import HLL_M, HLL_WBITS

    regs = [0] * HLL_M
    for it in items:
        hv = int(hashlib.md5(str(it).encode()).hexdigest()[:8], 16)
        j, w = hv % HLL_M, hv // HLL_M
        regs[j] = max(regs[j], _py_rho(w, HLL_WBITS))
    return regs


@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.integers(0, 500), max_size=200),
    b=st.lists(st.integers(0, 500), max_size=200),
)
def test_hll_union_is_register_max(a, b):
    """The a22 merge law: sketch(A ∪ B) == elementwise max of the two
    register files, for EVERY pair of streams — merge order, overlap
    and duplicates included. This is what lets per-partition sketches
    combine associatively on a fleet."""
    ra, rb = _hll_registers(a), _hll_registers(b)
    ru = _hll_registers(a + b)
    assert ru == [max(x, y) for x, y in zip(ra, rb)]


@settings(max_examples=100, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from([f"w{i}" for i in range(60)]), max_size=300
    ),
    split=st.integers(0, 300),
)
def test_countmin_never_undercounts_and_merges(tokens, split):
    """The a23 guarantees: (1) est >= true for every token; (2) the
    counter table of the whole stream equals the SUM of the two
    half-streams' tables (mergeable by addition)."""
    import hashlib
    from collections import Counter

    from compendium_spark.plans.sketches import CM_D, CM_W

    def table(toks):
        t = [[0] * CM_W for _ in range(CM_D)]
        for tok in toks:
            for r in range(CM_D):
                h = hashlib.md5(f"{r}:{tok}".encode()).hexdigest()
                c = int(h[:2], 16) % CM_W
                t[r][c] += 1
        return t

    whole = table(tokens)
    left, right = table(tokens[:split]), table(tokens[split:])
    assert whole == [
        [x + y for x, y in zip(lr, rr)] for lr, rr in zip(left, right)
    ]
    truth = Counter(tokens)
    for tok, true_cnt in truth.items():
        est = min(
            whole[r][int(hashlib.md5(f"{r}:{tok}".encode()).hexdigest()[:2], 16) % CM_W]
            for r in range(CM_D)
        )
        assert est >= true_cnt
