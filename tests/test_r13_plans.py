"""Round-13 plan pins.

train_bpe_merges: the learned merge list must EQUAL canonical
sequential BPE (Sennrich et al. 2016 alg. 1, implemented here in
plain Python) on the same corpus — the EQUAL-to-reference discipline
the r12 text_bpe_apply pin established, extended from applying a
fixed table to LEARNING the table. A second test pins the
double-delimiter re-segmentation on the adversarial class the r12
single-delimiter chain diverged on: adjacent repeated pairs.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from compendium_spark.plans import all_plans
from compendium_spark.plans.text import (
    _BPE_SEP,
    _SEP2,
    TRAIN_BPE_STEPS,
)

SF = "/root/testdata/sf0.001"


def _corpus_vocab() -> dict[str, int]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT tok, COUNT(*) FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
          FROM '{SF}/documents.parquet'
        ) WHERE tok <> '' GROUP BY tok
        """
    ).fetchall()
    con.close()
    return dict(rows)


def canonical_bpe(
    vocab: dict[str, int], steps: int
) -> list[tuple[int, str, str, int]]:
    """Sennrich alg. 1, verbatim: count ALL adjacent symbol pairs
    (overlapping occurrences included) weighted by word frequency,
    merge the argmax greedily left-to-right (non-overlapping) in every
    word, repeat. Tie-break: lexicographic on (c1, c2)."""
    segs = {w: list(w) for w in vocab}
    out = []
    for step in range(1, steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, cnt))
        new = a + b
        for w, s in segs.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(new)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            segs[w] = res
    return out


def test_train_bpe_merges_equals_canonical_bpe(spark):
    got = [
        (r.step, r.c1, r.c2, r.merge_count)
        for r in all_plans()["train_bpe_merges"].fn(spark, SF).collect()
    ]
    want = canonical_bpe(_corpus_vocab(), TRAIN_BPE_STEPS)
    assert got == want


@pytest.mark.parametrize(
    ("word", "pair", "want_syms"),
    [
        # the r12 divergence class: adjacent repeated pairs — the
        # single-delimiter chain merged 'abab' once, not twice
        ("abab", ("a", "b"), ["ab", "ab"]),
        ("ababab", ("a", "b"), ["ab", "ab", "ab"]),
        # same-symbol runs: greedy left-to-right, odd one out stays
        ("aaa", ("a", "a"), ["aa", "a"]),
        ("aaaa", ("a", "a"), ["aa", "aa"]),
        ("aaaaaa", ("a", "a"), ["aa", "aa", "aa"]),
        # no match across a merged symbol's interior
        ("xaby", ("a", "b"), ["x", "ab", "y"]),
        ("ba", ("a", "b"), ["b", "a"]),
    ],
)
def test_double_delimiter_merge_is_canonical_greedy(
    spark, word, pair, want_syms
):
    """ONE engine replace() pass over the ··-delimited encoding equals
    canonical greedy left-to-right merging, including on repeat runs
    where consecutive matches are adjacent."""
    a, b = pair
    df = spark.createDataFrame([(word,)], "w string")
    enc = F.concat(
        F.lit(_BPE_SEP), F.regexp_replace("w", "(.)", f"$1{_SEP2}")
    )
    s = enc.substr(F.lit(1), F.length(enc) - 1)
    merged = F.replace(
        s,
        F.lit(f"{_BPE_SEP}{a}{_SEP2}{b}{_BPE_SEP}"),
        F.lit(f"{_BPE_SEP}{a}{b}{_BPE_SEP}"),
    )
    syms = F.split(
        merged.substr(F.lit(2), F.length(merged) - 2), _SEP2
    )
    assert df.select(syms.alias("c")).collect()[0]["c"] == want_syms


def test_containment_pipeline_matches_exact_baseline(spark):
    """dedup_containment_pipeline (LSH candidates -> exact verify)
    must reproduce the exhaustive dedup_containment output exactly at
    the oracle-gated SFs — the recall pin for the r13 scale twin."""
    ps = all_plans()
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        pipe = {
            tuple(r)
            for r in ps["dedup_containment_pipeline"].fn(spark, d).collect()
        }
        exact = {
            tuple(r) for r in ps["dedup_containment"].fn(spark, d).collect()
        }
        assert pipe == exact, d
