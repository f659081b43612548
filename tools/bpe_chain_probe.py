"""text_bpe_apply chain-depth probe (VERDICT r12 #3).

The plan's +0.46 SCALING.md slope is vs ROWS; the other axis is the
MERGE TABLE: the literal replace-chain's per-occurrence cost grows
with merge count, so a production-size vocabulary (30k+ merges) would
be a different plan shape entirely. This probe measures, at sf0.1:

  * scan-side chain (the registered plan's shape) at 8/16/32/64
    synthetic merges — cost per occurrence x depth;
  * vocab-side chain (encode the DISTINCT vocabulary, broadcast-join
    the encoding back onto the stream — the Heaps'-law amortization
    the plan docstring names as the scale path) at the same depths.

Synthetic merges extend BPE_MERGES with pairs that never fire
((q,q),(q,w)... on a q-less corpus would be dead code Catalyst could
fold — so they use real frequent letters in unlikely orders), keeping
output identical while the chain deepens: the cost being measured is
the chain machinery itself.

Usage: python tools/bpe_chain_probe.py [--sf-dir D] [--reps N]
Writes one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from compendium_spark.plans.text import _BPE_SEP, BPE_MERGES  # noqa: E402
from compendium_spark.session import get_session  # noqa: E402
from compendium_spark.tables import load  # noqa: E402

# letter pairs that are vanishingly rare in the synthetic corpus but
# NOT provably absent — Catalyst cannot fold them away, and they fire
# on ~no occurrences, so deeper tables keep the OUTPUT comparable
# while deepening the chain
_FILLER = [
    (a, b)
    for a in "zqxjvkwy"
    for b in "zqxjvkwy"
]


def _merge_table(depth: int) -> list[tuple[str, str]]:
    assert depth >= len(BPE_MERGES)
    return (list(BPE_MERGES) + _FILLER)[:depth]


def _chain(col, merges):
    enc = F.concat(
        F.lit(_BPE_SEP),
        F.regexp_replace(col, "(.)", f"$1{_BPE_SEP}"),
    )
    for a, b in merges:
        enc = F.replace(
            enc,
            F.lit(f"{_BPE_SEP}{a}{_BPE_SEP}{b}{_BPE_SEP}"),
            F.lit(f"{_BPE_SEP}{a}{b}{_BPE_SEP}"),
        )
    return enc


def scan_side(spark, sf_dir, merges):
    docs = load(spark, sf_dir, "documents")
    word = F.explode(
        F.split(F.trim(F.lower(F.col("text"))), " +")
    ).alias("w")
    enc = _chain(F.col("w"), merges)
    return (
        docs.select(word)
        .select(F.explode(F.split(enc, _BPE_SEP)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
    )


def vocab_side(spark, sf_dir, merges):
    """Heaps'-law amortization: the chain runs once per DISTINCT word,
    the corpus-sized stream only joins and re-weights."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("w")
    )
    wfreq = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    enc = _chain(F.col("w"), merges)
    encoded = wfreq.select(
        F.explode(F.split(enc, _BPE_SEP)).alias("token"), "freq"
    ).filter(F.col("token") != "")
    return (
        encoded.groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depths", default="8,16,32,64")
    args = ap.parse_args()
    spark = get_session("bpe-chain-probe")
    depths = [int(d) for d in args.depths.split(",")]
    out = {"sf_dir": args.sf_dir, "scan": {}, "vocab": {}}
    for shape, fn in (("scan", scan_side), ("vocab", vocab_side)):
        for d in depths:
            merges = _merge_table(d)
            best = min(
                _timed(fn, spark, args.sf_dir, merges)
                for _ in range(args.reps)
            )
            out[shape][d] = round(best, 3)
            print(f"# {shape} depth={d}: {best:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


def _timed(fn, spark, sf_dir, merges) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir, merges).collect()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
