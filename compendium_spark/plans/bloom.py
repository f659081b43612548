"""Bloom-filter prefiltered membership — the runtime-filter shape for
decontamination and reference-set dedup at scale.

At 100 TB you do not ship a reference corpus's full key set to every
scan task; you ship its Bloom filter (here m=256 positions, k=3
md5-derived probes — a few hundred bytes as a bitmap) and let the scan
stage discard the overwhelming majority of rows before any shuffle.
Rows passing the filter are candidates (with a bounded false-positive
rate) and only they reach the exact verification join — the same
two-phase shape as dedup_neardup_pipeline (cheap candidates → exact
verify on candidates only).

The filter here is materialized as the SET of occupied positions and
membership is "every probe position occupied" — semantically identical
to the bitmap test, expressible identically on both engines, and
deterministic, so even the false positives hash-match the oracle: the
plan's output *proves* the filter's arithmetic, not just its result.

Reference parity note: no counterpart in the reference; this belongs
to the brief's dedup/decontamination axis (plans/curation.py's
curate_decontaminate is the n-gram flavor; this is the set-membership
flavor with the scan-stage pruning story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

BLOOM_M = 256  # filter positions — deliberately small at fixture scale
# (m=2048 left the FP set empty, so the r6 gate hashed ONE row; at 256
# the false positives are visible: ~40-50 candidate rows per fixture,
# every one exact-verified, which is the behavior the plan exists to
# prove. Production sizes m for the target FP rate; the algebra is
# m-independent.)
BLOOM_K = 3  # probes per key
REF_MAX_ID = 50  # documents with doc_id < 50 form the reference set

# probe i = 5 hex digits of md5 starting at offset 5i, mod m — three
# independent 20-bit draws from one md5 evaluation
_HEX = "0123456789abcdef"


def _sql_probe(md5_expr: str, i: int) -> str:
    start = 5 * i
    terms = [
        f"(strpos('{_HEX}', substr({md5_expr}, {start + j + 1}, 1)) - 1)"
        f" * {16 ** (4 - j)}"
        for j in range(5)
    ]
    return f"(({' + '.join(terms)}) % {BLOOM_M})"


def _spark_probe(md5_col, i: int):
    return (
        F.conv(F.substring(md5_col, 5 * i + 1, 5), 16, 10).cast("long")
        % BLOOM_M
    )


_PROBES_SQL = ", ".join(
    f"{_sql_probe('h', i)} AS p{i}" for i in range(BLOOM_K)
)

BLOOM_SQL = f"""
WITH keyed AS (
  SELECT doc_id, md5(trim(lower(text))) AS h FROM documents
),
probed AS (
  SELECT doc_id, h, {_PROBES_SQL} FROM keyed
),
ref AS (SELECT * FROM probed WHERE doc_id < {REF_MAX_ID}),
occupied AS (
  SELECT DISTINCT p FROM (
    SELECT p0 AS p FROM ref
    UNION ALL SELECT p1 FROM ref
    UNION ALL SELECT p2 FROM ref
  )
),
cand AS (
  SELECT q.doc_id, q.h
  FROM probed q
  WHERE q.doc_id >= {REF_MAX_ID}
    AND q.p0 IN (SELECT p FROM occupied)
    AND q.p1 IN (SELECT p FROM occupied)
    AND q.p2 IN (SELECT p FROM occupied)
)
SELECT c.doc_id,
       c.h IN (SELECT h FROM ref) AS exact_match
FROM cand c
ORDER BY c.doc_id
"""


@plan("dedup_bloom_prefilter", oracle=BLOOM_SQL)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-set membership with a Bloom prefilter: documents
    outside the reference set that the m={BLOOM_M}/k={BLOOM_K} filter
    flags as possible reference duplicates, each verified exactly —
    the output keeps the false positives visible (exact_match=false
    rows ARE the filter's FP set), so the driver gate hash-checks the
    filter arithmetic itself.

    Parity: probe positions are integer md5-digit arithmetic (Spark
    conv = the oracle's strpos polynomial); membership is pure set
    logic. No floats.

    Scale: the occupied-position set is ≤ m rows (a few KB) —
    broadcast to the corpus scan, so non-candidates die in the scan
    stage with NO shuffle of the corpus; only candidates (true rate +
    FP rate ≈ (occupancy)^k) reach the exact hash semi-join. The
    production form packs the positions into a bitmap ridden by a
    runtime filter; the candidate algebra — and this plan's output —
    is identical.
    """
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.md5(F.trim(F.lower(F.col("text")))).alias("h")
    )
    probed = keyed.select(
        "doc_id",
        "h",
        *[_spark_probe(F.col("h"), i).alias(f"p{i}") for i in range(BLOOM_K)],
    )
    # the reference side is small by construction (doc_id < REF_MAX_ID)
    # and is referenced by BOTH the occupied-position build and the
    # exact-verify hash set — lazily checkpoint it so neither leg
    # re-scans the corpus (the first-green form read documents 5x:
    # a 3-way union for the positions plus the two reference reads;
    # this form scans the corpus once for the query side and once,
    # filtered, for the reference side)
    ref = probed.filter(F.col("doc_id") < REF_MAX_ID).localCheckpoint(
        eager=False
    )
    occupied = (
        ref.select(
            F.explode(
                F.array(*[F.col(f"p{i}") for i in range(BLOOM_K)])
            ).alias("p")
        )
        .distinct()
    )
    q = probed.filter(F.col("doc_id") >= REF_MAX_ID)
    cand = q
    for i in range(BLOOM_K):
        cand = cand.join(
            F.broadcast(occupied.withColumnRenamed("p", f"p{i}")),
            f"p{i}",
            "left_semi",
        )
    ref_hashes = ref.select("h").distinct()
    matched = cand.join(
        F.broadcast(ref_hashes.withColumnRenamed("h", "h_ref")),
        cand["h"] == F.col("h_ref"),
        "left",
    )
    return (
        matched.select(
            "doc_id", F.col("h_ref").isNotNull().alias("exact_match")
        )
        .orderBy("doc_id")
    )
