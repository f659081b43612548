"""Semantic dedup: cluster-bounded embedding near-dup removal
(SemDeDup) and asymmetric shingle containment.

Two dedup forms the extended.py family doesn't cover:

* ``dedup_semdedup`` — the SemDeDup recipe (Abbas et al. 2023,
  arXiv:2303.09540): cluster the embedding space, then compare pairs
  ONLY within a cluster and drop all but one representative of each
  near-dup group. This is the production answer to
  ``dedup_embedding_cosine``'s documented O(n²) problem: pairwise cost
  becomes Σ(cell²) instead of n², bounded by the coarse-quantizer
  balance, and the pair join is a plain equi-join on the cell key.

* ``text_shingle_containment`` — containment C(A→B) = |A∩B| / |A|,
  the asymmetric near-dup metric (Broder 1997's "containment", used
  for doc-inside-doc: boilerplate wraps, quote extraction, page
  superset/subset detection). Jaccard misses a short doc fully
  embedded in a long one (union is large); containment catches it.

Both reuse the engine's existing primitives — the IVF coarse
quantizer (plans/ivf.py) and the 3-gram shingle stream
(plans/extended.py) — so the cross-engine parity of those primitives
carries over unchanged.

Reference parity note: the reference has no embedding or similarity
surface (its tables are relational, reference db.py:89-186); this
module is part of the training-data-pipeline extension the brief
requires beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.plans.extended import (
    _SHINGLES_SQL,
    _doc_shingles,
    _dot_unrolled,
    _load_embeddings,
)
from compendium_spark.plans.ivf import _SQL_SCORES, _assign_cells
from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan

# SemDeDup proper uses a high cosine bar (0.95+) on real text
# embeddings; the synthetic near-orthogonal testdata tops out around
# 0.46 within a cell, so the bar sits at 0.4 to exercise the
# drop/keep logic on a real result set. Semdedup finds a SUBSET of
# the all-pairs cosine graph at the same bar (only pairs co-located
# in a cell), never new pairs — asserted in tests/test_semantic.py.
COS_TAU = 0.4

SEMDEDUP_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
assign AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, cell) AS rn
  FROM scores
),
cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
pairs AS (
  SELECT ca.cell, ca.vec_id AS va, cb.vec_id AS vb,
         list_sum(list_transform(a.e, (x, i) -> x * b.e[i]))
           / (a.nrm * b.nrm) AS cos
  FROM cells ca
  JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
  JOIN n a ON a.vec_id = ca.vec_id
  JOIN n b ON b.vec_id = cb.vec_id
)
SELECT vb AS vec_id, cell,
       COUNT(*) AS n_dups,
       CAST(FLOOR(CAST((MAX(cos)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS max_cosine
FROM pairs
WHERE cos >= {COS_TAU}
GROUP BY vb, cell
ORDER BY vec_id
"""


def _cell_pair_cosines(sided: DataFrame, tau: float) -> DataFrame:
    """(cell, va, vb, cos) for every same-cell pair clearing ``tau`` —
    the per-cell pairwise scorer as a grouped-map NumPy kernel.

    One BLAS-shaped pass per cell instead of a 64-term codegen
    expression per pair (the round-4 form: correct, but 64 scalar ops
    x pairs of JVM codegen — 2.7x the wall of the next-slowest plan at
    sf0.1). Bit-parity with the oracle's list_sum left fold is kept by
    accumulating SEQUENTIALLY over dims — 64 vectorized rank-1 updates
    (same trick as ivf._assign_cells), NOT np.matmul (blocked/pairwise
    accumulation, different rounding). Norms fold the same way; sqrt,
    multiply, divide are single correctly-rounded IEEE ops on both
    engines. Only pairs >= tau leave the kernel, so the output is
    O(near-dups), never O(cell^2)."""
    import pandas as pd  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    out_schema = "cell int, va long, vb long, cos double"

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {"cell": pd.Series(dtype="int32"), "va": pd.Series(dtype="int64"),
                 "vb": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")}
            )
        pdf = pdf.sort_values("vec_id")
        x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
        m = len(x)
        acc = np.zeros((m, m))
        nsq = np.zeros(m)
        for d in range(x.shape[1]):
            col = x[:, d]
            acc += col[:, None] * col[None, :]
            nsq += col * col
        nrm = np.sqrt(nsq)
        cos = acc / (nrm[:, None] * nrm[None, :])
        iu, ju = np.triu_indices(m, k=1)
        keep = cos[iu, ju] >= tau
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame(
            {
                "cell": np.full(int(keep.sum()), pdf["cell"].iloc[0], dtype="int32"),
                "va": ids[iu[keep]],
                "vb": ids[ju[keep]],
                "cos": cos[iu, ju][keep],
            }
        )

    return sided.groupBy("cell").applyInPandas(pairs, schema=out_schema)


def _semdedup_pairs_codegen(sided: DataFrame) -> DataFrame:
    """The round-4 unrolled-codegen pair scorer — kept as the
    oracle-parity twin of `_cell_pair_cosines` (tests assert the two
    produce bitwise-identical pairs)."""
    a = sided.select(
        F.col("cell"),
        F.col("vec_id").alias("va"),
        F.col("e").alias("ae"),
        F.col("nrm").alias("an"),
    )
    b = sided.select(
        F.col("cell").alias("cellb"),
        F.col("vec_id").alias("vb"),
        F.col("e").alias("be"),
        F.col("nrm").alias("bn"),
    )
    cos = _dot_unrolled(F.col("ae"), F.col("be")) / (F.col("an") * F.col("bn"))
    return (
        a.join(b, (F.col("cell") == F.col("cellb")) & (F.col("va") < F.col("vb")))
        .filter(cos >= COS_TAU)
        .select("cell", "va", "vb", cos.alias("cos"))
    )


def _semdedup(
    spark: SparkSession,
    sf_dir: str,
    centroids: list[list[float]] | None = None,
    use_kernel: bool = True,
) -> DataFrame:
    """Parameterized SemDeDup core. ``centroids`` sets the coarse
    quantizer (default: the 16-cell IVF table the oracle embeds);
    production picks K ~ n / target_cell_size — see
    ivf.make_centroids for the K-scaling rule."""
    emb = _load_embeddings(spark, sf_dir)
    cells = _assign_cells(emb, centroids)
    if use_kernel:
        sided = emb.join(cells, "vec_id")
        surv = _cell_pair_cosines(sided, COS_TAU)
    else:
        emb = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
        surv = _semdedup_pairs_codegen(emb.join(cells, "vec_id"))
    return (
        surv.groupBy(F.col("vb").alias("vec_id"), "cell")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            quantize6(F.max("cos")).alias("max_cosine"),
        )
        .orderBy("vec_id")
    )


@plan("dedup_semdedup", oracle=SEMDEDUP_SQL)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: drop embeddings with a same-cell smaller-id near-dup.

    Output = the DROPPED vectors (greedy pairwise keeper policy: a
    vector survives iff it has NO smaller-id same-cell near-dup —
    deterministic on both engines; note this can keep several members
    of one connected near-dup relation, e.g. edges {a-c, b-c} with
    a<b<c keep both a and b), with the cell each drop was caught in,
    how many smaller near-dups it has, and the strongest cosine.
    At 100 TB:

    * cell assignment is the one map-only pass over the corpus
      (plans/ivf.py `_assign_cells` — Arrow kernel, no shuffle);
    * K (the quantizer size) is now a PARAMETER (`_semdedup` /
      ivf.make_centroids): per-cell pair cost is (n/K)^2, so K scales
      ~ n to hold cell occupancy constant (SemDeDup production uses
      ~1e5 clusters). The registered plan runs K=16 to match the
      oracle's embedded centroid table;
    * pair scoring is ONE grouped-map NumPy pass per cell
      (`_cell_pair_cosines` — dim-sequential accumulation keeps
      list_sum-fold bit-parity); the hash-partition is the cell key,
      so pairwise work is sum over cells of cell^2, and nothing is
      broadcast. The corpus-wide O(n^2) of the exact baseline never
      occurs. The round-4 unrolled-codegen scorer remains as the
      tested parity twin (`_semdedup_pairs_codegen`).

    Subset invariant: every (va, vb) pair here appears in the exact
    all-pairs cosine graph at the same bar; recall loss is exactly the
    pairs split across cells — measured in tests/test_semantic.py,
    like the ANN recall assertions.

    r13 decade probe (SCALING.md): +0.50 slope, 4.3 s at sf1.0
    (n=20000) — this IS the registered full-corpus embedding-dedup
    path; dedup_embedding_cosine (LSH-bucketed exact verify, k=4
    bits) measured +2.13 there and is the ≤10⁴-vector tool.
    """
    return _semdedup(spark, sf_dir)


# Containment bar: higher than the Jaccard bar (0.2) because
# containment >= jaccard for every pair; 0.5 = "half of the smaller
# doc's shingles appear in the other".
CONTAINMENT_TAU = 0.5

CONTAINMENT_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle FROM documents
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(FLOOR(CAST((1.0 * n_common / ca.n) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS cont_a_in_b,
       CAST(FLOOR(CAST((1.0 * n_common / cb.n) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS cont_b_in_a
FROM inter
JOIN cnt ca ON doc_a = ca.doc_id
JOIN cnt cb ON doc_b = cb.doc_id
WHERE 1.0 * n_common / ca.n >= {CONTAINMENT_TAU}
   OR 1.0 * n_common / cb.n >= {CONTAINMENT_TAU}
ORDER BY doc_a, doc_b
"""


@plan("text_shingle_containment", oracle=CONTAINMENT_SQL)
def text_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment for candidate pairs.

    C(A→B) = |A∩B| / |A| in both directions; a pair survives if either
    direction clears the bar — i.e. one doc's shingle set is mostly
    inside the other's, the doc-in-doc signal Jaccard dilutes. Same
    physical shape as `dedup_ngram_jaccard` (shingle equi-join for the
    intersection, inclusion-free denominators), so the same scale
    story: at 100 TB this runs on LSH candidates only, and only
    (doc_id, shingle-hash) pairs shuffle — never the text. All
    integer-ratio math → engine-exact.
    """
    sh = _doc_shingles(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    c_ab = F.lit(1.0) * F.col("n_common") / F.col("ca.n")
    c_ba = F.lit(1.0) * F.col("n_common") / F.col("cb.n")
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter((c_ab >= CONTAINMENT_TAU) | (c_ba >= CONTAINMENT_TAU))
        .select(
            "doc_a",
            "doc_b",
            quantize6(c_ab).alias("cont_a_in_b"),
            quantize6(c_ba).alias("cont_b_in_a"),
        )
        .orderBy("doc_a", "doc_b")
    )
