"""IVF-style approximate nearest neighbor: coarse quantizer + probes.

The second ANN family next to random-hyperplane LSH (plans/ann.py):
every vector is assigned to its nearest of K seeded coarse centroids
(the inverted-file cell); a query scores only the vectors in its
`nprobe` closest cells, then exact-cosine re-ranks them.

At 100 TB: the corpus is stored partitioned by cell (the inverted
file); assignment is one map-only pass (K dot products per vector);
a query touches nprobe/K of the data. Real deployments train
centroids with k-means — here they are fixed seeded Gaussians, which
keeps the operator deterministic and lets the SAME literal centroids
be embedded in the DuckDB oracle, making even the ANN path
value-hash-checked. The assignment/probe math is expressed as
rank-over-(vector × centroid) rather than argmax-over-array so both
engines share one formulation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

N_CELLS = 16
N_PROBE = 4
DIM = 64


def make_centroids(k: int, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    """Seeded coarse-quantizer centroids for any K.

    K is the scale knob of every cell-bounded operator (IVF probe
    cost, SemDeDup pair cost): per-cell work grows ~ (n/K)^2, so K
    must scale ~ n to hold cell occupancy (and thus per-cell cost)
    constant — SemDeDup production runs ~1e5 clusters. The draw order
    matches the original literal table, so ``make_centroids(16)`` is
    bit-identical to the CENTROIDS baked into the DuckDB oracles."""
    rng = np.random.default_rng(seed)
    return [
        [round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(k)
    ]


CENTROIDS: list[list[float]] = make_centroids(N_CELLS)


def _assign_cells(emb: DataFrame, centroids: list[list[float]] | None = None) -> DataFrame:
    """(vec_id, cell) — nearest-centroid assignment computed entirely
    MAP-SIDE: cell = first index of the max score in the K-element
    score array. array_position picks the FIRST occurrence of the max,
    which is exactly the oracle's ROW_NUMBER ... ORDER BY score DESC,
    cell tie-break, so no explode, no shuffle, no window — the
    inverted-file build touches each vector once in the scan stage
    (at 100 TB this IS the index build; a per-vector window over a
    16x-exploded corpus would shuffle 16 rows per vector instead)."""
    import pandas as pd  # noqa: PLC0415

    cent = np.asarray(
        CENTROIDS if centroids is None else centroids, dtype=np.float64
    )  # (K, DIM)
    n_cells = len(cent)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)  # (n, DIM)
            # accumulate SEQUENTIALLY over dims (vectorized over rows):
            # identical rounding to the engine's left-fold dot and
            # DuckDB's list_sum, so the argmax below cannot diverge
            # from the oracle's score ranking. (np.dot/matmul use
            # blocked/pairwise accumulation — different rounding.)
            scores = np.zeros((len(x), n_cells))
            for k in range(n_cells):
                acc = np.zeros(len(x))
                for d in range(x.shape[1]):
                    acc = acc + x[:, d] * cent[k, d]
                scores[:, k] = acc
            # np.argmax keeps the FIRST max — the oracle's
            # ORDER BY score DESC, cell tie-break
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": scores.argmax(axis=1).astype("int32")}
            )

    # Arrow-batched kernel, not 16 interpreted fold-dots per row: dense
    # K×DIM scoring is exactly the "vectorized Pandas UDF" case — the
    # fold form costs >1s per 2k vectors interpreted; this is
    # milliseconds of numpy per batch. Project to the two needed
    # columns first (mapInPandas ships every input column).
    return emb.select("vec_id", "e").mapInPandas(
        assign, schema="vec_id long, cell int"
    )


def _assign_partials(
    emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(cell, pos, s, c) — per-(cell, dim) PARTIAL micro-unit sums and
    member counts for Lloyd's update, computed in the same batch that
    assigns each vector to its nearest centroid (identical scoring and
    FIRST-max tie-break as ``_assign_cells``). Each Arrow batch emits
    at most N_CELLS×DIM rows regardless of corpus size, so the
    per-iteration shuffle is bounded by batches × N_CELLS × DIM —
    guide §2.3's aggregate-before-shuffle applied to k-means: the
    alternative (assignment join against a posexploded coordinate
    table) shuffles O(corpus × DIM) rows per iteration.

    Exactness contract: s sums floor(x·1e6 + 0.5) per coordinate
    (np.floor ≡ the engine's FLOOR on the same IEEE doubles) as int64
    — order-free integer partials, so the downstream mean is
    bit-identical to summing the coordinates one row at a time."""
    import pandas as pd  # noqa: PLC0415

    cent = np.asarray(centroids, dtype=np.float64)  # (K, DIM)
    n_cells = len(cent)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)  # (n, DIM)
            # sequential per-dim accumulation — see _assign_cells
            scores = np.zeros((len(x), n_cells))
            for k in range(n_cells):
                acc = np.zeros(len(x))
                for d in range(x.shape[1]):
                    acc = acc + x[:, d] * cent[k, d]
                scores[:, k] = acc
            cell = scores.argmax(axis=1)  # FIRST max == oracle tie-break
            xm = np.floor(x * 1e6 + 0.5).astype(np.int64)
            out_cell, out_pos, out_s, out_c = [], [], [], []
            for k in np.unique(cell):
                mask = cell == k
                sums = xm[mask].sum(axis=0)  # exact int64 per dim
                cnt = int(mask.sum())
                dim = x.shape[1]
                out_cell.extend([int(k)] * dim)
                out_pos.extend(range(1, dim + 1))
                out_s.extend(int(v) for v in sums)
                out_c.extend([cnt] * dim)
            yield pd.DataFrame(
                {
                    "cell": pd.array(out_cell, dtype="int32"),
                    "pos": pd.array(out_pos, dtype="int32"),
                    "s": pd.array(out_s, dtype="int64"),
                    "c": pd.array(out_c, dtype="int64"),
                }
            )

    return emb.select("e").mapInPandas(
        partials, schema="cell int, pos int, s long, c long"
    )


def _probe_cells(emb: DataFrame, n_probe: int, ranked: bool = False) -> DataFrame:
    """(query_id, cell[, prank]) — the ``n_probe`` best cells per query
    vector, computed in the SAME sequential-accumulation Arrow kernel
    as ``_assign_cells`` (scores bit-identical to the fold-dot / DuckDB
    list_sum), with the oracle's ROW_NUMBER ORDER BY score DESC, cell
    tie-break via a stable lexsort. Replaces a 16-fold-dot + window
    subtree whose codegen alone cost ~1 s per run at any scale — the
    probe list is tiny (queries × n_probe rows), the work belongs in
    one NumPy batch. With ``ranked=True`` the 1-based probe rank rides
    along (the nprobe-sweep form: "nprobe = p" is the prank ≤ p slice,
    because probe lists are NESTED in the rank)."""
    import pandas as pd  # noqa: PLC0415

    centroids = np.asarray(CENTROIDS, dtype=np.float64)  # (K, DIM)

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            scores = np.zeros((len(x), N_CELLS))
            for k in range(N_CELLS):
                acc = np.zeros(len(x))
                for d in range(x.shape[1]):
                    acc = acc + x[:, d] * centroids[k, d]
                scores[:, k] = acc
            qids, cells, pranks = [], [], []
            cell_idx = np.arange(N_CELLS)
            for r in range(len(x)):
                # stable: cell ascending as secondary, -score primary
                order = np.lexsort((cell_idx, -scores[r]))[:n_probe]
                qids.extend([pdf["vec_id"].iloc[r]] * len(order))
                cells.extend(order.tolist())
                pranks.extend(range(1, len(order) + 1))
            out = {"query_id": qids, "cell": np.asarray(cells, dtype="int32")}
            if ranked:
                out["prank"] = np.asarray(pranks, dtype="int32")
            yield pd.DataFrame(out)

    schema = "query_id long, cell int" + (", prank int" if ranked else "")
    return emb.select("vec_id", "e").mapInPandas(probe, schema=schema)


def _sql_centroid_lit(c: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + "]"


_SQL_CENTROIDS = " UNION ALL ".join(
    f"SELECT {i} AS cell, {_sql_centroid_lit(c)} AS cvec"
    for i, c in enumerate(CENTROIDS)
)

_SQL_SCORES = f"""
  SELECT v.vec_id, k.cell,
         list_sum(list_transform(v.e, (x, i) -> x * k.cvec[i])) AS score
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings) v, ({_SQL_CENTROIDS}) k
"""

IVF_CELLS_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
assign AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, cell) AS rn
  FROM scores
)
SELECT cell, COUNT(*) AS n_vectors
FROM assign WHERE rn = 1
GROUP BY cell ORDER BY cell
"""


@plan("sim_ivf_cells", oracle=IVF_CELLS_SQL)
def sim_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file cell occupancy — the index build half of IVF, and
    the balance diagnostic (an empty/overfull cell means re-seed or
    train real centroids)."""
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir)
    return (
        _assign_cells(emb)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cell")
    )


IVF_TOPK_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores WHERE vec_id < 10
  ) WHERE rn <= {N_PROBE}
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT cand.query_id, cand.cand_id,
         list_sum(list_transform(q.e, (x, i) -> x * c.e[i])) / (q.nrm * c.nrm)
           AS cos_full,
         ROW_NUMBER() OVER (PARTITION BY cand.query_id
                            ORDER BY list_sum(list_transform(q.e, (x, i) -> x * c.e[i]))
                                       / (q.nrm * c.nrm) DESC, cand.cand_id) AS rn
  FROM cand
  JOIN n q ON cand.query_id = q.vec_id
  JOIN n c ON cand.cand_id = c.vec_id
)
SELECT query_id, cand_id, CAST(FLOOR(CAST((cos_full) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS cosine, rn AS rank
FROM ranked WHERE rn <= 5
ORDER BY query_id, rank
"""


@plan("sim_ivf_topk", oracle=IVF_TOPK_SQL)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: probe the {N_PROBE} best cells per query, exact
    cosine re-rank inside the probed cells only.

    Plan shape: candidates come from a (cell) equi-join of the tiny
    probe list against the inverted file — shuffle keyed on cell id,
    never a cross join; the re-rank joins fetch vectors by id
    (broadcast on the query side)."""
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    # inverted file: map-side argmax assignment, no explode/window
    assign = _assign_cells(emb)
    # probe list: the ≤10 query vectors ranked in the same Arrow kernel
    # as the assignment (no 16-fold-dot codegen subtree, no window)
    probes = _probe_cells(emb.filter(F.col("vec_id") < 10), N_PROBE)
    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
    # assign is unique per vec_id and a query's probe cells are
    # distinct, so the cell join cannot duplicate (query, cand) pairs —
    # no DISTINCT (the oracle's is vacuous for the same reason).
    # NO forced broadcast hints anywhere in this chain: every forced
    # hint spawns an eager broadcast job that re-executes its subtree
    # (measured: all-hinted 4.0s vs all-AQE 3.0s at sf0.1); AQE
    # broadcasts the same small sides from already-materialized shuffle
    # stages, and the 64-dim corpus vectors still never shuffle.
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    # query-side norms only for the 10 query vectors: Catalyst cannot
    # push cand's query_id < 10 constraint through the join, so without
    # this filter the q subtree computes 64-dim norms for the WHOLE
    # corpus a second time
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot_unrolled(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    pairs = (
        cand.join(q, "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", cos.alias("cos_full"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_full"), "cand_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "cand_id",
            quantize6("cos_full").alias("cosine"),
            F.col("rn").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# cosine radius for range search: below the near-dup bar (0.4) so the
# result set is non-trivial on the near-orthogonal synthetic vectors
RANGE_TAU = 0.25

RANGE_SEARCH_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores WHERE vec_id < 10
  ) WHERE rn <= {N_PROBE}
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
)
SELECT cand.query_id, cand.cand_id,
       CAST(FLOOR(CAST((list_sum(list_transform(q.e, (x, i) -> x * c.e[i]))
            / (q.nrm * c.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS cosine
FROM cand
JOIN n q ON cand.query_id = q.vec_id
JOIN n c ON cand.cand_id = c.vec_id
WHERE list_sum(list_transform(q.e, (x, i) -> x * c.e[i])) / (q.nrm * c.nrm)
      >= {RANGE_TAU}
ORDER BY query_id, cand_id
"""


@plan("sim_range_search", oracle=RANGE_SEARCH_SQL)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search: ALL candidates within cosine >= tau of
    each query, probe-pruned — the fixed-threshold companion to
    `sim_ivf_topk`'s fixed-k search (dedup wants "everything closer
    than tau", not "the 5 closest").

    Same physical shape as the top-k form: cell-key equi-join of the
    tiny probe list against the inverted file, exact-cosine re-rank of
    candidates only, filter instead of window — strictly CHEAPER than
    top-k at scale (no per-query ranking state, the filter is
    scan-stage). Recall story is the IVF family's: a true neighbor is
    missed only when its cell is outside the probe set."""
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    assign = _assign_cells(emb)
    probes = _probe_cells(emb.filter(F.col("vec_id") < 10), N_PROBE)
    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot_unrolled(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    return (
        cand.join(q, "query_id")
        .join(c, "cand_id")
        .filter(cos >= RANGE_TAU)
        .select("query_id", "cand_id", quantize6(cos).alias("cosine"))
        .orderBy("query_id", "cand_id")
    )


# ---------------------------------------------------------------------------
# sim_ivf_tuning_curve — the nprobe sweep (recall vs candidate cost)
# ---------------------------------------------------------------------------

# The IVF counterpart of dedup_lsh_tuning_curve: per candidate nprobe,
# measured recall@5 against the exact top-5 and the candidate-set cost
# — the table that picks nprobe. Computed in ONE pass: probe lists are
# NESTED (top-1 cells ⊂ top-2 ⊂ top-4 ⊂ top-8), so every candidate is
# generated once at the MAX probe depth tagged with the probe RANK of
# its cell, and "nprobe = p" is the prank ≤ p slice.
PROBE_SWEEP = [1, 2, 4, 8]
TUNE_K = 5

_TUNE_SWEEP_LIT = ", ".join(str(p) for p in PROBE_SWEEP)

TUNING_CURVE_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell, rn AS prank FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores WHERE vec_id < 10
  ) WHERE rn <= {max(PROBE_SWEEP)}
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
ex_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         CAST(FLOOR(CAST((list_sum(list_transform(q.e, (x, i) -> x * c.e[i]))
           / (q.nrm * c.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           / 1000000.0 AS cosine
  FROM n q, n c
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
),
ex5 AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS rn
    FROM ex_pairs
  ) WHERE rn <= {TUNE_K}
),
flagged AS (
  SELECT c.query_id, c.cand_id, c.prank,
         CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END AS is_hit
  FROM (
    SELECT p.query_id, a.vec_id AS cand_id, p.prank
    FROM probes p JOIN assign a ON p.cell = a.cell
    WHERE a.vec_id <> p.query_id
  ) c
  LEFT JOIN ex5 e
    ON c.query_id = e.query_id AND c.cand_id = e.cand_id
),
lv AS (
  SELECT f.prank, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(f.is_hit) AS BIGINT) AS n_hits
  FROM flagged f GROUP BY f.prank
),
agg AS (
  SELECT s.nprobe,
         CAST(COALESCE(SUM(lv.n_candidates), 0) AS BIGINT) AS n_candidates,
         CAST(COALESCE(SUM(lv.n_hits), 0) AS BIGINT) AS n_hits
  FROM (SELECT unnest([{_TUNE_SWEEP_LIT}]) AS nprobe) s
  LEFT JOIN lv ON lv.prank <= s.nprobe
  GROUP BY s.nprobe
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM embeddings),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM embeddings
       WHERE vec_id < 10)
SELECT a.nprobe, a.n_candidates, a.n_hits,
       CAST(FLOOR(CAST((1.0 * a.n_hits / ({TUNE_K} * nq.n_queries))
                  AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS recall_at_k,
       CAST(FLOOR(CAST((1.0 * a.n_candidates
                        / (nq.n_queries * (tot.n_corpus - 1)))
                  AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS cand_share
FROM agg a, tot, nq
ORDER BY a.nprobe
"""


@plan("sim_ivf_tuning_curve", oracle=TUNING_CURVE_SQL)
def sim_ivf_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF nprobe tuning curve: for each candidate probe depth in
    PROBE_SWEEP, measured recall@5 against the exact brute-force top-5
    and the candidate-set cost (share of the corpus each query scans)
    — the two columns whose crossing picks nprobe for a deployment
    (dedup_lsh_tuning_curve's banding S-curve, for the IVF family;
    sim_recall_report's per-query dashboard, collapsed to the knob
    sweep).

    One-pass shape: probe lists are NESTED in the probe rank, so
    candidates are generated ONCE at the max sweep depth tagged with
    their cell's probe rank (``_probe_cells(..., ranked=True)``), and
    each sweep level aggregates the prank ≤ p slice — per-rank
    partials roll up through a max(PROBE_SWEEP)-row frame, not a
    re-join per level. The exact baseline is the documented ≤10-query
    broadcast sweep; every ranking compares the QUANTIZED cosine.
    Integer counts throughout; float enters at the two final share
    divisions."""
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    assign = _assign_cells(emb)
    probes = _probe_cells(
        emb.filter(F.col("vec_id") < 10), max(PROBE_SWEEP), ranked=True
    )
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), "prank")
    )

    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot_unrolled(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    ex_pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", quantize6(cos).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    ex5 = (
        ex_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TUNE_K)
        .select("query_id", "cand_id", F.lit(1).alias("is_hit"))
    )

    flagged = cand.join(ex5, ["query_id", "cand_id"], "left").select(
        "prank", F.coalesce("is_hit", F.lit(0)).alias("is_hit")
    )
    # per-rank partials (≤ max(PROBE_SWEEP) rows), then the nested
    # roll-up: level p sums ranks 1..p — a tiny triangular fold, no
    # re-join of the candidate stream per level.
    lv = flagged.groupBy("prank").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum("is_hit").cast("long").alias("n_hits"),
    )
    sweep = local_df(spark, [(p,) for p in PROBE_SWEEP], "nprobe int")
    agg = (
        F.broadcast(sweep)
        .join(lv, lv["prank"] <= sweep["nprobe"], "left")
        .groupBy("nprobe")
        .agg(
            F.coalesce(F.sum("n_candidates"), F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    nq = emb.filter(F.col("vec_id") < 10).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nq))
        .select(
            "nprobe",
            "n_candidates",
            "n_hits",
            quantize6(
                F.lit(1.0) * F.col("n_hits")
                / (F.lit(TUNE_K) * F.col("n_queries"))
            ).alias("recall_at_k"),
            quantize6(
                F.lit(1.0) * F.col("n_candidates")
                / (F.col("n_queries") * (F.col("n_corpus") - 1))
            ).alias("cand_share"),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# sim_filtered_topk — label-constrained (filtered) ANN search
# ---------------------------------------------------------------------------

# The filtered-search problem every production vector store documents
# (FAISS IDSelector, Qdrant/Milvus filtered search): top-k restricted
# to candidates satisfying a metadata predicate — here, sharing the
# QUERY's label (~10% selectivity on the fixture's 10 labels). The
# predicate applies BEFORE the exact re-rank (pre-filter on the
# inverted-file side of the cell join), so re-rank cost scales with
# the FILTERED candidate count; n_candidates is emitted per row to
# make that cost visible next to the result.
FILTERED_K = 5

FILTERED_TOPK_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores WHERE vec_id < 10
  ) WHERE rn <= {N_PROBE}
),
lab AS (SELECT vec_id, label FROM embeddings),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
cand AS (
  SELECT p.query_id, a.vec_id AS cand_id
  FROM probes p
  JOIN assign a ON p.cell = a.cell
  JOIN lab ql ON p.query_id = ql.vec_id
  JOIN lab cl ON a.vec_id = cl.vec_id AND cl.label = ql.label
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT cand.query_id, cand.cand_id,
         CAST(FLOOR(CAST((list_sum(list_transform(q.e, (x, i) -> x * c.e[i]))
           / (q.nrm * c.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           / 1000000.0 AS cosine,
         CAST(COUNT(*) OVER (PARTITION BY cand.query_id) AS BIGINT)
           AS n_candidates
  FROM cand
  JOIN n q ON cand.query_id = q.vec_id
  JOIN n c ON cand.cand_id = c.vec_id
)
SELECT query_id, cand_id, cosine, rn AS rank, n_candidates
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id) AS rn
  FROM ranked
) WHERE rn <= {FILTERED_K}
ORDER BY query_id, rank
"""


@plan("sim_filtered_topk", oracle=FILTERED_TOPK_SQL)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN: IVF-probed top-k restricted to candidates whose
    label matches the query's — metadata-constrained vector search
    (FAISS IDSelector / vector-store filtered search), the operator a
    retrieval pipeline runs when the index serves many tenants,
    languages, or shards from one table.

    Shape: the predicate is applied at CANDIDATE GENERATION (the label
    equi-join folds into the probe⋈inverted-file join), so the
    expensive exact re-rank touches only filtered candidates — the
    pre-filter strategy, correct at any selectivity (a post-filter
    top-k can return <k rows when the filter bites). Per-row
    n_candidates makes the filtered probe cost visible. Same seeded
    centroids, probe ranking and quantized-cosine ordering as
    sim_ivf_topk; the label column rides the slim (vec_id, cell)
    inverted file, never the vectors."""
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    lab = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    assign = _assign_cells(emb)
    probes = _probe_cells(emb.filter(F.col("vec_id") < 10), N_PROBE)
    ql = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    cl = lab.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("clabel")
    )
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
        .join(F.broadcast(ql.filter(F.col("query_id") < 10)), "query_id")
        .join(cl, "cand_id")
        .filter(F.col("clabel") == F.col("qlabel"))
        .select("query_id", "cand_id")
    )
    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot_unrolled(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    ranked = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", quantize6(cos).alias("cosine"))
        .withColumn(
            "n_candidates",
            F.count(F.lit(1)).over(Window.partitionBy("query_id")).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= FILTERED_K)
        .select(
            "query_id",
            "cand_id",
            "cosine",
            F.col("rn").alias("rank"),
            "n_candidates",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# train_ivf_centroids — Lloyd training of the coarse quantizer
# ---------------------------------------------------------------------------

# The train step of the IVF coarse quantizer (FAISS `Clustering` on the
# full vectors): sim_ivf_* probes FIXED seeded centroids; this plan
# RUNS the k-means those deployments train with — two Lloyd iterations
# from the seeded centroids as init, returning the trained centroids.
# Completes the IVF index-build story the way train_pq_codebooks
# completes PQ's. Same determinism discipline: per-(cell, dim) means
# are exact micro-unit BIGINT sums divided once and FLOOR-quantized
# before the next assignment, and the assignment argmax uses the same
# sequential accumulation as _assign_cells, so both engines walk
# identical centroids through both iterations.
IVF_TRAIN_ITERS = 2


def _ivf_train_sql() -> str:
    from compendium_spark.functions.numeric import sql_quantize6  # noqa: PLC0415

    cb0 = " UNION ALL ".join(
        f"SELECT {i} AS cell, {_sql_centroid_lit(c)} AS cvec"
        for i, c in enumerate(CENTROIDS)
    )
    mean = (
        "SUM(CAST(FLOOR(ex.x * 1000000.0 + 0.5) AS BIGINT))"
        " / (COUNT(*) * 1000000.0)"
    )

    def assign(c: int, prev_cb: str) -> str:
        # nearest = best dot score (the _assign_cells rule), tie → cell
        return f"""
a{c} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, k.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
             list_sum(list_transform(v.e, (x, i) -> x * k.cvec[i])) DESC,
             k.cell) AS rn
    FROM v JOIN {prev_cb} k ON TRUE
  ) WHERE rn = 1
)"""

    def update(c: int, prev_cb: str) -> str:
        return f"""
mu{c} AS MATERIALIZED (
  SELECT a.cell, ex.pos, {sql_quantize6(mean)} AS v
  FROM (
    SELECT vec_id, unnest(e) AS x,
           unnest(range(1, {DIM} + 1)) AS pos
    FROM v
  ) ex
  JOIN a{c} a ON ex.vec_id = a.vec_id
  GROUP BY a.cell, ex.pos
),
cb{c} AS MATERIALIZED (
  SELECT p.cell,
         list_transform(range(1, {DIM} + 1),
                        i -> COALESCE(mu.mlist[i], p.cvec[i])) AS cvec
  FROM {prev_cb} p LEFT JOIN (
    SELECT cell, list(v ORDER BY pos) AS mlist FROM mu{c} GROUP BY cell
  ) mu ON p.cell = mu.cell
)"""

    iters = []
    prev = "cb0"
    for c in range(1, IVF_TRAIN_ITERS + 1):
        iters.append("," + assign(c, prev) + "," + update(c, prev))
        prev = f"cb{c}"
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cb0 AS MATERIALIZED ({cb0}){"".join(iters)}
SELECT CAST(c.cell AS INT) AS cell, CAST(p.pos AS INT) AS pos,
       {sql_quantize6("c.cvec[p.pos]")} AS value
FROM {prev} c, (SELECT unnest(range(1, {DIM} + 1)) AS pos) p
ORDER BY cell, pos
"""


@plan("train_ivf_centroids", oracle=_ivf_train_sql())
def train_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd training of the IVF coarse quantizer: IVF_TRAIN_ITERS
    k-means iterations over the full vectors, initialized from the
    seeded centroids sim_ivf_* probes against — FAISS's coarse
    `Clustering`, expressed Spark-first. Returns the trained centroids
    as (cell, pos, value) rows. Same nearest rule as the serving path
    (max dot score, tie → lowest cell), so the trained table drops
    into _assign_cells unchanged.

    Scale: each iteration is ONE Arrow pass over the corpus — the
    ``_assign_partials`` kernel scores/assigns exactly like the
    audited _assign_cells and emits per-(cell, dim) partial integer
    sums in the same batch, so the per-iteration shuffle is bounded by
    batches × N_CELLS × DIM partial rows (no join, no coordinate
    explode — r14; guide §2.3) and the driver collects only the
    N_CELLS×DIM means (the kmeans precedent); the corpus never
    shuffles raw vectors, centroids ride the closure. Empty cells keep
    their previous centroid (the oracle's COALESCE).

    Parity AND run-to-run determinism: per-dim means are EXACT
    micro-unit BIGINT sums divided once (never an unordered float AVG
    — the seasonal-decompose boundary-flip class), FLOOR-quantized
    before entering the next assignment, and the assignment kernel
    accumulates dims sequentially, so both engines walk identical
    centroids through every iteration."""
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir).localCheckpoint(eager=True)
    cents = [list(c) for c in CENTROIDS]
    for _ in range(IVF_TRAIN_ITERS):
        # ONE kernel pass per iteration emits per-(cell, pos) PARTIAL
        # integer sums straight from the assignment batch (r14): the
        # r13 shape joined a 128k-row posexploded-coordinate checkpoint
        # against the assignment on vec_id and re-shuffled both every
        # iteration (guide §2.3: aggregate before you shuffle). Now the
        # shuffle per iteration is <= batches × N_CELLS × DIM partial
        # rows and there is no join at all. Parity is untouched: the
        # partials are exact micro-unit BIGINTs (np.floor is the same
        # IEEE floor the old Spark expression applied per coordinate,
        # integer sums are order-free), the final mean divides the same
        # exact totals once, in Spark, through the same quantize6.
        rows = (
            _assign_partials(emb, cents)
            .groupBy("cell", "pos")
            .agg(
                quantize6(
                    F.sum("s") / (F.sum("c") * F.lit(1000000.0))
                ).alias("v")
            )
            .collect()
        )  # ≤ N_CELLS×DIM rows: bounded driver work, the kmeans precedent
        for r in rows:
            cents[r.cell][r.pos - 1] = r.v
    out = [
        (cell, pos + 1, float(cents[cell][pos]))
        for cell in range(N_CELLS)
        for pos in range(DIM)
    ]
    return (
        local_df(spark, out, "cell int, pos int, value double")
        .select("cell", "pos", quantize6("value").alias("value"))
        .orderBy("cell", "pos")
    )
