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
from compendium_spark.plans.registry import plan

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


def _probe_cells(emb: DataFrame, n_probe: int) -> DataFrame:
    """(query_id, cell) — the ``n_probe`` best cells per query vector,
    computed in the SAME sequential-accumulation Arrow kernel as
    ``_assign_cells`` (scores bit-identical to the fold-dot / DuckDB
    list_sum), with the oracle's ROW_NUMBER ORDER BY score DESC, cell
    tie-break via a stable lexsort. Replaces a 16-fold-dot + window
    subtree whose codegen alone cost ~1 s per run at any scale — the
    probe list is tiny (queries × n_probe rows), the work belongs in
    one NumPy batch."""
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
            qids, cells = [], []
            cell_idx = np.arange(N_CELLS)
            for r in range(len(x)):
                # stable: cell ascending as secondary, -score primary
                order = np.lexsort((cell_idx, -scores[r]))[:n_probe]
                qids.extend([pdf["vec_id"].iloc[r]] * n_probe)
                cells.extend(order.tolist())
            yield pd.DataFrame(
                {"query_id": qids, "cell": np.asarray(cells, dtype="int32")}
            )

    return emb.select("vec_id", "e").mapInPandas(
        probe, schema="query_id long, cell int"
    )


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
