"""Approximate nearest neighbor: random-hyperplane LSH.

The scale path for similarity search (sim_cosine_topk is the exact
baseline): hash every vector into L independent hash tables, each
keyed by the sign pattern of dot products with k random hyperplanes.
Candidates = vectors sharing a bucket in ANY table (OR-amplification:
k bits per table sharpens precision, L tables recover recall), then
exact cosine re-rank of candidates only.

At 100 TB: the corpus is hashed once (map-only, k·L dot products per
vector), stored partitioned by (table, bucket); a query reads L
buckets instead of the corpus. The candidate join shuffles on the
small (table, bucket) key.

Determinism/parity: hyperplanes come from a fixed seed and are
embedded as literal arrays in BOTH the Spark plan and the oracle SQL,
so even this sketching operator is fully oracle-checked.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan

N_TABLES = 4
N_TABLES_MAX = 16  # plane pool ceiling for the adaptive-L knob
N_PLANES = 4  # bits per table
DIM = 64
_rng = np.random.default_rng(42)
# round to 6 dp: decimal literals parse to identical doubles everywhere.
# The pool holds N_TABLES_MAX tables; generation is table-major off one
# seeded stream, so tables 0..3 are bit-identical to the 4-table pool
# every pre-round-8 plan/oracle embedded — extending the pool cannot
# move any existing bucket.
PLANES: list[list[list[float]]] = [
    [[round(float(x), 6) for x in _rng.standard_normal(DIM)] for _ in range(N_PLANES)]
    for _ in range(N_TABLES_MAX)
]


# Adaptive table count: recall of sign-LSH at a fixed cosine threshold
# decays with corpus size (more vectors -> more borderline pairs, each
# missed independently with prob (1-p^b) per table), so production LSH
# grows the table count L with log n. Rule: 4 tables at the 500-vector
# base, +2 per corpus doubling, capped at N_TABLES_MAX — integer
# thresholds only, so Spark (Python) and the DuckDB oracle (generated
# CASE ladder, same thresholds) can never disagree on L.
ADAPTIVE_BASE_N = 500


def adaptive_n_tables(n: int) -> int:
    """L(n) = min(16, 4 + 2*floor(log2(n/1000) + 1)) for n >= 1000,
    else 4 — expressed as an integer threshold ladder."""
    tables, bound = N_TABLES, ADAPTIVE_BASE_N * 2
    while n >= bound and tables < N_TABLES_MAX:
        tables += 2
        bound *= 2
    return tables


def _sql_adaptive_tables_case(cnt_expr: str) -> str:
    """The SAME L(n) rule as adaptive_n_tables, as a SQL CASE ladder
    over integer thresholds (shared-text idiom: generated once, both
    engines compare plain integers — no float log anywhere)."""
    arms = []
    tables, bound = N_TABLES, ADAPTIVE_BASE_N * 2
    while tables < N_TABLES_MAX:
        arms.append(f"WHEN {cnt_expr} < {bound} THEN {tables}")
        tables += 2
        bound *= 2
    return "CASE " + " ".join(arms) + f" ELSE {N_TABLES_MAX} END"


def _dot_lit(e: Column, plane: list[float]) -> Column:
    """Literal-plane dot product via zip_with + sequential fold.

    Deliberately NOT unrolled: the bucket projection evaluates
    16 planes × 64 dims per row, and unrolling all of them blows the
    generated method past Janino's 64 KB limit — codegen fails, the
    whole projection drops to interpreted mode, and the plan runs ~3×
    slower (measured). The lambda fold stays within codegen-friendly
    size; contrast _dot_unrolled in extended.py, which IS a win for a
    single dot per row. Fold order matches DuckDB list_sum."""
    arr = F.array(*[F.lit(v) for v in plane])
    return F.aggregate(
        F.zip_with(e, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def _bucket_expr(e: Column, table: int) -> Column:
    bits = [
        F.when(_dot_lit(e, PLANES[table][i]) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(N_PLANES)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


_PLANES_NP = np.array(PLANES, dtype=np.float64)  # (tables, planes, dim)


def _make_entries_kernel(n_tables: int):
    """Arrow kernel for the bucket projection — see bucket_entries."""

    def _entries_kernel(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            emb = np.array(pdf["e"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for t in range(n_tables):
                bits = np.zeros(n, dtype=np.int32)
                for p in range(N_PLANES):
                    acc = np.zeros(n, dtype=np.float64)
                    for d in range(DIM):
                        # sequential per-dim accumulation: the SAME
                        # operation order as the _dot_lit fold and DuckDB
                        # list_sum, so the signs (hence buckets) are
                        # bit-identical — never np.dot (blocked
                        # accumulation, different rounding)
                        acc += emb[:, d] * _PLANES_NP[t, p, d]
                    bits |= (acc >= 0).astype(np.int32) << p
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "tbl": np.full(n, t, dtype=np.int32),
                            "bucket": bits,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return _entries_kernel


def _make_probed_entries_kernel(n_tables: int):
    """Arrow kernel for the 1-probe bucket projection — see
    bucket_entries_probed. Per (vector, table): the exact bucket PLUS
    the bucket with the LOWEST-|margin| sign bit flipped (the
    query-directed probe of Lv et al., VLDB'07, at probe depth 1: the
    bit most likely to be on the wrong side of its hyperplane for a
    borderline pair is the one with the smallest |dot|). Dots use the
    same sequential per-dim accumulation as _entries_kernel, so exact
    buckets are bit-identical to the unprobed index; np.argmin keeps
    the FIRST minimum — the oracle's <=-ladder tie-break."""

    def _probed_kernel(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            emb = np.array(pdf["e"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for t in range(n_tables):
                bits = np.zeros(n, dtype=np.int32)
                margins = np.zeros((n, N_PLANES), dtype=np.float64)
                for p in range(N_PLANES):
                    acc = np.zeros(n, dtype=np.float64)
                    for d in range(DIM):
                        acc += emb[:, d] * _PLANES_NP[t, p, d]
                    bits |= (acc >= 0).astype(np.int32) << p
                    margins[:, p] = np.abs(acc)
                flip = bits ^ (1 << margins.argmin(axis=1)).astype(np.int32)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": np.concatenate([ids, ids]),
                            "tbl": np.full(2 * n, t, dtype=np.int32),
                            "bucket": np.concatenate([bits, flip]),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return _probed_kernel


def bucket_entries_probed(emb: DataFrame, n_tables: int = N_TABLES) -> DataFrame:
    """(vec_id, tbl, bucket) — bucket_entries plus ONE query-directed
    probe entry per (vector, table): the exact bucket with its
    lowest-|margin| sign bit flipped. Joining exact entries against
    this doubled index catches borderline pairs separated by a single
    near-zero hyperplane margin — measured at sf0.1 it lifts
    dedup_embedding_cosine's brute-force recall 13/14 → 14/14 at
    ~1.9× the candidate volume (vs ~2.3× for blanket Hamming-1
    probing of all 4 bits). Entry volume is exactly 2·L·n rows — the
    probe multiplies the slim index, never the vectors."""
    return emb.select("vec_id", "e").mapInPandas(
        _make_probed_entries_kernel(n_tables), "vec_id long, tbl int, bucket int"
    )


def bucket_entries(emb: DataFrame, n_tables: int = N_TABLES) -> DataFrame:
    """(vec_id, tbl, bucket) hash-table entries for every vector — the
    shared indexing step of sim_lsh_buckets / sim_lsh_topk /
    dedup_embedding_cosine (which passes its adaptive table count; the
    sim_* plans use the default N_TABLES pool prefix).

    Round 7: computed by an Arrow mapInPandas kernel instead of the
    _bucket_expr HOF fold. The 16 plane-dots per row ran as
    interpreted per-element lambdas (HOFs evaluate outside codegen)
    and dominated every LSH plan's wall time — measured 1.2 s → 0.5 s
    for the full sf0.1 projection, with bit-identical output (the
    kernel accumulates per-dim in the same order as the fold; a test
    pins equality against _bucket_expr). _bucket_expr stays as the
    expression-level spec and the oracle mirror."""
    return emb.select("vec_id", "e").mapInPandas(
        _make_entries_kernel(n_tables), "vec_id long, tbl int, bucket int"
    )


def _sql_plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in plane) + "]"


def _sql_bucket_expr(col: str, table: int) -> str:
    terms = []
    for i, p in enumerate(PLANES[table]):
        dot = (
            f"list_sum(list_transform({col}, (x, i) -> "
            f"CAST(x AS DOUBLE) * ({_sql_plane_literal(p)})[i]))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


def _sql_tables_union(col: str, n_tables: int = N_TABLES) -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sql_bucket_expr(col, t)} AS bucket FROM embeddings"
        for t in range(n_tables)
    )


def _sql_probed_tables_union(col: str, n_tables: int = N_TABLES) -> str:
    """Oracle twin of bucket_entries_probed: per (vector, table) the
    exact bucket plus the lowest-|margin| flip. The flip-bit CASE is a
    <=-ladder (d0 wins ties over d1 over d2 over d3) — exactly
    np.argmin's first-minimum on bit-identical doubles."""

    # the flip CASE ladder below is written for exactly 4 bits; a
    # plane-count change must extend it or this assert fires at import
    assert N_PLANES == 4, N_PLANES

    def one_table(t: int) -> str:
        dots = ", ".join(
            f"list_sum(list_transform({col}, (x, i) -> "
            f"CAST(x AS DOUBLE) * ({_sql_plane_literal(p)})[i])) AS d{i}"
            for i, p in enumerate(PLANES[t])
        )
        bkt = " + ".join(
            f"(CASE WHEN d{i} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(N_PLANES)
        )
        flip = (
            "CASE"
            " WHEN abs(d0) <= abs(d1) AND abs(d0) <= abs(d2)"
            " AND abs(d0) <= abs(d3) THEN 1"
            " WHEN abs(d1) <= abs(d2) AND abs(d1) <= abs(d3) THEN 2"
            " WHEN abs(d2) <= abs(d3) THEN 4"
            " ELSE 8 END"
        )
        return (
            f"SELECT vec_id, {t} AS tbl,"
            f" unnest([bkt, xor(bkt, fb)]) AS bucket FROM ("
            f"SELECT vec_id, {bkt} AS bkt, {flip} AS fb FROM ("
            f"SELECT vec_id, {dots} FROM embeddings))"
        )

    return " UNION ALL ".join(one_table(t) for t in range(n_tables))


LSH_BUCKETS_SQL = f"""
SELECT tbl, bucket, COUNT(*) AS n_vectors
FROM ({_sql_tables_union("embedding")})
GROUP BY tbl, bucket
ORDER BY tbl, bucket
"""


@plan("sim_lsh_buckets", oracle=LSH_BUCKETS_SQL)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket occupancy per hash table — the indexing half of LSH-ANN,
    and the skew diagnostic you'd watch in production (a hot bucket
    means add planes or re-seed)."""
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir)
    return (
        bucket_entries(emb)
        .groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("tbl", "bucket")
    )


LSH_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v
),
h AS ({_sql_tables_union("embedding")}),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
  FROM h a JOIN h b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
),
pairs AS (
  SELECT cand.query_id, cand.cand_id,
         list_sum(list_transform(q.e, (x, i) -> x * c.e[i])) / (q.nrm * c.nrm)
           AS cos_full
  FROM cand
  JOIN n q ON cand.query_id = q.vec_id
  JOIN n c ON cand.cand_id = c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cos_full,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_full DESC, cand_id) AS rn
  FROM pairs
)
SELECT query_id, cand_id, CAST(FLOOR(CAST((cos_full) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS cosine, rn AS rank
FROM ranked WHERE rn <= 5
ORDER BY query_id, rank
"""


@plan("sim_lsh_topk", oracle=LSH_TOPK_SQL)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors: candidates from any shared bucket
    across the L hash tables, exact cosine re-rank of candidates only.
    Recall vs the exact baseline is asserted in tests/test_ann.py.

    Scale shape: (table, bucket) equi-join for candidates, then two
    hash joins to fetch vectors — never a cross join.
    """
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))

    # h feeds BOTH candidate-join legs; unckeckpointed, the Arrow
    # bucket kernel executes once per leg. Lazy localCheckpoint makes
    # both legs reference one RDD materialized inside the consuming
    # job (r15; measured 2.24 -> 1.53 s min-of-3 at sf0.1 — eager was
    # 1.58, the separate barrier job costs ~50 ms).
    h = bucket_entries(emb).localCheckpoint(eager=False)
    a = h.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    b = h.select(F.col("vec_id").alias("cand_id"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    q = n.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn"))
    c = n.select(F.col("vec_id").alias("cand_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn"))
    cos = _dot_unrolled(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    pairs = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", cos.alias("cos_full"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_full"), "cand_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "cand_id",
            quantize6("cos_full").alias("cosine"),
            F.col("rn").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# sim_multiprobe_topk — multi-probe LSH (round 8)
# ---------------------------------------------------------------------------

_PROBE_FLIPS = [0] + [1 << i for i in range(N_PLANES)]  # exact + 4 1-bit flips

MULTIPROBE_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v
),
h AS ({_sql_tables_union("embedding")}),
probes AS (
  SELECT vec_id, tbl,
         unnest([{", ".join(f"xor(bucket, {f})" for f in _PROBE_FLIPS)}])
           AS probe
  FROM h
  WHERE vec_id < 10
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS cand_id
  FROM probes p JOIN h b ON p.tbl = b.tbl AND p.probe = b.bucket
  WHERE b.vec_id <> p.vec_id
),
pairs AS (
  SELECT cand.query_id, cand.cand_id,
         CAST(FLOOR(CAST((list_sum(list_transform(q.e, (x, i) -> x * c.e[i]))
           / (q.nrm * c.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           / 1000000.0 AS cosine
  FROM cand
  JOIN n q ON cand.query_id = q.vec_id
  JOIN n c ON cand.cand_id = c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id) AS rn
  FROM pairs
)
SELECT query_id, cand_id, cosine, rn AS rank
FROM ranked WHERE rn <= 5
ORDER BY query_id, rank
"""


@plan("sim_multiprobe_topk", oracle=MULTIPROBE_SQL)
def sim_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-5 (round 8): the PROBE-side recall knob,
    complementing dedup_embedding_cosine's adaptive table count.
    Each query probes its exact bucket PLUS every bucket at Hamming
    distance 1 (5 probes per table at 4 bits), so a borderline
    neighbor that landed one sign-flip away is still a candidate —
    per-table collision for a cosine-0.5 pair rises from ~0.20 to
    ~0.59, i.e. multi-probe buys the recall of ~3x the tables for
    ~5x probe rows on the QUERY side only (the classic multi-probe
    trade: probes are cheap, tables cost index memory — Lv et al.,
    VLDB'07). Recall vs the exact baseline and the superset property
    over single-probe sim_lsh_topk are pinned in tests/test_ann.py.

    Scale shape: the probe explosion multiplies only the ≤10-query
    entry rows (bounded); candidates remain a (tbl, bucket) equi-join
    against the corpus entries — never a cross join — followed by the
    same two hash joins to fetch vectors. Ranking compares the
    QUANTIZED cosine (the emitted value), per the r7 advice on LIMIT
    boundaries."""
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))

    # shared-kernel checkpoint, same rationale/measurement as
    # sim_lsh_topk above (h feeds the probe leg AND the corpus leg)
    h = bucket_entries(emb).localCheckpoint(eager=False)
    probes = (
        h.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            "tbl",
            F.explode(
                F.array(
                    *[F.expr(f"bucket ^ {f}").alias("p") for f in _PROBE_FLIPS]
                )
            ).alias("probe"),
        )
    )
    b = h.select(F.col("vec_id").alias("cand_id"), "tbl", F.col("bucket").alias("probe"))
    cand = (
        probes.join(b, ["tbl", "probe"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    q = n.select(
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
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", quantize6(cos).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "cand_id", "cosine", F.col("rn").alias("rank"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# sim_recall_report — measured ANN recall@k vs the exact baseline (round 8)
# ---------------------------------------------------------------------------

RECALL_K = 5

RECALL_REPORT_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v
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
  ) WHERE rn <= {RECALL_K}
),
h AS ({{tables_union}}),
probes AS (
  SELECT vec_id, tbl,
         unnest([{{flips}}]) AS probe
  FROM h
  WHERE vec_id < 10
),
mp_cand AS (
  SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS cand_id
  FROM probes p JOIN h b ON p.tbl = b.tbl AND p.probe = b.bucket
  WHERE b.vec_id <> p.vec_id
),
sp_cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
  FROM h a JOIN h b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
),
scored AS (
  SELECT m.query_id, m.cand_id,
         s.query_id IS NOT NULL AS in_single,
         CAST(FLOOR(CAST((list_sum(list_transform(q.e, (x, i) -> x * c.e[i]))
           / (q.nrm * c.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           / 1000000.0 AS cosine
  FROM mp_cand m
  LEFT JOIN sp_cand s ON m.query_id = s.query_id AND m.cand_id = s.cand_id
  JOIN n q ON m.query_id = q.vec_id
  JOIN n c ON m.cand_id = c.vec_id
),
m5 AS (
  SELECT 'lsh_multiprobe' AS method, query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS rn
    FROM scored
  ) WHERE rn <= {RECALL_K}
  UNION ALL
  SELECT 'lsh_single', query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS rn
    FROM scored WHERE in_single
  ) WHERE rn <= {RECALL_K}
),
ncand AS (
  SELECT 'lsh_multiprobe' AS method, query_id,
         CAST(COUNT(*) AS BIGINT) AS n_candidates
  FROM mp_cand GROUP BY query_id
  UNION ALL
  SELECT 'lsh_single', query_id, CAST(COUNT(*) AS BIGINT)
  FROM sp_cand GROUP BY query_id
),
hits AS (
  SELECT m5.method, m5.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM m5 JOIN ex5 ON m5.query_id = ex5.query_id AND m5.cand_id = ex5.cand_id
  GROUP BY m5.method, m5.query_id
),
grid AS (
  SELECT method, query_id
  FROM (SELECT DISTINCT query_id FROM ex5),
       (SELECT 'lsh_single' AS method UNION ALL SELECT 'lsh_multiprobe')
)
SELECT g.method AS method, g.query_id AS query_id,
       CAST(COALESCE(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(ht.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(FLOOR(CAST((1.0 * COALESCE(ht.n_hits, 0) / {RECALL_K}) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS recall_at_k
FROM grid g
LEFT JOIN ncand nc ON g.method = nc.method AND g.query_id = nc.query_id
LEFT JOIN hits ht ON g.method = ht.method AND g.query_id = ht.query_id
ORDER BY g.method, g.query_id
"""


def _recall_report_sql() -> str:
    return RECALL_REPORT_SQL.format(
        tables_union=_sql_tables_union("embedding"),
        flips=", ".join(f"xor(bucket, {f})" for f in _PROBE_FLIPS),
    )


@plan("sim_recall_report", oracle=_recall_report_sql())
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ANN quality as a first-class table: per query, the
    candidate-set size and recall@{RECALL_K} of single-probe and
    multi-probe LSH against the exact brute-force top-{RECALL_K} —
    the number an ANN deployment watches when tuning tables/probes
    (tests pin recall floors; THIS is the production dashboard the
    pins sample). Single-probe rows also quantify the probe knob's
    candidate-cost: n_candidates(multiprobe) / n_candidates(single)
    is the price of the recall lift.

    Shape: ONE scoring pass — multi-probe candidates are a superset
    of single-probe (flip 0 is the exact bucket), so single-probe
    rows are the `in_single`-flagged subset re-ranked, not a second
    cosine pass. The exact baseline is the documented ≤10-query
    broadcast sweep (same as sim_cosine_topk). The LSH entry table
    `h` feeds four references (query/corpus × single/probe), so it is
    eagerly localCheckpointed — 3-int rows, O(n·L), cheap to
    materialize and it stops the Arrow bucket kernel re-running per
    reference (the r7 measure-first rule: here 4 kernel runs vs one
    tiny materialization). Every rank compares the QUANTIZED cosine
    (r7 advice on LIMIT boundaries).

    Round 9 (shared-leg rework, verdict r8 #4): the CORPUS-SIZED
    exact sweep materializes once into the tiny ex5 baseline (two
    consumers: hits, grid), the scored frame materializes once and
    feeds both top-k windows AND both candidate counts (ncand reads
    scored — 1:1 with mp_cand, `in_single` flags the sp subset — so
    each candidate join has exactly one consumer). Final executed
    plan drops 18 exchanges / 12 joins (8 already ReusedExchange) to
    7 / 4. Measured trade at sf0.1: +0.5 s fixed barrier cost
    (3.0 → 3.5 s isolated) — at local toy scale the duplicated small
    stages ran in parallel for free; at 100 TB re-running the corpus
    sweep per consumer is the term that matters, and the barriers
    amortize to noise.
    """
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)
    n = emb.withColumn("nrm", F.sqrt(_dot_unrolled(F.col("e"), F.col("e"))))
    q = n.select(
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
        F.broadcast(q.filter(F.col("query_id") < 10))
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", quantize6(cos).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    # ex5 feeds BOTH the hit join and the output grid: materialize the
    # ≤(10·K)-row baseline once instead of re-running the corpus sweep
    # per consumer (round-9 shared-leg rework, verdict r8 #4)
    ex5 = (
        ex_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RECALL_K)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=True)
    )

    h = bucket_entries(emb).localCheckpoint(eager=True)
    qh = h.filter(F.col("vec_id") < 10)
    probes = qh.select(
        F.col("vec_id").alias("query_id"),
        "tbl",
        F.explode(
            F.array(*[F.expr(f"bucket ^ {f}") for f in _PROBE_FLIPS])
        ).alias("probe"),
    )
    corpus_sp = h.select(F.col("vec_id").alias("cand_id"), "tbl", "bucket")
    corpus_mp = h.select(
        F.col("vec_id").alias("cand_id"), "tbl", F.col("bucket").alias("probe")
    )
    # each candidate set feeds TWO consumers (the scored pass and its
    # ncand count); the scored frame feeds TWO top-k windows. Without
    # materialization Spark re-executes every upstream subtree per
    # consumer — this plan's PLANS_AUDIT row was 38 shuffles / 10
    # joins of mostly repeated work. The legs are tiny (≤10 queries ×
    # bucket-mates), so three eager localCheckpoints make every
    # exchange execute once (round-9 shared-leg rework).
    sp_cand = (
        qh.select(F.col("vec_id").alias("query_id"), "tbl", "bucket")
        .join(corpus_sp, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    mp_cand = (
        probes.join(corpus_mp, ["tbl", "probe"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    scored = (
        mp_cand.join(
            sp_cand.withColumn("in_single", F.lit(True)),
            ["query_id", "cand_id"],
            "left",
        )
        .withColumn("in_single", F.coalesce("in_single", F.lit(False)))
        .join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", "in_single", quantize6(cos).alias("cosine"))
        .localCheckpoint(eager=True)
    )
    # r15: BOTH method top-ks come out of ONE window pass. The two
    # methods rank the same checkpointed frame under the same total
    # order (cosine desc, cand_id — cand_id unique per query, so no
    # ties); the single-probe rank is the RUNNING COUNT of in_single
    # rows under that order, which for an in_single row equals its
    # row_number over the filtered subset exactly. The old shape ran
    # two separate windows (two exchanges + sorts over `scored`) and
    # unioned; this emits (method) via an array filter + explode in
    # the same projection — one exchange, one sort, identical rows.
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m5 = (
        scored.withColumn("rn_mp", F.row_number().over(w))
        .withColumn(
            "rn_sp",
            F.sum(F.when(F.col("in_single"), 1).otherwise(0)).over(wrun),
        )
        .select(
            "query_id",
            "cand_id",
            F.explode(
                F.concat(
                    F.when(
                        F.col("rn_mp") <= RECALL_K,
                        F.array(F.lit("lsh_multiprobe")),
                    ).otherwise(F.array().cast("array<string>")),
                    F.when(
                        F.col("in_single") & (F.col("rn_sp") <= RECALL_K),
                        F.array(F.lit("lsh_single")),
                    ).otherwise(F.array().cast("array<string>")),
                )
            ).alias("method"),
        )
        .select("method", "query_id", "cand_id")
    )
    # candidate counts come off the CACHED scored frame — it is 1:1
    # with mp_cand and `in_single` marks exactly the sp_cand subset, so
    # the candidate-generation joins keep a single consumer each and
    # never re-execute (round-9 shared-leg rework). r15: one grouped
    # pass computes both methods' counts (count(*) = multiprobe,
    # count_if(in_single) = single) and unpivots via explode — the
    # old union of two aggregations exchanged `scored` twice.
    ncand = (
        scored.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_mp"),
            F.sum(F.when(F.col("in_single"), 1).otherwise(0))
            .cast("long")
            .alias("n_sp"),
        )
        .select(
            "query_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lsh_multiprobe").alias("method"),
                        F.col("n_mp").alias("n_candidates"),
                    ),
                    F.struct(
                        F.lit("lsh_single").alias("method"),
                        F.col("n_sp").alias("n_candidates"),
                    ),
                )
            ).alias("mc"),
        )
        .select("mc.method", "query_id", "mc.n_candidates")
    )
    hits = (
        m5.join(ex5, ["query_id", "cand_id"])
        .groupBy("method", "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    grid = (
        ex5.select("query_id")
        .distinct()
        .crossJoin(
            F.broadcast(
                local_df(
                    spark, [("lsh_single",), ("lsh_multiprobe",)], "method string"
                )
            )
        )
    )
    return (
        grid.join(ncand, ["method", "query_id"], "left")
        .join(hits, ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            quantize6(
                F.coalesce("n_hits", F.lit(0)).cast("double") / RECALL_K
            ).alias("recall_at_k"),
        )
        .orderBy("method", "query_id")
    )
