"""Product quantization (PQ): compressed-domain similarity search.

The third ANN family next to random-hyperplane LSH (plans/ann.py) and
IVF cells (plans/ivf.py), and the missing memory axis: LSH/IVF prune
CANDIDATES, PQ compresses STORAGE — each 64-dim float vector becomes
M=16 one-byte codes (16× smaller), and queries score the compressed
codes directly via per-subspace lookup tables (asymmetric distance
computation, ADC — Jégou et al., PAMI 2011).

At 100 TB: the code table (M bytes + id per vector) is what a
compressed-domain scan reads — the float vectors stay in cold
storage and are touched only to re-rank a final shortlist. Real
deployments train codebooks per subspace with k-means; here they are
fixed seeded Gaussians scaled to the data's std (0.12), which keeps
the operator deterministic and lets the SAME literal codebooks be
embedded in the DuckDB oracle — the PQ path is value-hash-checked
like everything else (recall vs exact is asserted separately in
tests/test_ann.py; trained codebooks raise recall, they don't change
the plan shape). Composing with IVF (IVF-PQ) is a filter on the cell
column before the ADC scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6, sql_quantize6
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan

DIM = 64
M = 16  # subspaces
SUB = DIM // M  # dims per subspace
K = 16  # codebook entries per subspace
_rng = np.random.default_rng(11)
# scaled to the embedding distribution's std (~0.125) so assignments
# spread over all K entries (unit-scale Gaussians would collapse onto
# the few smallest-norm entries)
CODEBOOKS: list[list[list[float]]] = [
    [[round(float(x) * 0.12, 6) for x in _rng.standard_normal(SUB)] for _ in range(K)]
    for _ in range(M)
]

_CODE_COLS = [f"code{m}" for m in range(M)]


def _assign_codes(
    emb: DataFrame,
    codebooks: list | None = None,
    long_form: bool = False,
) -> DataFrame:
    """(vec_id, code0..code{M-1}) — nearest codebook entry per
    subspace, computed MAP-SIDE in an Arrow-batched numpy kernel (the
    same sequential-over-dims accumulation as ivf._assign_cells, so
    the argmin ties out bit-for-bit with the oracle's ROW_NUMBER over
    list_sum distances; np.argmin keeps the FIRST minimum — the
    oracle's `dist ASC, k` tie-break). One pass over the corpus, no
    shuffle: this IS the index build.

    ``codebooks`` overrides the seeded CODEBOOKS (the Lloyd trainer
    walks updated codebooks through repeated assignments);
    ``long_form=True`` yields (vec_id, m, code) rows instead of the
    wide code0..code{M-1} layout (the trainer's update join wants the
    subspace as a key, the ADC scan wants the wide row)."""
    import pandas as pd  # noqa: PLC0415

    src = CODEBOOKS if codebooks is None else codebooks
    cbs = [np.asarray(src[m], dtype=np.float64) for m in range(M)]

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            n = len(x)
            out = {"vec_id": pdf["vec_id"]}
            vids, ms, codes = [], [], []
            for m in range(M):
                xs = x[:, m * SUB : (m + 1) * SUB]
                # sequential over dims (parity with list_sum's left
                # fold), vectorized over (rows × K) — not a k-loop of
                # tiny per-row ops: same FP ops in the same d-order,
                # bit-identical argmin, ~16× fewer numpy dispatches
                dists = np.zeros((len(xs), K))
                for d in range(SUB):
                    diff = xs[:, d][:, None] - cbs[m][None, :, d]
                    dists = dists + diff * diff
                code = dists.argmin(axis=1).astype("int32")
                if long_form:
                    vids.append(pdf["vec_id"].to_numpy())
                    ms.append(np.full(n, m, dtype="int32"))
                    codes.append(code)
                else:
                    out[f"code{m}"] = code
            if long_form:
                yield pd.DataFrame(
                    {
                        "vec_id": np.concatenate(vids),
                        "m": np.concatenate(ms),
                        "code": np.concatenate(codes),
                    }
                )
            else:
                yield pd.DataFrame(out)

    if long_form:
        schema = "vec_id long, m int, code int"
    else:
        schema = "vec_id long, " + ", ".join(f"{c} int" for c in _CODE_COLS)
    return emb.select("vec_id", "e").mapInPandas(assign, schema=schema)


def _code_partials(emb: DataFrame, codebooks: list) -> DataFrame:
    """(m, code, spos, s, c) — per-(subspace, entry, dim) PARTIAL
    micro-unit sums and member counts for the PQ Lloyd update,
    computed in the same batch that assigns codes (identical distance
    scoring and FIRST-min tie-break as ``_assign_codes``). Each Arrow
    batch emits at most M×K×SUB rows regardless of corpus size —
    guide §2.3's aggregate-before-shuffle: the alternative (long-form
    code join against a posexploded coordinate table) shuffles
    O(corpus × DIM) rows per iteration.

    Exactness: s sums floor(x·1e6 + 0.5) per coordinate (np.floor ≡
    the engine's FLOOR on the same doubles) as int64 — order-free
    integer partials, so the downstream mean is bit-identical."""
    import pandas as pd  # noqa: PLC0415

    cbs = [np.asarray(codebooks[m], dtype=np.float64) for m in range(M)]

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            out_m, out_code, out_pos, out_s, out_c = [], [], [], [], []
            for m in range(M):
                xs = x[:, m * SUB : (m + 1) * SUB]
                # sequential over dims — see _assign_codes
                dists = np.zeros((len(xs), K))
                for d in range(SUB):
                    diff = xs[:, d][:, None] - cbs[m][None, :, d]
                    dists = dists + diff * diff
                code = dists.argmin(axis=1)  # FIRST min == oracle tie
                xm = np.floor(xs * 1e6 + 0.5).astype(np.int64)
                for k in np.unique(code):
                    mask = code == k
                    sums = xm[mask].sum(axis=0)  # exact int64 per dim
                    cnt = int(mask.sum())
                    out_m.extend([m] * SUB)
                    out_code.extend([int(k)] * SUB)
                    out_pos.extend(range(1, SUB + 1))
                    out_s.extend(int(v) for v in sums)
                    out_c.extend([cnt] * SUB)
            yield pd.DataFrame(
                {
                    "m": pd.array(out_m, dtype="int32"),
                    "code": pd.array(out_code, dtype="int32"),
                    "spos": pd.array(out_pos, dtype="int32"),
                    "s": pd.array(out_s, dtype="int64"),
                    "c": pd.array(out_c, dtype="int64"),
                }
            )

    return emb.select("e").mapInPandas(
        partials, schema="m int, code int, spos int, s long, c long"
    )


def _assign_index(emb: DataFrame) -> DataFrame:
    """(vec_id, cell, code0..code{M-1}) — the FUSED IVF-PQ index build:
    coarse-cell assignment and all M subspace codes computed in ONE
    Arrow pass over the corpus (this is how a real IVF-PQ build works —
    FAISS emits the inverted list id and the code word together).
    Versus composing ``ivf._assign_cells`` + ``_assign_codes``, this
    halves the corpus→Python Arrow transfers and removes one corpus-
    sized join downstream. Same sequential-accumulation arithmetic, so
    cell/code values are bit-identical to the unfused kernels and the
    oracle."""
    import pandas as pd  # noqa: PLC0415

    from compendium_spark.plans.ivf import CENTROIDS, N_CELLS  # noqa: PLC0415

    centroids = np.asarray(CENTROIDS, dtype=np.float64)
    cbs = [np.asarray(CODEBOOKS[m], dtype=np.float64) for m in range(M)]

    def assign(batches):
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
            out = {
                "vec_id": pdf["vec_id"],
                "cell": scores.argmax(axis=1).astype("int32"),
            }
            for m in range(M):
                xs = x[:, m * SUB : (m + 1) * SUB]
                dists = np.zeros((len(xs), K))
                for d in range(SUB):
                    diff = xs[:, d][:, None] - cbs[m][None, :, d]
                    dists = dists + diff * diff
                out[f"code{m}"] = dists.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    schema = "vec_id long, cell int, " + ", ".join(f"{c} int" for c in _CODE_COLS)
    return emb.select("vec_id", "e").mapInPandas(assign, schema=schema)


def _sql_vec_lit(c: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + "]"


def _sql_codebook(m: int) -> str:
    return " UNION ALL ".join(
        f"SELECT {k} AS k, {_sql_vec_lit(CODEBOOKS[m][k])} AS cvec"
        for k in range(K)
    )


def _sql_assign(m: int) -> str:
    lo = m * SUB + 1
    return f"""
  SELECT vec_id, k AS code{m} FROM (
    SELECT v.vec_id, c.k,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
             list_sum(list_transform(list_slice(v.e, {lo}, {lo + SUB - 1}),
                      (x, i) -> (x - c.cvec[i]) * (x - c.cvec[i]))) ASC,
             c.k) AS rn
    FROM v CROSS JOIN cb{m} c
  ) WHERE rn = 1
"""


_SQL_PQ_BASE = (
    "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
    " AS e FROM embeddings),\n"
    + ",\n".join(f"cb{m} AS ({_sql_codebook(m)})" for m in range(M))
    + ",\n"
    + ",\n".join(f"a{m} AS ({_sql_assign(m)})" for m in range(M))
    + ",\ncodes AS (SELECT a0.vec_id, "
    + ", ".join(_CODE_COLS)
    + " FROM a0 "
    + " ".join(f"JOIN a{m} USING (vec_id)" for m in range(1, M))
    + ")"
)

PQ_CODES_SQL = f"""
WITH {_SQL_PQ_BASE}
SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM (
  {" UNION ALL ".join(f"SELECT {m} AS subspace, code{m} AS code FROM codes" for m in range(M))}
)
GROUP BY subspace, code
ORDER BY subspace, code
"""


@plan("sim_pq_codes", oracle=PQ_CODES_SQL)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code-occupancy histogram — the index-build half plus the
    codebook-health diagnostic (an empty or dominant entry means the
    codebook needs retraining on the data's distribution)."""
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415

    codes = _assign_codes(_load_embeddings(spark, sf_dir))
    return (
        codes.select(
            "vec_id",
            F.posexplode(F.array(*_CODE_COLS)).alias("subspace", "code"),
        )
        .groupBy("subspace", "code")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("subspace", "code")
    )


def _query_luts(queries: DataFrame) -> DataFrame:
    """(query_id, lut0..lut{M-1}) — each lut an array of the K dot
    products of the query's subvector with every codebook entry,
    computed ONCE per query row; each candidate then costs M array
    lookups + M-1 adds. Arrow numpy kernel with sequential-over-dims
    accumulation — bit-identical to a left-fold dot (and DuckDB's
    list_sum), and ~10 s cheaper than the equivalent M×K
    F.aggregate projection, whose 256 py4j-built fold expressions
    cost ~5 s of DRIVER time per plan call before a single row
    moves."""
    import pandas as pd  # noqa: PLC0415

    cbs = [np.asarray(CODEBOOKS[m], dtype=np.float64) for m in range(M)]

    def build(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["qe"].to_numpy()).astype(np.float64)
            out = {"query_id": pdf["query_id"]}
            for m in range(M):
                luts = np.zeros((len(x), K))
                for d in range(SUB):
                    luts = luts + x[:, m * SUB + d][:, None] * cbs[m][None, :, d]
                out[f"lut{m}"] = list(luts)
            yield pd.DataFrame(out)

    schema = "query_id long, " + ", ".join(
        f"lut{m} array<double>" for m in range(M)
    )
    return queries.select("query_id", "qe").mapInPandas(build, schema=schema)


_SQL_ADC_TERMS = "\n         + ".join(
    f"list_sum(list_transform(b{m}.cvec, (y, i) -> y * q.e[{m * SUB} + i]))"
    for m in range(M)
)
_SQL_ADC_JOINS = "\n  ".join(
    f"JOIN cb{m} b{m} ON b{m}.k = c.code{m}" for m in range(M)
)

PQ_ADC_SQL = f"""
WITH {_SQL_PQ_BASE},
q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < 10),
adc AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         {_SQL_ADC_TERMS}
           AS adc
  FROM codes c
  CROSS JOIN q
  {_SQL_ADC_JOINS}
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, cand_id, CAST(FLOOR(CAST((adc) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS adc_score, rn AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc DESC, cand_id) AS rn
  FROM adc
)
WHERE rn <= 5
ORDER BY query_id, rank
"""


@plan("sim_pq_adc_topk", oracle=PQ_ADC_SQL)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5: each query builds its M×{K}
    lookup table once, then every corpus vector is scored from its M
    codes alone — element_at + adds per candidate, pure codegen over
    the compressed code table; the float corpus is never read in the
    scoring scan.

    Plan shape: the ≤10-query LUT side broadcasts over the code table
    (keyless by design — this IS the compressed-domain linear scan;
    at 100 TB it reads M bytes + id per vector instead of 256 bytes,
    and composing with IVF cells prunes it to nprobe/K of the data).
    Recall vs the exact dot-product ranking is asserted in
    tests/test_ann.py.
    """
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir)
    codes = _assign_codes(emb)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    luts = _query_luts(queries)
    adc = F.element_at(F.col("lut0"), F.col("code0") + 1)
    for m in range(1, M):
        adc = adc + F.element_at(F.col(f"lut{m}"), F.col(f"code{m}") + 1)
    pairs = (
        codes.join(F.broadcast(luts))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), adc.alias("adc")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "cand_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "cand_id",
            quantize6("adc").alias("adc_score"),
            F.col("rn").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def _ivfpq_sql() -> str:
    from compendium_spark.plans.ivf import _SQL_SCORES, N_PROBE

    return f"""
WITH {_SQL_PQ_BASE},
scores AS ({_SQL_SCORES}),
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
cand AS (
  SELECT p.query_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
),
q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < 10),
adc AS (
  SELECT cand.query_id, cand.cand_id,
         {_SQL_ADC_TERMS}
           AS adc
  FROM cand
  JOIN codes c ON c.vec_id = cand.cand_id
  JOIN q ON q.query_id = cand.query_id
  {_SQL_ADC_JOINS}
)
SELECT query_id, cand_id, CAST(FLOOR(CAST((adc) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS adc_score, rn AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc DESC, cand_id) AS rn
  FROM adc
)
WHERE rn <= 5
ORDER BY query_id, rank
"""


@plan("sim_ivfpq_topk", oracle=_ivfpq_sql())
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the full production ANN composition — IVF probes prune
    the corpus to nprobe/{K} of its cells, then ADC scores the
    survivors from their codes alone. Neither stage reads the float
    corpus after index build: candidates come from the (cell)
    equi-join of the probe list against the inverted file, scoring
    joins the compressed code table by id with broadcast query LUTs —
    every join keyed, no all-pairs anywhere, which is what makes this
    (unlike the two labeled exact baselines) the shape that survives
    100 TB.
    """
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415
    from compendium_spark.plans.ivf import N_PROBE, _probe_cells  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir)
    # FUSED index build: one Arrow pass emits (cell, code0..codeM-1)
    # per vector, and the probe join therefore delivers candidates
    # WITH their codes — no second corpus pass, no corpus-sized
    # cand ⋈ codes join (the unfused composition had both)
    index = _assign_index(emb)
    # probe ranking in the shared Arrow kernel (see ivf._probe_cells):
    # the fold-dot + window subtree it replaces cost ~1 s of codegen
    probes = _probe_cells(emb.filter(F.col("vec_id") < 10), N_PROBE)
    cand = (
        probes.join(index, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), *_CODE_COLS)
    )
    luts = _query_luts(
        emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        )
    )
    adc = F.element_at(F.col("lut0"), F.col("code0") + 1)
    for m in range(1, M):
        adc = adc + F.element_at(F.col(f"lut{m}"), F.col(f"code{m}") + 1)
    scored = cand.join(F.broadcast(luts), "query_id").select(
        "query_id", "cand_id", adc.alias("adc")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("adc"), "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "cand_id",
            quantize6("adc").alias("adc_score"),
            F.col("rn").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# train_pq_codebooks — Lloyd training of the PQ codebooks
# ---------------------------------------------------------------------------

# The train step of product quantization (FAISS `train()`): the
# sim_pq_* family quantizes against FIXED seeded codebooks; this plan
# RUNS the per-subspace k-means those deployments train with — two
# Lloyd iterations over all M subspaces jointly, from the seeded
# codebooks as init, returning the trained codebooks. Completes the
# index-build story the same way train_quality_logreg completes the
# classifier story. Parity is cluster_kmeans' rounded-state
# discipline: per-(subspace, entry, dim) means are computed as EXACT
# micro-unit integer sums divided once (no unordered float sum — the
# ts_seasonal_decompose lesson), FLOOR-quantized before entering the
# next assignment, and assignment argmins use the same sequential
# accumulation as _assign_codes, so both engines walk identical
# codebooks through both iterations.
PQ_TRAIN_ITERS = 2

_q = sql_quantize6

# the integer-exact centroid mean: each coordinate is snapped to the
# 1e-6 grid (exact BIGINT), summed exactly, divided ONCE — partition
# order cannot move the result (AVG over raw doubles can: the
# round-8 seasonal-decompose boundary-flip class)
_PQ_MEAN = (
    "SUM(CAST(FLOOR(ex.x * 1000000.0 + 0.5) AS BIGINT))"
    " / (COUNT(*) * 1000000.0)"
)


def _pq_train_sql() -> str:
    cb0 = " UNION ALL ".join(
        f"SELECT {m} AS m, {k} AS k, {_sql_vec_lit(CODEBOOKS[m][k])} AS cvec"
        for m in range(M)
        for k in range(K)
    )

    def assign(c: int, prev_cb: str) -> str:
        return f"""
a{c} AS MATERIALIZED (
  SELECT vec_id, m, k AS code FROM (
    SELECT sv.vec_id, sv.m, c.k,
           ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
             list_sum(list_transform(sv.s,
                      (x, i) -> (x - c.cvec[i]) * (x - c.cvec[i]))) ASC,
             c.k) AS rn
    FROM sv JOIN {prev_cb} c ON sv.m = c.m
  ) WHERE rn = 1
)"""

    def update(c: int, prev_cb: str) -> str:
        return f"""
mu{c} AS MATERIALIZED (
  SELECT a.m, a.code AS k, ex.spos,
         {_q(_PQ_MEAN)} AS v
  FROM (
    SELECT vec_id, m, unnest(s) AS x,
           unnest(range(1, {SUB} + 1)) AS spos
    FROM sv
  ) ex
  JOIN a{c} a ON ex.vec_id = a.vec_id AND ex.m = a.m
  GROUP BY a.m, a.code, ex.spos
),
cb{c} AS MATERIALIZED (
  SELECT p.m, p.k,
         list_transform(range(1, {SUB} + 1),
                        i -> COALESCE(mu.mlist[i], p.cvec[i])) AS cvec
  FROM {prev_cb} p LEFT JOIN (
    SELECT m, k, list(v ORDER BY spos) AS mlist FROM mu{c} GROUP BY m, k
  ) mu ON p.m = mu.m AND p.k = mu.k
)"""

    iters = []
    prev = "cb0"
    for c in range(1, PQ_TRAIN_ITERS + 1):
        iters.append("," + assign(c, prev) + "," + update(c, prev))
        prev = f"cb{c}"
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
sv AS MATERIALIZED (
  SELECT vec_id, m, list_slice(e, m * {SUB} + 1, m * {SUB} + {SUB}) AS s
  FROM v, (SELECT unnest(range({M})) AS m)
),
cb0 AS MATERIALIZED ({cb0}){"".join(iters)}
SELECT CAST(c.m AS INT) AS m, CAST(c.k AS INT) AS k,
       CAST(p.pos AS INT) AS pos,
       {_q("c.cvec[p.pos]")} AS value
FROM {prev} c, (SELECT unnest(range(1, {SUB} + 1)) AS pos) p
ORDER BY m, k, pos
"""


@plan("train_pq_codebooks", oracle=_pq_train_sql())
def train_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd training of the PQ codebooks: PQ_TRAIN_ITERS k-means
    iterations per subspace (all M subspaces trained in one pass per
    iteration), initialized from the seeded codebooks sim_pq_*
    quantizes against — FAISS's `ProductQuantizer::train`, expressed
    Spark-first. Returns the trained codebooks as (m, k, pos, value)
    rows.

    Scale: each iteration is ONE Arrow pass over the corpus — the
    ``_code_partials`` kernel scores/assigns exactly like the audited
    _assign_codes and emits per-(subspace, entry, dim) partial integer
    sums in the same batch, so the per-iteration shuffle is bounded by
    batches × M×K×SUB partial rows (no join, no coordinate explode —
    r14; guide §2.3) and the driver collects only the M×K×SUB means
    (the kmeans precedent); the corpus never shuffles raw vectors,
    codebooks ride the closure. Empty entries keep their previous
    centroid (the oracle's COALESCE).

    Parity AND run-to-run determinism: per-dim means are EXACT
    micro-unit BIGINT sums divided once (never an unordered float
    AVG — the seasonal-decompose boundary-flip class), FLOOR-quantized
    before entering the next assignment (cluster_kmeans' rounded-state
    discipline), and the assignment kernel accumulates dims
    sequentially, so both engines walk identical codebooks through
    every iteration; the final table compares quantized values."""
    from compendium_spark.plans.extended import _load_embeddings  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir).localCheckpoint(eager=True)
    cbs = [[list(entry) for entry in CODEBOOKS[m]] for m in range(M)]
    for _ in range(PQ_TRAIN_ITERS):
        # ONE kernel pass per iteration emits per-(m, code, spos)
        # PARTIAL integer sums in the assignment batch itself (r14):
        # the r13 shape joined a posexploded 128k-row coordinate
        # checkpoint against the long-form codes on (vec_id, m) and
        # re-shuffled both every iteration (guide §2.3). The mean
        # divides the same exact totals once, through the same
        # quantize6 — bit-identical codebooks.
        rows = (
            _code_partials(emb, cbs)
            .groupBy("m", "code", "spos")
            .agg(
                quantize6(
                    F.sum("s") / (F.sum("c") * F.lit(1000000.0))
                ).alias("v")
            )
            .collect()
        )  # ≤ M×K×SUB rows: bounded driver work, the kmeans precedent
        for r in rows:
            cbs[r.m][r.code][r.spos - 1] = r.v
    out = [
        (m, k, pos + 1, float(cbs[m][k][pos]))
        for m in range(M)
        for k in range(K)
        for pos in range(SUB)
    ]
    return (
        local_df(spark, out, "m int, k int, pos int, value double")
        .select("m", "k", "pos", quantize6("value").alias("value"))
        .orderBy("m", "k", "pos")
    )
