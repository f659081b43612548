"""k-NN graph construction and diversity (k-center) selection over
the embedding corpus.

Two more building blocks of an embedding-centric curation pipeline:

* ``sim_knn_graph`` — the all-vectors k-nearest-neighbor graph,
  cell-bounded exactly like SemDeDup: neighbors are searched within a
  vector's IVF cell only, so the pair cost is Σ(cell²) instead of n²
  and the per-vector top-k leaves the kernel pre-ranked (output is
  O(n·k), never O(n·cell)). The k-NN graph is the substrate for graph
  clustering, label propagation and connectivity-based dedup
  (plans/extended.py's connected components can run directly on it).

* ``emb_kcenter_init`` — greedy farthest-point (k-center) selection:
  the classic 2-approximation for diverse subset picking and the
  standard k-means++-style seeding when determinism is required.
  Each round is one full scan computing every vector's distance to
  the selected set (elementwise min of per-center squared distances),
  then an argmax; the selected set stays tiny and rides along in the
  distance kernel's closure.

Reference parity note: the reference has no embedding surface
(reference db.py:89-186); both plans belong to the brief's
similarity-search extension axis, composing the IVF primitives in
plans/ivf.py whose cross-engine parity carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6, sql_quantize
from compendium_spark.plans.extended import _load_embeddings
from compendium_spark.plans.ivf import _SQL_SCORES
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan

# ---------------------------------------------------------------------------
# sim_knn_graph
# ---------------------------------------------------------------------------

KNN_K = 3

KNN_SQL = f"""
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
  SELECT ca.vec_id AS src, cb.vec_id AS nbr,
         list_sum(list_transform(a.e, (x, i) -> x * b.e[i]))
           / (a.nrm * b.nrm) AS cos
  FROM cells ca
  JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id <> cb.vec_id
  JOIN n a ON a.vec_id = ca.vec_id
  JOIN n b ON b.vec_id = cb.vec_id
),
ranked AS (
  SELECT src, nbr, cos,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY cos DESC, nbr) AS rk
  FROM pairs
)
SELECT src AS vec_id, nbr AS nbr_id,
       {sql_quantize("cos", 6)} AS cosine,
       rk AS rank
FROM ranked WHERE rk <= {KNN_K}
ORDER BY vec_id, rank
"""


def _cell_knn_kernel(sided: DataFrame, k: int) -> DataFrame:
    """Per-cell k-NN as ONE grouped-map NumPy pass: the full in-cell
    cosine matrix (sequential dim accumulation — 64 rank-1 updates,
    bit-matching the oracle's list_sum left fold, same trick as
    semantic._cell_pair_cosines), then each row's top-k by
    (cos DESC, id ASC) via a stable lexsort — the exact comparison
    ROW_NUMBER uses, on bit-identical doubles. Only n·k edges leave
    the kernel; the O(cell²) matrix never hits a shuffle."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    out_schema = "vec_id long, nbr_id long, cos double, rank int"

    def knn(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "nbr_id": pd.Series(dtype="int64"),
                    "cos": pd.Series(dtype="float64"),
                    "rank": pd.Series(dtype="int32"),
                }
            )
        pdf = pdf.sort_values("vec_id")
        x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
        acc = np.zeros((m, m))
        nsq = np.zeros(m)
        for d in range(x.shape[1]):
            col = x[:, d]
            acc += col[:, None] * col[None, :]
            nsq += col * col
        nrm = np.sqrt(nsq)
        cos = acc / (nrm[:, None] * nrm[None, :])
        ids = pdf["vec_id"].to_numpy()
        kk = min(k, m - 1)
        rows = {"vec_id": [], "nbr_id": [], "cos": [], "rank": []}
        for i in range(m):
            others = np.delete(np.arange(m), i)
            # lexsort: last key is primary -> (-cos asc = cos desc),
            # ties by ascending neighbor id — ROW_NUMBER's comparison
            order = others[np.lexsort((ids[others], -cos[i, others]))][:kk]
            rows["vec_id"].extend([ids[i]] * len(order))
            rows["nbr_id"].extend(ids[order])
            rows["cos"].extend(cos[i, order])
            rows["rank"].extend(range(1, len(order) + 1))
        return pd.DataFrame(
            {
                "vec_id": np.asarray(rows["vec_id"], dtype="int64"),
                "nbr_id": np.asarray(rows["nbr_id"], dtype="int64"),
                "cos": np.asarray(rows["cos"], dtype="float64"),
                "rank": np.asarray(rows["rank"], dtype="int32"),
            }
        )

    return sided.groupBy("cell").applyInPandas(knn, schema=out_schema)


@plan("sim_knn_graph", oracle=KNN_SQL)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-bounded k-NN graph: each vector's top-{KNN_K} neighbors
    WITHIN its IVF cell, exact-cosine ranked (cos DESC, id ASC
    tie-break). Single-probe recall tradeoff is the SemDeDup contract:
    neighbors in other cells are unseen — acceptable for graph-dedup /
    clustering substrates, and the multi-probe extension is the
    sim_ivf_topk probe list applied per corpus vector.

    Scale: one map-only assignment pass over ONE corpus scan — the
    sided kernel input comes from ``_sided_probe_cells(emb, 1)``'s
    role-'m' rows (the assignment with the embedding already attached;
    its rank-1 lexsort pick is the same ORDER BY score DESC, cell
    first-max as ``_assign_cells``), replacing the earlier
    assign-then-join-back shape (2 scans + 1 join); then one shuffle
    on the cell key into the grouped-map kernel, and the kernel emits
    the PRE-RANKED top-k — O(n·k) rows out, no per-vector window over
    O(n·cell) pair rows. K scales ~ n (ivf.make_centroids rule) to
    hold the in-kernel (n/K)² matrix constant."""
    emb = _load_embeddings(spark, sf_dir)
    sided = (
        _sided_probe_cells(emb, 1)
        .filter(F.col("role") == "m")
        .select("cell", "vec_id", "e")
    )
    edges = _cell_knn_kernel(sided, KNN_K)
    return edges.select(
        "vec_id",
        "nbr_id",
        quantize6(F.col("cos")).alias("cosine"),
        F.col("rank"),
    ).orderBy("vec_id", "rank")


# ---------------------------------------------------------------------------
# emb_kcenter_init
# ---------------------------------------------------------------------------

KCENTER_ROUNDS = 4  # centers selected (including the seed)

_SQL_EMB = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
"""

_SQL_SQDIST = (
    "list_sum(list_transform(v.e, (x, i) -> (x - c.e[i]) * (x - c.e[i])))"
)


def _kcenter_sql() -> str:
    """Unrolled greedy farthest-point SQL: c0 = min vec_id; each round
    r picks argmax over vectors of LEAST(sqdist to every selected
    center), ties to the smaller id. The per-round CTEs mirror the
    Spark driver loop exactly (same fold order in the distance, same
    LEAST, same ORDER BY d DESC, vec_id LIMIT 1)."""
    parts = [f"WITH v AS ({_SQL_EMB}),"]
    parts.append("c0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)")
    dist_terms = []
    for r in range(1, KCENTER_ROUNDS):
        dist_terms.append(
            _SQL_SQDIST.replace("c.e", f"c{r - 1}.e")
        )
        least = (
            dist_terms[0]
            if len(dist_terms) == 1
            else "LEAST(" + ", ".join(dist_terms) + ")"
        )
        joins = " ".join(f"CROSS JOIN c{i}" for i in range(r))
        parts.append(
            f", d{r} AS (SELECT v.vec_id, {least} AS d FROM v {joins}"
            f" WHERE v.vec_id NOT IN ({', '.join(f'(SELECT vec_id FROM c{i})' for i in range(r))}))"
        )
        parts.append(
            f", pick{r} AS (SELECT vec_id, d FROM d{r}"
            f" ORDER BY d DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f", c{r} AS (SELECT v.vec_id, v.e FROM v"
            f" JOIN pick{r} p ON v.vec_id = p.vec_id)"
        )
    selects = ["SELECT 0 AS round, vec_id, 0.0 AS dist FROM c0"]
    for r in range(1, KCENTER_ROUNDS):
        selects.append(
            f"SELECT {r} AS round, vec_id, {sql_quantize('d', 6)} AS dist"
            f" FROM pick{r}"
        )
    parts.append(" " + " UNION ALL ".join(selects) + " ORDER BY round")
    return "\n".join(parts)


KCENTER_SQL = _kcenter_sql()


def _min_sqdist(emb: DataFrame, centers: list[list[float]]) -> DataFrame:
    """(vec_id, d): each vector's min squared L2 distance to the
    selected centers, as ONE Arrow kernel pass. Parity with the
    oracle's list_sum(list_transform((x - c)²)) left fold: per center,
    accumulate SEQUENTIALLY over dims (vectorized across rows — the
    _assign_cells trick), then LEAST = elementwise minimum of the
    per-center fold results. A codegen formulation (unrolled 64-term
    expression per center) is value-identical but pays ~1 s of Janino
    compilation per round as the LEAST tree grows — the kernel costs
    none."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    c = np.asarray(centers, dtype=np.float64)

    def dist(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            acc = np.zeros((len(x), len(c)))
            for d in range(x.shape[1]):
                diff = x[:, d][:, None] - c[None, :, d]
                acc += diff * diff
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "d": acc.min(axis=1),
                    "e": pdf["e"],
                }
            )

    return emb.select("vec_id", "e").mapInPandas(
        dist, schema="vec_id long, d double, e array<double>"
    )


@plan("emb_kcenter_init", oracle=KCENTER_SQL)
def emb_kcenter_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) selection: the deterministic
    2-approximation for diverse subset picking / seeding. Round 0
    seeds with the smallest vec_id; each later round scans the corpus
    once for every vector's distance-to-selected-set (`_min_sqdist`
    Arrow kernel — centers ride in the closure) and picks the
    farthest, smaller-id tie-break.

    Scale: rounds are strictly sequential by definition, but each is
    ONE map pass + a 1-row argmax (orderBy(...).limit(1) plans as
    TakeOrderedAndProject: per-partition top-1 then driver merge — no
    global sort). The selected set (k × dim floats) rides in the
    closure; the k tiny collects are the selection itself, documented
    driver-side state like kmeans.py's centroids. Output is the pick
    trace (round, id, distance) — the sampling certificate."""
    emb = _load_embeddings(spark, sf_dir)
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    centers = [[float(x) for x in first["e"]]]
    ids = [int(first["vec_id"])]
    out = [(0, ids[0], 0.0)]
    for r in range(1, KCENTER_ROUNDS):
        # the picked vector rides along in the argmax row, so each
        # round is exactly ONE job (no second fetch-by-id pass)
        pick = (
            _min_sqdist(emb.filter(~F.col("vec_id").isin(ids)), centers)
            .orderBy(F.col("d").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        centers.append([float(x) for x in pick["e"]])
        ids.append(int(pick["vec_id"]))
        out.append((r, ids[-1], float(pick["d"])))
    res = local_df(spark, out, "round int, vec_id long, dist double")
    return res.select(
        "round",
        "vec_id",
        F.when(F.col("round") == 0, F.lit(0.0))
        .otherwise(quantize6(F.col("dist")))
        .alias("dist"),
    ).orderBy("round")


# ---------------------------------------------------------------------------
# emb_kcenter_scalable — k-means||-style bulk sibling of the greedy
# ---------------------------------------------------------------------------

KCS_K = 4  # final centers (including the seed)
KCS_ROUNDS = 2  # oversampling corpus scans — O(log n), NOT k
KCS_L = 8  # candidates drawn per scan (oversampling factor ~ 2k)


def _kcenter_scalable_sql() -> str:
    """Unrolled k-means||-style SQL mirror: KCS_ROUNDS oversampling
    rounds each take the top-KCS_L farthest-from-candidate-set vectors
    (deterministic analog of the d²-weighted draw), then a greedy
    k-center reduction runs over the ~(1 + R·L)-row candidate set —
    identical fold order, MIN/LEAST semantics and (d DESC, vec_id)
    tie-breaks as the Spark driver."""
    parts = [f"WITH v AS ({_SQL_EMB}),"]
    parts.append("cand0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)")
    for r in range(1, KCS_ROUNDS + 1):
        prev = f"cand{r - 1}"
        fold = _SQL_SQDIST
        parts.append(
            f", d{r} AS (SELECT v.vec_id, MIN({fold}) AS d"
            f" FROM v CROSS JOIN {prev} c"
            f" WHERE v.vec_id NOT IN (SELECT vec_id FROM {prev})"
            f" GROUP BY v.vec_id)"
        )
        parts.append(
            f", p{r} AS (SELECT vec_id FROM d{r}"
            f" ORDER BY d DESC, vec_id LIMIT {KCS_L})"
        )
        parts.append(
            f", cand{r} AS (SELECT * FROM {prev}"
            f" UNION ALL SELECT v.vec_id, v.e FROM v JOIN p{r} USING (vec_id))"
        )
    cand = f"cand{KCS_ROUNDS}"
    parts.append(
        f", g0 AS (SELECT vec_id, e FROM {cand} ORDER BY vec_id LIMIT 1)"
    )
    dist_terms = []
    for r in range(1, KCS_K):
        dist_terms.append(
            _SQL_SQDIST.replace("v.e", "t.e").replace("c.e", f"g{r - 1}.e")
        )
        least = (
            dist_terms[0]
            if len(dist_terms) == 1
            else "LEAST(" + ", ".join(dist_terms) + ")"
        )
        joins = " ".join(f"CROSS JOIN g{i}" for i in range(r))
        not_in = ", ".join(f"(SELECT vec_id FROM g{i})" for i in range(r))
        parts.append(
            f", gd{r} AS (SELECT t.vec_id, {least} AS d FROM {cand} t {joins}"
            f" WHERE t.vec_id NOT IN ({not_in}))"
        )
        parts.append(
            f", gp{r} AS (SELECT vec_id, d FROM gd{r}"
            f" ORDER BY d DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f", g{r} AS (SELECT t.vec_id, t.e FROM {cand} t"
            f" JOIN gp{r} USING (vec_id))"
        )
    selects = ["SELECT 0 AS round, vec_id, 0.0 AS dist FROM g0"]
    for r in range(1, KCS_K):
        selects.append(
            f"SELECT {r} AS round, vec_id, {sql_quantize('d', 6)} AS dist"
            f" FROM gp{r}"
        )
    parts.append(" " + " UNION ALL ".join(selects) + " ORDER BY round")
    return "\n".join(parts)


KCENTER_SCALABLE_SQL = _kcenter_scalable_sql()


def _np_min_sqdist(x, centers):
    """min squared L2 distance of each row of x to the center set,
    with the SAME per-dim sequential accumulation as _min_sqdist (and
    therefore the oracle's list_sum fold) — used for the driver-side
    greedy reduction over the tiny candidate set."""
    import numpy as np  # noqa: PLC0415

    c = np.asarray(centers, dtype=np.float64)
    acc = np.zeros((len(x), len(c)))
    for d in range(x.shape[1]):
        diff = x[:, d][:, None] - c[None, :, d]
        acc += diff * diff
    return acc.min(axis=1)


@plan("emb_kcenter_scalable", oracle=KCENTER_SCALABLE_SQL)
def emb_kcenter_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk k-center: the k-means|| (Bahmani et al., VLDB'12) shape —
    {KCS_ROUNDS} oversampling scans each draw the top-{KCS_L} vectors
    farthest from the current candidate set (the deterministic analog
    of one d²-weighted sample round), then the greedy 2-approximation
    runs DRIVER-SIDE over the ~(1 + R·L) collected candidates to pick
    the final {KCS_K} centers.

    Scale contrast with emb_kcenter_init: the greedy form scans the
    corpus k−1 times (inherently sequential in k); this one scans it
    only KCS_ROUNDS times regardless of k — the round count is
    O(log n) in theory and a small constant in practice — and the only
    driver-side state is the candidate set (R·L × dim floats, the
    documented tiny-collect). Each scan is one Arrow map pass + a
    TakeOrdered top-L. tests/test_knn_scalable.py bounds its coverage
    radius against the greedy baseline."""
    import numpy as np  # noqa: PLC0415

    emb = _load_embeddings(spark, sf_dir)
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    cand_ids = [int(first["vec_id"])]
    cand_vecs = [[float(v) for v in first["e"]]]
    for _ in range(KCS_ROUNDS):
        picks = (
            _min_sqdist(emb.filter(~F.col("vec_id").isin(cand_ids)), cand_vecs)
            .orderBy(F.col("d").desc(), "vec_id")
            .limit(KCS_L)
            .collect()
        )
        for p in picks:
            cand_ids.append(int(p["vec_id"]))
            cand_vecs.append([float(v) for v in p["e"]])
    # greedy reduction over the candidate set (driver-side numpy —
    # the set is R·L+1 rows by construction)
    order = np.argsort(np.asarray(cand_ids))
    ids = np.asarray(cand_ids)[order]
    x = np.asarray(cand_vecs, dtype=np.float64)[order]
    sel = [0]  # seed = smallest vec_id (== the global seed)
    out = [(0, int(ids[0]), 0.0)]
    for r in range(1, KCS_K):
        d = _np_min_sqdist(x, x[sel])
        d[sel] = -1.0  # exclude already-selected from the argmax
        best = int(
            min(range(len(ids)), key=lambda i: (-d[i], ids[i]))
        )
        sel.append(best)
        out.append((r, int(ids[best]), float(d[best])))
    res = local_df(spark, out, "round int, vec_id long, dist double")
    return res.select(
        "round",
        "vec_id",
        F.when(F.col("round") == 0, F.lit(0.0))
        .otherwise(quantize6(F.col("dist")))
        .alias("dist"),
    ).orderBy("round")


# ---------------------------------------------------------------------------
# sim_knn_graph_multiprobe
# ---------------------------------------------------------------------------

KNN_NPROBE = 2

KNN_MULTIPROBE_SQL = f"""
WITH scores AS ({_SQL_SCORES}),
ranked_cells AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, cell) AS rn
  FROM scores
),
assign AS (SELECT vec_id, cell FROM ranked_cells WHERE rn = 1),
probes AS (SELECT vec_id, cell FROM ranked_cells WHERE rn <= {KNN_NPROBE}),
n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
pairs AS (
  SELECT p.vec_id AS src, a.vec_id AS nbr,
         CAST(FLOOR(CAST((list_sum(list_transform(x.e, (xx, i) -> xx * y.e[i]))
           / (x.nrm * y.nrm)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           / 1000000.0 AS cos
  FROM probes p
  JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id
  JOIN n x ON x.vec_id = p.vec_id
  JOIN n y ON y.vec_id = a.vec_id
),
ranked AS (
  SELECT src, nbr, cos,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY cos DESC, nbr) AS rk
  FROM pairs
)
SELECT src AS vec_id, nbr AS nbr_id, cos AS cosine, rk AS rank
FROM ranked WHERE rk <= {KNN_K}
ORDER BY vec_id, rank
"""


def _sided_probe_cells(emb: DataFrame, n_probe: int) -> DataFrame:
    """(cell, vec_id, e, role) — the two-sided kernel input built in
    ONE Arrow pass over ONE embeddings scan. The assignment IS the
    rank-1 probe, so emitting every vector's role 'm' row (its
    assigned cell) alongside its ``n_probe`` role 'p' rows from the
    same centroid-score matrix replaces the earlier
    assign-kernel + probe-kernel + two join-backs shape (4 scans of
    the corpus, 2 join shuffles) with 1 scan, 0 joins; the cell-key
    shuffle into the per-cell kernel ships the same n·(n_probe+1)
    embedding copies either way. Scoring is the identical
    sequential-over-dims accumulation and ``lexsort`` tie-break as
    ``ivf._assign_cells`` / ``ivf._probe_cells``, so roles are
    bit-for-bit the rows the composed form produced."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from compendium_spark.plans.ivf import CENTROIDS, N_CELLS  # noqa: PLC0415

    centroids = np.asarray(CENTROIDS, dtype=np.float64)  # (K, DIM)

    def probe(batches):
        cell_idx = np.arange(N_CELLS)
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
            cells: list[int] = []
            rows: list[int] = []
            roles: list[str] = []
            for r in range(len(x)):
                order = np.lexsort((cell_idx, -scores[r]))[:n_probe]
                cells.append(int(order[0]))
                rows.append(r)
                roles.append("m")
                cells.extend(int(c) for c in order)
                rows.extend([r] * len(order))
                roles.extend(["p"] * len(order))
            idx = np.asarray(rows)
            yield pd.DataFrame(
                {
                    "cell": np.asarray(cells, dtype="int32"),
                    "vec_id": pdf["vec_id"].to_numpy()[idx],
                    "e": pdf["e"].to_numpy()[idx],
                    "role": roles,
                }
            )

    return emb.select("vec_id", "e").mapInPandas(
        probe, schema="cell int, vec_id long, e array<double>, role string"
    )


def _probe_knn_kernel(sided: DataFrame, k: int) -> DataFrame:
    """Two-sided per-cell kernel: each group holds the cell's MEMBERS
    (role 'm', assigned here) and its PROBERS (role 'p', this cell is
    in their top-{KNN_NPROBE} probe list). One NumPy pass builds the
    probers x members cosine matrix (sequential dim accumulation —
    bit-matching the oracle's list_sum left fold) and emits each
    prober's in-cell top-k on the QUANTIZED cosine. Arrays ship once
    per role per cell — never once per pair — and only O(probers·k)
    slim edge rows leave the kernel; a prober's global top-k is a
    subset of the union of its per-cell top-k under the same total
    order, so the downstream window stays exact."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    out_schema = "src long, nbr long, cos double"

    def knn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "src": pd.Series(dtype="int64"),
                "nbr": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
        mem = pdf[pdf["role"] == "m"].sort_values("vec_id")
        prb = pdf[pdf["role"] == "p"].sort_values("vec_id")
        if len(mem) == 0 or len(prb) == 0:
            return empty
        xm = np.vstack(mem["e"].to_numpy()).astype(np.float64)
        xp = np.vstack(prb["e"].to_numpy()).astype(np.float64)
        acc = np.zeros((len(xp), len(xm)))
        psq = np.zeros(len(xp))
        msq = np.zeros(len(xm))
        for d in range(xp.shape[1]):
            pc, mc = xp[:, d], xm[:, d]
            acc += pc[:, None] * mc[None, :]
            psq += pc * pc
            msq += mc * mc
        cos = acc / (np.sqrt(psq)[:, None] * np.sqrt(msq)[None, :])
        qcos = np.floor(cos * 1e6 + 0.5) / 1e6
        mids = mem["vec_id"].to_numpy()
        pids = prb["vec_id"].to_numpy()
        rows = {"src": [], "nbr": [], "cos": []}
        for i in range(len(pids)):
            others = np.nonzero(mids != pids[i])[0]
            if len(others) == 0:
                continue
            order = others[np.lexsort((mids[others], -qcos[i, others]))][:k]
            rows["src"].extend([pids[i]] * len(order))
            rows["nbr"].extend(mids[order])
            rows["cos"].extend(qcos[i, order])
        if not rows["src"]:
            return empty
        return pd.DataFrame(
            {
                "src": np.asarray(rows["src"], dtype="int64"),
                "nbr": np.asarray(rows["nbr"], dtype="int64"),
                "cos": np.asarray(rows["cos"], dtype="float64"),
            }
        )

    return sided.groupBy("cell").applyInPandas(knn, schema=out_schema)


@plan("sim_knn_graph_multiprobe", oracle=KNN_MULTIPROBE_SQL)
def sim_knn_graph_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe k-NN graph — the extension sim_knn_graph's contract
    names: each vector searches its top-{KNN_NPROBE} IVF cells (the
    sim_ivf_topk probe list applied per corpus vector) instead of its
    assigned cell only, recovering the cross-cell neighbors that make
    single-probe graphs under-connected near cell boundaries (recall
    vs the brute-force graph is pinned >= single-probe in
    tests/test_knn_multiprobe.py).

    Scale: ONE map-only Arrow pass over ONE corpus scan emits both
    roles (the assignment is the rank-1 probe — ``_sided_probe_cells``
    replaced the assign-kernel + probe-kernel + two join-back shape
    its first form used: 4 scans, 2 join shuffles → 1 scan, 0 joins),
    one shuffle on the cell key into the two-sided kernel
    (arrays ship once per role per cell — the pair-join form would
    ship 2x64 doubles per candidate pair), and the kernel pre-ranks
    in-cell so only O(n·nprobe·k) slim edges reach the final per-src
    window (WindowGroupLimit, no global sort). Probe cost is a flat
    nprobe multiplier on the single-probe plan; K scales ~ n to hold
    per-cell work constant (ivf.make_centroids rule). Top-k
    membership compares the QUANTIZED cosine (the emitted value), so
    the rank boundary is robust to sub-quantum float drift.

    Reference parity: the reference has no embedding surface
    (reference db.py:89-186); this is the brief's similarity-search
    extension axis."""
    emb = _load_embeddings(spark, sf_dir)
    edges = _probe_knn_kernel(_sided_probe_cells(emb, KNN_NPROBE), KNN_K)
    w = Window.partitionBy("src").orderBy(F.desc("cos"), "nbr")
    return (
        edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select(
            F.col("src").alias("vec_id"),
            F.col("nbr").alias("nbr_id"),
            F.col("cos").alias("cosine"),
            "rank",
        )
        .orderBy("vec_id", "rank")
    )
