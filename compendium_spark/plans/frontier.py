"""sim_frontier_report — the recall-vs-cost frontier across ANN
index families (VERDICT r9 #7).

The per-family tuning curves exist separately (sim_ivf_tuning_curve's
nprobe sweep, sim_lsh_* table counts, sim_pq_adc_topk's compressed
scan); this plan is the report a 100 TB index-selection decision
actually reads: ONE table of (family, setting) → candidates-examined
vs recall@5 against the shared exact brute-force baseline, directly
comparable because every row uses the same queries, the same exact
top-5, and the same cost denominator.

Families and knobs:
  * ivf  — nprobe ∈ IVF_SWEEP probed cells (nested probe ranks, so
    candidates are generated once at the deepest setting);
  * lsh  — L ∈ LSH_SWEEP hash tables (first-collision table index
    plays the role of the probe rank: the candidate set at L is
    exactly the pairs whose min colliding table < L);
  * pq   — exact re-rank of the ADC top-R shortlist, R ∈ PQ_SWEEP
    (the compressed scan reads everything — its cost axis is the
    SHORTLIST the float vectors are fetched for).

Cost semantics: n_candidates counts candidate (query, cand) pairs the
family examines at that setting; cand_share divides by the exhaustive
nq·(corpus−1). recall_at_5 = exact-top-5 members present in the
candidate set / (5·nq) — candidate-containment recall, the ceiling an
exact re-rank of those candidates achieves.

Scale shape: each leg is the same bucketed/probed candidate join its
standalone plan uses (never all-pairs except the documented ≤10-query
exact baseline and the PQ compressed scan); the per-setting roll-ups
aggregate tiny per-rank partials (≤ max-sweep rows for ivf/lsh,
≤ max(PQ_SWEEP)·nq for pq). The three legs share the exact-baseline
subtree; Spark's ReusedExchange dedups what it can and the duplicated
small stages run in parallel (measured in round 9: forcing a
checkpoint barrier here COSTS wall time at bench scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.ann import _sql_tables_union, bucket_entries
from compendium_spark.plans.ivf import (
    _SQL_SCORES,
    _assign_cells,
    _probe_cells,
)
from compendium_spark.plans.pq import (
    _SQL_ADC_JOINS,
    _SQL_ADC_TERMS,
    _SQL_PQ_BASE,
    _assign_codes,
    _query_luts,
)
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan

FRONT_K = 5
IVF_SWEEP = [1, 2, 4, 8]  # nprobe settings
LSH_SWEEP = [2, 4, 8]  # hash-table counts
PQ_SWEEP = [10, 25, 50]  # ADC shortlist depths (exact re-rank size)

_IVF_LIT = ", ".join(str(p) for p in IVF_SWEEP)
_LSH_LIT = ", ".join(str(t) for t in LSH_SWEEP)
_PQ_LIT = ", ".join(str(r) for r in PQ_SWEEP)


def _frontier_sql() -> str:
    return f"""
WITH n AS (
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
  ) WHERE rn <= {FRONT_K}
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM embeddings),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM embeddings
       WHERE vec_id < 10),

-- ivf leg: nested probe ranks (sim_ivf_tuning_curve's one-pass shape)
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
  SELECT vec_id AS query_id, cell, rn AS prank FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM scores WHERE vec_id < 10
  ) WHERE rn <= {max(IVF_SWEEP)}
),
ivf_flagged AS (
  SELECT c.prank,
         CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END AS is_hit
  FROM (
    SELECT p.query_id, a.vec_id AS cand_id, p.prank
    FROM probes p JOIN assign a ON p.cell = a.cell
    WHERE a.vec_id <> p.query_id
  ) c
  LEFT JOIN ex5 e ON c.query_id = e.query_id AND c.cand_id = e.cand_id
),
ivf_lv AS (
  SELECT prank, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(is_hit) AS BIGINT) AS n_hits
  FROM ivf_flagged GROUP BY prank
),
ivf_rows AS (
  SELECT 'ivf' AS family, printf('nprobe=%d', s.nprobe) AS setting,
         CAST(COALESCE(SUM(lv.n_candidates), 0) AS BIGINT) AS n_candidates,
         CAST(COALESCE(SUM(lv.n_hits), 0) AS BIGINT) AS n_hits
  FROM (SELECT unnest([{_IVF_LIT}]) AS nprobe) s
  LEFT JOIN ivf_lv lv ON lv.prank <= s.nprobe
  GROUP BY s.nprobe
),

-- lsh leg: first-collision table index as the nested rank
h AS ({_sql_tables_union("embedding", max(LSH_SWEEP))}),
lsh_first AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         MIN(a.tbl) AS min_tbl
  FROM h a JOIN h b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
  GROUP BY a.vec_id, b.vec_id
),
lsh_lv AS (
  SELECT f.min_tbl, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM lsh_first f
  LEFT JOIN ex5 e ON f.query_id = e.query_id AND f.cand_id = e.cand_id
  GROUP BY f.min_tbl
),
lsh_rows AS (
  SELECT 'lsh' AS family, printf('L=%d', s.l) AS setting,
         CAST(COALESCE(SUM(lv.n_candidates), 0) AS BIGINT) AS n_candidates,
         CAST(COALESCE(SUM(lv.n_hits), 0) AS BIGINT) AS n_hits
  FROM (SELECT unnest([{_LSH_LIT}]) AS l) s
  LEFT JOIN lsh_lv lv ON lv.min_tbl < s.l
  GROUP BY s.l
),

-- pq leg: ADC shortlist rank (quantized-score ranking, cand tie-break)
{_SQL_PQ_BASE},
q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < 10),
adc AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         CAST(FLOOR(CAST(({_SQL_ADC_TERMS})
              AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS adc_q
  FROM codes c
  CROSS JOIN q
  {_SQL_ADC_JOINS}
  WHERE c.vec_id <> q.query_id
),
pq_short AS (
  SELECT query_id, cand_id, rn FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc_q DESC, cand_id) AS rn
    FROM adc
  ) WHERE rn <= {max(PQ_SWEEP)}
),
pq_lv AS (
  SELECT s.rn, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM pq_short s
  LEFT JOIN ex5 e ON s.query_id = e.query_id AND s.cand_id = e.cand_id
  GROUP BY s.rn
),
pq_rows AS (
  SELECT 'pq' AS family, printf('R=%d', s.r) AS setting,
         CAST(COALESCE(SUM(lv.n_candidates), 0) AS BIGINT) AS n_candidates,
         CAST(COALESCE(SUM(lv.n_hits), 0) AS BIGINT) AS n_hits
  FROM (SELECT unnest([{_PQ_LIT}]) AS r) s
  LEFT JOIN pq_lv lv ON lv.rn <= s.r
  GROUP BY s.r
),

allrows AS (
  SELECT * FROM ivf_rows UNION ALL
  SELECT * FROM lsh_rows UNION ALL
  SELECT * FROM pq_rows
)
SELECT a.family, a.setting, a.n_candidates, a.n_hits,
       CAST(FLOOR(CAST((1.0 * a.n_hits / ({FRONT_K} * nq.n_queries))
                  AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS recall_at_5,
       CAST(FLOOR(CAST((1.0 * a.n_candidates
                        / (nq.n_queries * (tot.n_corpus - 1)))
                  AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         / 1000000.0 AS cand_share
FROM allrows a, tot, nq
ORDER BY a.family, a.setting
"""


@plan("sim_frontier_report", oracle=_frontier_sql())
def sim_frontier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family ANN frontier: (family, setting) → candidates
    examined, exact-top-5 containment hits, recall@5, candidate share
    — ivf nprobe sweep, lsh table-count sweep, and the PQ ADC
    shortlist depth, all against ONE shared exact baseline (the
    documented ≤10-query broadcast sweep). The index-selection
    operator: pick the family/knob whose point dominates at the
    deployment's recall target.

    One-pass shape per leg: ivf candidates carry their probe rank
    (nested, generated once at max sweep depth), lsh pairs carry their
    FIRST colliding table (min_tbl — nested in L for free), pq
    shortlist rows carry their ADC rank; each sweep level is a ≤
    max-rank roll-up of those partials — no per-setting re-join of a
    candidate stream anywhere."""
    from compendium_spark.plans.extended import (  # noqa: PLC0415
        _dot_unrolled,
        _load_embeddings,
    )

    emb = _load_embeddings(spark, sf_dir)

    # shared exact baseline (quantized-cosine rank, cand tie-break)
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
        .filter(F.col("rn") <= FRONT_K)
        .select("query_id", "cand_id", F.lit(1).alias("is_hit"))
    )
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    nq = emb.filter(F.col("vec_id") < 10).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )

    def _rollup(lv: DataFrame, sweep_rows: list[int], key: str, cond) -> DataFrame:
        sweep = local_df(spark, [(s,) for s in sweep_rows], f"{key} int")
        return (
            F.broadcast(sweep)
            .join(lv, cond(lv, sweep), "left")
            .groupBy(key)
            .agg(
                F.coalesce(F.sum("n_candidates"), F.lit(0))
                .cast("long")
                .alias("n_candidates"),
                F.coalesce(F.sum("n_hits"), F.lit(0))
                .cast("long")
                .alias("n_hits"),
            )
        )

    def _level(flagged: DataFrame, rank_col: str) -> DataFrame:
        return flagged.groupBy(rank_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum("is_hit").cast("long").alias("n_hits"),
        )

    # --- ivf leg: nested probe ranks ---------------------------------
    assign = _assign_cells(emb)
    probes = _probe_cells(
        emb.filter(F.col("vec_id") < 10), max(IVF_SWEEP), ranked=True
    )
    ivf_cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), "prank")
    )
    ivf_flagged = ivf_cand.join(ex5, ["query_id", "cand_id"], "left").select(
        "prank", F.coalesce("is_hit", F.lit(0)).alias("is_hit")
    )
    ivf_rows = _rollup(
        _level(ivf_flagged, "prank"),
        IVF_SWEEP,
        "nprobe",
        lambda lv, s: lv["prank"] <= s["nprobe"],
    ).select(
        F.lit("ivf").alias("family"),
        F.format_string("nprobe=%d", F.col("nprobe")).alias("setting"),
        "n_candidates",
        "n_hits",
    )

    # --- lsh leg: first-collision table as the nested rank -----------
    # entries feeds the query leg AND the corpus join leg: lazy
    # checkpoint so the bucket kernel runs once (r15, the sim_lsh_topk
    # pattern)
    entries = bucket_entries(emb, max(LSH_SWEEP)).localCheckpoint(
        eager=False
    )
    qh = entries.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    lsh_first = (
        qh.join(entries, ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.min("tbl").alias("min_tbl"))
    )
    lsh_flagged = lsh_first.join(ex5, ["query_id", "cand_id"], "left").select(
        "min_tbl", F.coalesce("is_hit", F.lit(0)).alias("is_hit")
    )
    lsh_rows = _rollup(
        _level(lsh_flagged, "min_tbl"),
        LSH_SWEEP,
        "l",
        lambda lv, s: lv["min_tbl"] < s["l"],
    ).select(
        F.lit("lsh").alias("family"),
        F.format_string("L=%d", F.col("l")).alias("setting"),
        "n_candidates",
        "n_hits",
    )

    # --- pq leg: ADC shortlist rank -----------------------------------
    codes = _assign_codes(emb)
    luts = _query_luts(
        emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        )
    )
    adc = F.element_at(F.col("lut0"), F.col("code0") + 1)
    from compendium_spark.plans.pq import M as _PQ_M  # noqa: PLC0415

    for m in range(1, _PQ_M):
        adc = adc + F.element_at(F.col(f"lut{m}"), F.col(f"code{m}") + 1)
    adc_q = F.floor(adc.cast("double") * 1000000.0 + 0.5).cast("long")
    pq_pairs = (
        codes.join(F.broadcast(luts))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), adc_q.alias("adc_q")
        )
    )
    wpq = Window.partitionBy("query_id").orderBy(F.desc("adc_q"), "cand_id")
    pq_short = (
        pq_pairs.withColumn("rn", F.row_number().over(wpq))
        .filter(F.col("rn") <= max(PQ_SWEEP))
        .select("query_id", "cand_id", "rn")
    )
    pq_flagged = pq_short.join(ex5, ["query_id", "cand_id"], "left").select(
        "rn", F.coalesce("is_hit", F.lit(0)).alias("is_hit")
    )
    pq_rows = _rollup(
        _level(pq_flagged, "rn"),
        PQ_SWEEP,
        "r",
        lambda lv, s: lv["rn"] <= s["r"],
    ).select(
        F.lit("pq").alias("family"),
        F.format_string("R=%d", F.col("r")).alias("setting"),
        "n_candidates",
        "n_hits",
    )

    allrows = ivf_rows.unionByName(lsh_rows).unionByName(pq_rows)
    return (
        allrows.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nq))
        .select(
            "family",
            "setting",
            "n_candidates",
            "n_hits",
            quantize6(
                F.lit(1.0) * F.col("n_hits")
                / (F.lit(FRONT_K) * F.col("n_queries"))
            ).alias("recall_at_5"),
            quantize6(
                F.lit(1.0) * F.col("n_candidates")
                / (F.col("n_queries") * (F.col("n_corpus") - 1))
            ).alias("cand_share"),
        )
        .orderBy("family", "setting")
    )
