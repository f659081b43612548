"""K-means clustering over the embedding corpus — the engine's
iterative-ML surface, value-checked end to end.

Two full Lloyd iterations run with exact cross-engine parity: seeded
literal centroids → Arrow-kernel nearest-centroid assignment → centroid
update as a distributed mean (rounded to 6 dp so both engines agree on
the *exact* doubles entering the next round) → re-assignment → final
cluster census. The DuckDB oracle recomputes both rounds in SQL from
the same literals, so even the iterative path is hash-checked — the
same discipline as the IVF/PQ family (plans/ivf.py, plans/pq.py),
extended across an iteration boundary.

Scale shape per iteration (the MLlib KMeans loop): assignment is one
map-side Arrow pass (K·dim FLOPs per vector, no shuffle); the update
is a (cluster, dim)-keyed aggregate — K·dim result rows, collected to
the driver (centroid state is dim-sized, never data-sized) and carried
into the next pass inside the kernel closure. Iterations add passes,
never widen shuffles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load

K = 8
DIM = 64
_rng = np.random.default_rng(21)
CENTROIDS0: list[list[float]] = [
    [round(float(x) * 0.5, 6) for x in _rng.standard_normal(DIM)] for _ in range(K)
]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, cluster) — nearest centroid by squared distance,
    sequential-over-dims accumulation (bit-parity with the oracle's
    list_sum left fold), np.argmin keeping the FIRST minimum (the
    oracle's dist ASC, k tie-break)."""
    import pandas as pd  # noqa: PLC0415

    cent = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            dists = np.zeros((len(x), len(cent)))
            for d in range(x.shape[1]):
                diff = x[:, d][:, None] - cent[None, :, d]
                dists = dists + diff * diff
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": dists.argmin(axis=1).astype("int32")}
            )

    return emb.mapInPandas(assign, schema="vec_id long, cluster int")


def _update(emb: DataFrame, assign: DataFrame) -> list[list[float]]:
    """New centroids = per-(cluster, dim) mean, ROUNDED to 6 dp before
    use — the rounding is what lets two engines agree on the exact
    doubles entering the next iteration (same trick as
    emb_outlier_filter's centroids). Empty clusters keep their old
    centroid (matched by the oracle's COALESCE)."""
    rows = (
        emb.join(assign, "vec_id")
        .select("cluster", F.posexplode("e").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(quantize6(F.avg("x")).alias("m"))
        .collect()
    )
    cent = [list(c) for c in CENTROIDS0]
    for r in rows:
        cent[r.cluster][r.pos] = r.m
    return cent


def _sql_vec(c: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + "]"


_SQL_C0 = " UNION ALL ".join(
    f"SELECT {k} AS k, {_sql_vec(c)} AS cvec" for k, c in enumerate(CENTROIDS0)
)

KMEANS_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c0 AS ({_SQL_C0}),
a1 AS (
  SELECT vec_id, k AS cluster FROM (
    SELECT v.vec_id, c.k,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
             list_sum(list_transform(v.e,
                      (x, i) -> (x - c.cvec[i]) * (x - c.cvec[i]))) ASC,
             c.k) AS rn
    FROM v CROSS JOIN c0 c
  ) WHERE rn = 1
),
m1 AS (
  SELECT a1.cluster, pos, CAST(FLOOR(CAST((AVG(x)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS m
  FROM (
    SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS pos FROM v
  ) ex JOIN a1 USING (vec_id)
  GROUP BY a1.cluster, pos
),
c1 AS (
  SELECT c0.k,
         list_transform(range(1, {DIM} + 1),
                        i -> COALESCE(m.mlist[i], c0.cvec[i])) AS cvec
  FROM c0 LEFT JOIN (
    SELECT cluster, list(m ORDER BY pos) AS mlist FROM m1 GROUP BY cluster
  ) m ON m.cluster = c0.k
),
a2 AS (
  SELECT vec_id, k AS cluster FROM (
    SELECT v.vec_id, c.k,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
             list_sum(list_transform(v.e,
                      (x, i) -> (x - c.cvec[i]) * (x - c.cvec[i]))) ASC,
             c.k) AS rn
    FROM v CROSS JOIN c1 c
  ) WHERE rn = 1
)
SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM a2
GROUP BY cluster
ORDER BY cluster
"""


@plan("cluster_kmeans", oracle=KMEANS_SQL)
def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (K={K}) over the embeddings,
    final cluster census — see module docstring for the parity and
    scale story. Production runs more rounds and a convergence check
    (the per-round machinery is identical); 2 rounds is what keeps the
    SQL oracle finite while still crossing an iteration boundary."""
    emb = _emb(spark, sf_dir)
    a1 = _assign(emb, CENTROIDS0)
    c1 = _update(emb, a1)
    a2 = _assign(emb, c1)
    return (
        a2.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("cluster")
    )
