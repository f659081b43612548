"""sim_knn_graph_multiprobe: recall vs the brute-force k-NN graph.

The single-probe graph (sim_knn_graph) misses true neighbors that sit
in a different IVF cell; the multi-probe form searches each vector's
top-KNN_NPROBE cells. These tests pin the contract: multi-probe edge
recall against the brute-force all-pairs graph (DuckDB-only — no
Spark crossJoin anywhere) is at least single-probe recall at every
gate fixture, and structural invariants (contiguous ranks, descending
quantized cosine, <= k edges per vector) hold.
"""

from __future__ import annotations

import duckdb
import pytest

from compendium_spark.plans.knn import (
    KNN_K,
    sim_knn_graph,
    sim_knn_graph_multiprobe,
)
from tests.conftest import SF_ORACLE, SF_SMOKE

BRUTE_KNN_SQL = f"""
WITH n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         list_sum(list_transform(a.e, (x, i) -> x * b.e[i]))
           / (a.nrm * b.nrm) AS cos
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src, nbr,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY cos DESC, nbr) AS rk
  FROM pairs
)
SELECT src, nbr FROM ranked WHERE rk <= {KNN_K}
"""


def _brute_edges(sf_dir: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return set(map(tuple, con.execute(BRUTE_KNN_SQL).fetchall()))


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    truth = _brute_edges(sf_dir)
    single = {
        (r.vec_id, r.nbr_id) for r in sim_knn_graph(spark, sf_dir).collect()
    }
    multi = {
        (r.vec_id, r.nbr_id)
        for r in sim_knn_graph_multiprobe(spark, sf_dir).collect()
    }
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    # the fixture embeddings are near-uniform Gaussians (little cluster
    # structure), so absolute recall is fixture-noise; the CONTRACT is
    # the probe knob's multiplier. Measured: 0.165 -> 0.294 (sf0.001),
    # 0.160 -> 0.276 (sf0.01) — pin a conservative 1.4x floor.
    assert recall_multi >= 1.4 * recall_single
    assert recall_multi >= 0.2


def test_multiprobe_improves_recall_at_oracle_sf(spark):
    """At SF_ORACLE the fixture population has cross-cell neighbor
    pairs (vectors near cell boundaries): the second probe must
    strictly improve brute-force edge recall over single-probe."""
    truth = _brute_edges(SF_ORACLE)
    single = {
        (r.vec_id, r.nbr_id) for r in sim_knn_graph(spark, SF_ORACLE).collect()
    }
    multi = {
        (r.vec_id, r.nbr_id)
        for r in sim_knn_graph_multiprobe(spark, SF_ORACLE).collect()
    }
    assert len(multi & truth) > len(single & truth)


def test_structural_invariants(spark):
    rows = sim_knn_graph_multiprobe(spark, SF_ORACLE).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        by_src.setdefault(r.vec_id, []).append(r)
    for src, edges in by_src.items():
        assert len(edges) <= KNN_K
        assert [e.rank for e in edges] == list(range(1, len(edges) + 1))
        keys = [(-e.cosine, e.nbr_id) for e in edges]
        assert keys == sorted(keys)  # quantized-cos desc, nbr asc
        assert all(e.nbr_id != src for e in edges)
