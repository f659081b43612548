"""dedup_embedding_cosine (round-7 rework): LSH-bucketed exact verify.

The registered plan no longer cross-joins the corpus; candidates come
from sign-LSH buckets. These tests keep the demoted all-pairs form
(COSINE_ALLPAIRS_SQL, DuckDB-only — no Spark crossJoin anywhere) as
the recall oracle: on the gate fixtures the bucketed dup set must
equal the brute-force dup set exactly, so "same output contract on
data where buckets capture all pairs" is pinned, not assumed.

Round 8 adds the adaptive-L knob (ann.adaptive_n_tables): 4 tables at
the gate fixtures, 8 at sf0.1's 2000 vectors, +2 per further corpus
doubling. Round 9 adds the query-directed 1-probe on the index side
(ann.bucket_entries_probed — lowest-|margin| bit flip), closing the
last sf0.1 miss: the pin below now requires the bucketed dup set to
EQUAL the brute-force dup set (14/14).
"""

from __future__ import annotations

import duckdb
import pytest

from compendium_spark.plans.extended import (
    COSINE_ALLPAIRS_SQL,
    NEARDUP_THRESHOLD,
    NEARDUP_TOPK,
    dedup_embedding_cosine,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def _allpairs_dups(sf_dir: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return {(a, b) for a, b, _cos in con.execute(COSINE_ALLPAIRS_SQL).fetchall()}


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_bucketed_dup_set_equals_all_pairs_on_gate_fixtures(spark, sf_dir):
    out = dedup_embedding_cosine(spark, sf_dir).collect()
    assert len(out) == NEARDUP_TOPK  # thick hash: full top-k emitted
    bucketed = {(r.vec_a, r.vec_b) for r in out if r.is_dup == 1}
    assert bucketed == _allpairs_dups(sf_dir)


def test_dup_rows_rank_above_threshold(spark):
    out = dedup_embedding_cosine(spark, SF_ORACLE).collect()
    for r in out:
        assert (r.cosine >= NEARDUP_THRESHOLD) == (r.is_dup == 1)
    # descending cosine, ties by (vec_a, vec_b)
    keys = [(-r.cosine, r.vec_a, r.vec_b) for r in out]
    assert keys == sorted(keys)


def test_adaptive_table_count_ladder():
    from compendium_spark.plans.ann import (
        N_TABLES_MAX,
        adaptive_n_tables,
        _sql_adaptive_tables_case,
    )

    assert adaptive_n_tables(500) == 4
    assert adaptive_n_tables(999) == 4
    assert adaptive_n_tables(1000) == 6
    assert adaptive_n_tables(2000) == 8
    assert adaptive_n_tables(10**9) == N_TABLES_MAX
    # Python rule == SQL CASE ladder, checked by evaluating the ladder
    case = _sql_adaptive_tables_case("c")
    for n in [1, 500, 999, 1000, 1999, 2000, 4000, 31999, 32000, 10**9]:
        got = duckdb.sql(f"SELECT {case} FROM (SELECT {n} AS c)").fetchone()[0]
        assert got == adaptive_n_tables(n), n


def test_sf01_recall_pin_and_cross_engine_parity(spark):
    """The r8 verdict's done-criterion: at sf0.1 (2000 vectors, L=8,
    1-probe) the bucketed dup set must EQUAL the brute-force dup set
    (14/14 — the r7/r8 pin tolerated one 0.51-cosine miss whose first
    exact collision sat at table 12; the lowest-margin probe catches
    it at table 0) — AND the Spark output must equal the DuckDB oracle
    row-for-row at this SF too (the driver only gates sf0.01, so the
    adaptive ladder's cross-engine agreement at L=8 is pinned here)."""
    from compendium_spark.plans import all_plans

    sf01 = "/root/testdata/sf0.1"
    out = dedup_embedding_cosine(spark, sf01).collect()
    bucketed = {(r.vec_a, r.vec_b) for r in out if r.is_dup == 1}
    truth = _allpairs_dups(sf01)
    assert len(truth) >= 14  # fixture still has a borderline population
    assert bucketed == truth  # full recall, no false positives

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf01}/embeddings.parquet'"
    )
    oracle = con.execute(all_plans()["dedup_embedding_cosine"].oracle).fetchall()
    got = [(r.vec_a, r.vec_b, r.cosine, r.is_dup) for r in out]
    assert got == [tuple(r) for r in oracle]
