"""dedup_embedding_cosine (round-7 rework): LSH-bucketed exact verify.

The registered plan no longer cross-joins the corpus; candidates come
from sign-LSH buckets. These tests keep the demoted all-pairs form
(COSINE_ALLPAIRS_SQL, DuckDB-only — no Spark crossJoin anywhere) as
the recall oracle: on the gate fixtures the bucketed dup set must
equal the brute-force dup set exactly, so "same output contract on
data where buckets capture all pairs" is pinned, not assumed.

At sf0.1 recall is measured at 9/14 (every miss a borderline pair at
cosine 0.50–0.60 where sign-LSH collision probability is ~0.25 per
table) — documented in the plan docstring, deliberately NOT pinned
here: fixture regeneration may legitimately move borderline pairs.
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
