"""Model-based property test for VersionedWarehouse (hypothesis):
random operation sequences (append / upsert / partial_update / delete /
compact / rollback / vacuum / set_partition_spec) run against BOTH the real warehouse and a
20-line in-memory Python model of the documented semantics; after
every step the latest snapshot must equal the model, and at the end
every retained historical version must still reconstruct the state
the model recorded when that version committed — time travel under
arbitrary interleavings of every write path, including partition
moves, no-op merges, content-identical compactions, and partition
SPEC EVOLUTIONS (mixed-layout merges/deletes/compactions — the model
is layout-blind, so any bystander-row loss or hive-column confusion
surfaces as a content diff).

This is the invariant net the per-op example tests can't weave: the
bugs it hunts are INTERACTIONS (a delete after a rollback after a
compact reading a carried file that the rollback resurrected, ...).
Sequences are kept short and examples few because every op is a real
Spark job — the derandomized seed keeps CI stable."""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from compendium_spark.schemas import SAMPLES  # noqa: E402
from compendium_spark.storage_versioned import VersionedWarehouse  # noqa: E402

KEYS = ["SRS1", "SRS2", "SRS3", "SRS4"]
TAXA = ["txidA", "txidB", None]
STRATS = ["WGS", "AMPLICON", None]

# a batch: unique keys, random taxon/strategy per key
_batch = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(TAXA),
        st.sampled_from(STRATS),
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda r: r[0],
)

_op = st.one_of(
    st.tuples(st.just("append"), _batch),
    st.tuples(st.just("upsert"), _batch),
    st.tuples(
        st.just("partial"),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.sampled_from(STRATS)),
            min_size=1,
            max_size=2,
            unique_by=lambda r: r[0],
        ),
    ),
    st.tuples(
        st.just("delete"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=2, unique=True),
    ),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("rollback"), st.integers(min_value=0, max_value=7)),
    st.tuples(st.just("vacuum"), st.integers(min_value=1, max_value=3)),
    st.tuples(st.just("setspec"), st.sampled_from(["project", "taxon", None])),
    # CDF between two retained versions (VERDICT r12 #6): composes
    # with vacuum (horizon trims the candidates), spec evolution
    # (mixed-layout diff reads), rollback and compaction (identical
    # rows must cancel) — the feed's NET effect must replay the pre
    # state into the post state whenever keys are unique, and the
    # duplicate-key guard must fire exactly when they are not
    st.tuples(
        st.just("cdf"),
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
    ),
)


def _full(spark, rows):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(s, "P", t, None, g, None, None, None, None, None) for s, t, g in rows],
            1,
        ),
        SAMPLES,
    )


def _norm(rows):
    """Multiset-comparable canonical form (None sorts before strings)."""
    return sorted(
        rows, key=lambda r: tuple((x is not None, x or "") for x in r)
    )


def _observed(vwh, version=None):
    return _norm(
        (r.srs, r.taxon, r.library_strategy)
        for r in vwh.read("samples", version).collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_warehouse_matches_model(spark, tmp_path_factory, ops):
    vwh = VersionedWarehouse(
        spark, str(tmp_path_factory.mktemp("model") / "vwh")
    )
    seed = [("SRS1", "txidA", None), ("SRS3", "txidB", "WGS")]
    vwh.write("samples", _full(spark, seed))
    model: list[tuple] = list(seed)
    history = {0: _norm(model)}  # version -> model state at commit

    for kind, arg in ops:
        if kind == "append":
            v = vwh.append("samples", _full(spark, arg))
            model = model + list(arg)
        elif kind == "upsert":
            v = vwh.upsert("samples", _full(spark, arg), "srs")
            keys = {r[0] for r in arg}
            model = [r for r in model if r[0] not in keys] + list(arg)
        elif kind == "partial":
            v = vwh.partial_update(
                "samples",
                spark.createDataFrame(
                    arg, "srs string, library_strategy string"
                ),
                key="srs",
            )
            upd = dict(arg)
            model = [
                (s, t, upd[s] if s in upd and upd[s] is not None else g)
                if s in upd
                else (s, t, g)
                for s, t, g in model
            ]
        elif kind == "delete":
            had = any(r[0] in set(arg) for r in model)
            v = vwh.delete("samples", [("srs", "in", list(arg))])
            model = [r for r in model if r[0] not in set(arg)]
            if not had:
                # provably-no-match deletes may commit nothing
                assert v in history or v == max(history)
        elif kind == "compact":
            v = vwh.compact("samples")
            # content no-op: model unchanged
        elif kind == "rollback":
            retained = sorted(history)
            target = retained[arg % len(retained)]
            v = vwh.rollback("samples", target)
            model = [tuple(r) for r in history[target]]
        elif kind == "vacuum":
            vwh.vacuum("samples", keep_last=arg)
            kept = sorted(history)[-arg:]
            history = {k: history[k] for k in kept}
            v = max(history)  # vacuum commits nothing
        elif kind == "setspec":
            # partition spec evolution: content no-op, may commit
            v = vwh.set_partition_spec("samples", arg)
        elif kind == "cdf":
            retained = sorted(history)
            v_from = retained[arg[0] % len(retained)]
            v_to = retained[arg[1] % len(retained)]
            if v_from > v_to:
                v_from, v_to = v_to, v_from
            pre_state, post_state = history[v_from], history[v_to]
            unique = len({r[0] for r in pre_state}) == len(pre_state) and len(
                {r[0] for r in post_state}
            ) == len(post_state)
            try:
                feed = vwh.table_changes(
                    "samples", v_from, v_to, "srs"
                ).collect()
            except ValueError:
                # the duplicate-key guard: may only fire when a
                # snapshot really holds duplicate keys (append can
                # legally create them)
                assert not unique, (v_from, v_to)
            else:
                if unique:
                    # replay the feed over the pre state -> post state
                    # (pre/delete images check against the IMMUTABLE
                    # pre map — feed row order is arbitrary)
                    pre_map = {r[0]: tuple(r) for r in pre_state}
                    cur = dict(pre_map)
                    for row in feed:
                        t = (row.srs, row.taxon, row.library_strategy)
                        if row._change_type == "insert":
                            assert row.srs not in pre_map
                            cur[row.srs] = t
                        elif row._change_type == "delete":
                            assert pre_map.get(row.srs) == t
                            cur.pop(row.srs, None)
                        elif row._change_type == "update_preimage":
                            assert pre_map.get(row.srs) == t
                        elif row._change_type == "update_postimage":
                            cur[row.srs] = t
                    assert _norm(cur.values()) == post_state, (v_from, v_to)
            v = max(history)  # CDF reads, commits nothing
        history[v] = _norm(model)
        assert _observed(vwh) == _norm(model), (kind, arg)

    # time travel: every retained version reconstructs the state the
    # model recorded when it committed
    for v in vwh.versions("samples"):
        assert _observed(vwh, v) == history[v], f"version {v}"
