"""Query plans — the engine's operator inventory, one function per
SURVEY.md §2 operator, each paired with a DuckDB oracle SQL string.

Import side effect: importing this package registers every plan in
``registry.all_plans()``.
"""

from compendium_spark.plans import (  # noqa: F401
    ann,
    extended,
    ivf,
    multimodal,
    olap_ext,
    reference_ops,
    reference_ops2,
    registry,
    relational_ext,
    text,
    tpch,
    tpch2,
    windows,
)

# The driver's correctness gate samples a prefix of the registry
# (50 plans in round 1), so plans without a driver-green row in
# CORRECTNESS_r01.json are promoted to the front of the iteration
# order: all of tpch/tpch2/windows/relational_ext/text, j9, and the
# two plans whose round-1 rows were red (mm_feature_pipeline hash
# dtype, a_approx_aggregates array output) — both fixed this round.
registry.promote(
    [
        # TPC-H family (q1-q22)
        *[n for n in registry.all_plans() if n.startswith("q")],
        # windows, sessionization, scalar/date/json functions, set ops,
        # pivot, as-of/range/skew joins, argmax, grouping sets
        *[
            n
            for n, p in registry.all_plans().items()
            if p.fn.__module__.endswith(("relational_ext", "windows"))
        ],
        # text analysis + keyword filter (SURVEY P6)
        *[
            n
            for n, p in registry.all_plans().items()
            if p.fn.__module__.endswith("plans.text")
        ],
        "j9_semi_join",
        "mm_feature_pipeline",
        "a_approx_aggregates",
    ]
)

all_plans = registry.all_plans
