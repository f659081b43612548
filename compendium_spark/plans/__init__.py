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

all_plans = registry.all_plans
