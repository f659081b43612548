"""Plan registry.

Every query/operator the engine claims is registered here as a
``Plan``: a pure function ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) the equivalent ANSI SQL a DuckDB oracle can run
on the same parquet tables. The driver's correctness gate and our own
``tests/test_parity.py`` both walk this registry.

Parity rules (so value-hashes match across engines):
  * alias every computed column identically in Spark and SQL;
  * aggregate money/quantity in DECIMAL (exact, order-independent),
    cast the final value to DOUBLE;
  * round genuinely-floating results (stddev, cosine) to a fixed scale;
  * pin session timezone UTC (session.py) so timestamps agree.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Plan:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str


_REGISTRY: dict[str, Plan] = {}


def plan(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query plan under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate plan name {name!r}")
        _REGISTRY[name] = Plan(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_plans() -> dict[str, Plan]:
    return dict(_REGISTRY)


def promote(names: list[str]) -> None:
    """Reorder the registry so ``names`` come first (in the given
    order), everything else after in registration order.

    The driver's correctness gate samples a prefix of the registry, so
    plans that still need a driver-green row are promoted into the
    window; plans already green in a prior round's CORRECTNESS file sit
    behind them. Unknown names are an error (catches typos when a plan
    is renamed)."""
    unknown = [n for n in names if n not in _REGISTRY]
    if unknown:
        raise ValueError(f"promote: unknown plan names {unknown!r}")
    rest = [n for n in _REGISTRY if n not in set(names)]
    reordered = {n: _REGISTRY[n] for n in [*names, *rest]}
    _REGISTRY.clear()
    _REGISTRY.update(reordered)
