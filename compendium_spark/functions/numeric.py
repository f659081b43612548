"""Driver-side numeric helpers that must stay parity-exact with the
SQL engines.

Python's built-in ``round()`` is banker's rounding (half-to-even);
Spark's ``ROUND`` (BigDecimal HALF_UP on the shortest decimal repr)
and DuckDB's ``ROUND`` both take ties away from zero. Any driver-side
or stateful-UDF value that ends up hash-compared against a SQL oracle
must therefore round half-away-from-zero too, or a value landing
exactly on a half boundary diverges across engines.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, ndigits: int) -> float:
    """Round ``x`` to ``ndigits`` decimals with ties away from zero.

    ``Decimal(repr(x))`` uses the shortest round-trip decimal
    representation — the same starting point as Java's
    ``BigDecimal.valueOf(double)`` that backs Spark's ROUND — so both
    engines and this helper agree on the digit being rounded.
    """
    q = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-ndigits), rounding=ROUND_HALF_UP
    )
    return float(q)
