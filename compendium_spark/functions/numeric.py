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

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Parity-safe output quantization (the FLOOR-quantize idiom)
# ---------------------------------------------------------------------------
# ROUND(double, n) is NOT cross-engine stable as the last op of a
# hash-compared plan, for two proven reasons (see tests/test_numeric.py):
#   1. DuckDB rounds the *scaled* double x*10^n (representation error can
#      flip the tie digit), while Spark rounds the shortest decimal repr
#      via BigDecimal HALF_UP — at |x| >~ 5e8 they can disagree by 1 ulp
#      of the target scale.
#   2. ROUND can emit -0.0 on one engine and +0.0 on the other; they
#      compare equal numerically but serialize to different hash bytes.
# FLOOR(x*1e6 + 0.5)/1e6 sidesteps both: it is the *same* IEEE double
# expression evaluated on both engines (bit-identical by construction)
# and FLOOR never produces a signed zero. Ties round toward +infinity
# (not away from zero) — an acceptable, documented convention for 6dp
# output quantization. Safe magnitude bound: |x| < 2^63/1e6 ~ 9.2e12
# (Spark FLOOR yields BIGINT; the oracle fragment casts to BIGINT too so
# overflow is loud on both engines, not silent).

_Q6 = 1000000.0


def quantize6(col: Column) -> Column:
    """Spark side of the 6-decimal output quantizer. Pair with
    :func:`sql_quantize6` in the oracle — both engines evaluate the
    identical IEEE expression, so results are bit-identical."""
    return F.floor(col.cast("double") * F.lit(_Q6) + F.lit(0.5)) / F.lit(_Q6)


def sql_quantize6(expr: str) -> str:
    """ANSI-SQL fragment matching :func:`quantize6` (DuckDB oracle)."""
    return (
        f"CAST(FLOOR(CAST(({expr}) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"
        f" / 1000000.0"
    )


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
