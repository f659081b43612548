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


def quantize(col: Column | str, ndigits: int) -> Column:
    """Spark side of the n-decimal output quantizer. Pair with
    :func:`sql_quantize` in the oracle — both engines evaluate the
    identical IEEE expression, so results are bit-identical."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**ndigits)
    return F.floor(c.cast("double") * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_quantize(expr: str, ndigits: int) -> str:
    """ANSI-SQL fragment matching :func:`quantize` (DuckDB oracle)."""
    scale = f"{float(10 ** ndigits):.1f}"
    return (
        f"CAST(FLOOR(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) AS BIGINT)"
        f" / {scale}"
    )


def quantize_float(x: float, ndigits: int) -> float:
    """Driver-side / stateful-UDF twin of :func:`quantize`: the same
    FLOOR(x*scale + 0.5)/scale evaluated on a Python float (IEEE
    double) — bit-identical to the Spark and DuckDB expressions."""
    import math

    scale = float(10**ndigits)
    return math.floor(float(x) * scale + 0.5) / scale


def quantize6(col: Column | str) -> Column:
    """6-decimal :func:`quantize` — the default output scale."""
    return quantize(col, 6)


def sql_quantize6(expr: str) -> str:
    """6-decimal :func:`sql_quantize`."""
    return sql_quantize(expr, 6)


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
