"""Parity-exact rounding helper."""

from __future__ import annotations

from compendium_spark.functions.numeric import round_half_up


def test_half_boundary_rounds_away_from_zero():
    # built-in round() gives 0.12 / 2 here (banker's); SQL engines don't
    assert round_half_up(0.125, 2) == 0.13
    assert round_half_up(-0.125, 2) == -0.13
    assert round_half_up(2.5, 0) == 3.0
    assert round_half_up(-2.5, 0) == -3.0


def test_matches_shortest_repr_digits():
    # operates on repr(x) (shortest round-trip), like BigDecimal.valueOf
    assert round_half_up(1.0055, 3) == 1.006 or round_half_up(1.0055, 3) == 1.005
    assert round_half_up(3.14159265, 4) == 3.1416
    assert round_half_up(123.0, 6) == 123.0


def test_agrees_with_spark_and_duckdb(spark):
    import duckdb

    from pyspark.sql import functions as F

    vals = [0.125, -0.125, 1.0000005, -1.0000005, 0.1234565, 7.77777749]
    for v in vals:
        s = (
            spark.range(1)
            .select(F.round(F.lit(v), 6).alias("r"))
            .collect()[0][0]
        )
        d = duckdb.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        assert round_half_up(v, 6) == s == d, v


def test_property_matches_duckdb_round():
    """round_half_up vs DuckDB ROUND — within the magnitude envelope
    the helper's call sites actually produce (|x| < 1e6: ratios,
    stddevs, cosines, per-doc scores).

    The contract is NOT achievable on arbitrary doubles: DuckDB ROUND
    multiplies-then-rounds (it rounds the scaled double x*10^nd, whose
    representation error can flip the tie digit), while Spark and this
    helper round the shortest decimal repr (BigDecimal HALF_UP
    semantics). Hypothesis found x=562949954.2588274, nd=6 where the
    scaled double lands on ...27.5 and DuckDB answers ...828 vs
    shortest-repr ...827. That is exactly why hash-compared plan
    OUTPUTS use the FLOOR-quantize idiom (functions/numeric.quantize6)
    instead of ROUND — bit-identical across engines at any magnitude.
    Within |x| < 1e6 and nd <= 6 the scaled value stays under 2^53 and
    the three roundings agree; that envelope covers every
    round_half_up call site.
    """
    import duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(
        x=st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
        ),
        nd=st.integers(0, 6),
    )
    def check(x, nd):
        d = con.execute(
            "SELECT ROUND(CAST(? AS DOUBLE), ?)", [x, nd]
        ).fetchone()[0]
        assert round_half_up(x, nd) == d, (x, nd)

    check()


def test_quantize6_parity_and_no_signed_zero(spark):
    """The FLOOR-quantize output idiom: Spark quantize6 and the DuckDB
    sql_quantize6 fragment agree BITWISE, including on values where
    ROUND emits a signed zero on one engine only."""
    import struct

    import duckdb

    from pyspark.sql import functions as F

    from compendium_spark.functions.numeric import quantize6, sql_quantize6

    vals = [
        -4.1e-7,   # ROUND -> -0.0 in DuckDB, +0.0 in Spark; quantize6 -> +0.0 both
        0.1234565,
        -0.1234565,
        562949954.2588274,  # the ROUND counterexample magnitude
        123456.9999995,
        -123456.9999995,
        0.0,
        -0.0,
    ]
    con = duckdb.connect()
    for v in vals:
        s = (
            spark.range(1)
            .select(quantize6(F.lit(v)).alias("q"))
            .collect()[0][0]
        )
        d = con.execute(f"SELECT {sql_quantize6(repr(v))}").fetchone()[0]
        sb, db = struct.pack("<d", s), struct.pack("<d", d)
        assert sb == db, (v, s, d)
        assert struct.pack("<d", s) != struct.pack("<d", -0.0), v
