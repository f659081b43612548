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
    """round_half_up vs DuckDB ROUND on arbitrary finite doubles —
    the cross-engine contract the helper exists for."""
    import duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(
        x=st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
        ),
        nd=st.integers(0, 6),
    )
    def check(x, nd):
        d = con.execute(
            "SELECT ROUND(CAST(? AS DOUBLE), ?)", [x, nd]
        ).fetchone()[0]
        assert round_half_up(x, nd) == d, (x, nd)

    check()
