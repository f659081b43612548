"""Property test for the bucketed range join (j10).

The bucket-bin decomposition must equal the naive quadratic
definition on arbitrary inputs — especially timestamps landing
exactly on bucket boundaries and exactly at the +5 min edge, which
no fixed fixture reliably covers.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIDTH_US = 300_000_000  # 5 min, matches plans/relational_ext.j10


def _spark_range_join_counts(spark, rows):
    """The j10 bucketing applied to an in-memory events list."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("us", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    ev = spark.createDataFrame(rows, schema)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("event_id", F.col("user_id").alias("a_user"), F.col("us").alias("a_us"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.col("a_us") / WIDTH_US),
                    F.floor(F.col("a_us") / WIDTH_US) + 1,
                )
            ),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        F.floor(F.col("us") / WIDTH_US).alias("bucket"),
    )
    joined = views.join(
        clicks,
        (F.col("a_user") == F.col("b_user"))
        & (views.bucket == clicks.bucket)
        & (F.col("b_us") > F.col("a_us"))
        & (F.col("b_us") <= F.col("a_us") + WIDTH_US),
        "left",
    )
    out = joined.groupBy("event_id").agg(F.count("b_us").alias("n"))
    return {r.event_id: r.n for r in out.collect()}


# timestamps clustered near bucket edges: offsets within ±2 µs of a
# multiple of the width, plus arbitrary fill
edge_us = st.builds(
    lambda k, d: k * WIDTH_US + d,
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=-2, max_value=2),
).filter(lambda v: v >= 0)
any_us = st.one_of(edge_us, st.integers(min_value=0, max_value=6 * WIDTH_US))

event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        any_us,
        st.sampled_from(["view", "click"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(event_rows)
def test_bucketed_range_join_equals_naive(spark, rows):
    data = [
        (i, user, us, etype) for i, (user, us, etype) in enumerate(rows)
    ]
    got = _spark_range_join_counts(spark, data)

    views = [(i, u, us) for i, u, us, t in data if t == "view"]
    clicks = [(u, us) for _, u, us, t in data if t == "click"]
    want = {
        vid: sum(
            1
            for (cu, cus) in clicks
            if cu == vu and vus < cus <= vus + WIDTH_US
        )
        for vid, vu, vus in views
    }
    assert got == want
