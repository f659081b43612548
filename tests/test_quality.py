"""Unit tests for plans/quality.py beyond the oracle-parity mirror.

The synthetic corpus contains no raw PII, so the redaction regexes are
exercised here on adversarial fixtures; the quantization and outlier
plans get invariant checks (code range, reconstruction-error bound,
threshold semantics) that a value-hash alone would not explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from compendium_spark.plans.quality import (
    MAX_TOP_BIGRAM_FRAC,
    OUTLIER_COS_MAX,
    curate_split_assign,
    emb_outlier_filter,
    emb_quantize_int8,
    redact,
    text_repetition_ratio,
)

from .conftest import SF_ORACLE


def _redact_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(redact(F.col("text")).alias("r")).first().r


def test_redact_email(spark):
    assert (
        _redact_one(spark, "contact jane.doe+x@sub.example.org now")
        == "contact <EMAIL> now"
    )


def test_redact_phone(spark):
    assert (
        _redact_one(spark, "call +1 (555) 123-4567 today")
        == "call <PHONE> today"
    )


def test_redact_ipv4(spark):
    assert _redact_one(spark, "host 10.0.255.1 down") == "host <IP> down"
    # no word boundary match inside a longer dotted run
    assert "<IP>" not in _redact_one(spark, "v1.2.3.4.5000x")


def test_redact_blocklist_word_boundary(spark):
    assert _redact_one(spark, "the spark hash table") == "the <TERM> <TERM> table"
    # substrings of blocked terms survive
    assert _redact_one(spark, "sparkly hashes") == "sparkly hashes"


def test_redact_chain_order_no_double_redaction(spark):
    # an email containing a blocked term redacts as ONE email
    assert _redact_one(spark, "spark@hash.example.com") == "<EMAIL>"


def test_top_count_kernel(spark):
    from compendium_spark.plans.quality import _top_count

    df = spark.createDataFrame(
        [(["a", "a", "a", "b"],), (["x", "y", "z"],)], "arr array<string>"
    )
    assert [r.c for r in df.select(_top_count(F.col("arr")).alias("c")).collect()] == [3, 1]


def test_repetition_invariants(spark):
    rows = text_repetition_ratio(spark, SF_ORACLE).collect()
    assert all(0.0 < r.distinct_ratio <= 1.0 for r in rows)
    assert all(0.0 < r.top_token_frac <= 1.0 for r in rows)
    kept = [r for r in rows if r.keep]
    tossed = [r for r in rows if not r.keep]
    assert kept and tossed, "thresholds must split the corpus"
    assert all(
        r.top_bigram_frac <= MAX_TOP_BIGRAM_FRAC for r in kept
    )


def test_split_assign_partitions_everything(spark):
    rows = curate_split_assign(spark, SF_ORACLE).collect()
    splits = {r.split for r in rows}
    assert splits == {"train", "val", "test"}
    total = sum(r.n_docs for r in rows)
    assert total == 500  # every doc lands in exactly one split
    train = sum(r.n_docs for r in rows if r.split == "train")
    assert 0.7 < train / total < 0.9  # ~80% target


def test_quantize_codes_bounded(spark):
    rows = emb_quantize_int8(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    # 64 codes in [-128, 127] bound the checksum
    assert all(-128 * 64 <= r.code_sum <= 127 * 64 for r in rows)
    # max quantization error is half a step: (mx-mn)/255/2; embedding
    # values live in ~[-0.5, 0.5] so the mean error is well under 0.01
    assert all(0.0 <= r.mean_abs_err < 0.01 for r in rows)


def test_outlier_filter_threshold_semantics(spark):
    out = emb_outlier_filter(spark, SF_ORACLE)
    rows = out.collect()
    assert 0 < len(rows) < 500  # culls some, not all
    assert all(r.centroid_cosine < OUTLIER_COS_MAX for r in rows)


# ---------------------------------------------------------------------------
# operators/expectations.py — Deequ-lite library semantics
# ---------------------------------------------------------------------------


def test_expectations_single_pass_and_semantics(spark):
    from compendium_spark.operators.expectations import (
        check,
        in_range,
        in_set,
        not_null,
        satisfies,
        unique,
        unique_check,
    )

    df = spark.createDataFrame(
        [
            (1, "O", 10.0, 5),
            (2, "F", -3.0, 60),
            (3, None, 5.0, None),
            (3, "X", None, 7),
        ],
        "k long, status string, price double, qty long",
    )
    rep = {
        r["check_name"]: r
        for r in check(
            df,
            [
                not_null("status"),
                in_set("status", ["O", "F", "P"]),
                in_range("price", 0, None),
                in_range("qty", 1, 50),
                satisfies("price > 0 AND qty > 0", "pos_both"),
            ],
        ).collect()
    }
    assert rep["not_null(status)"]["n_violations"] == 1
    # NULL and 'X' both violate membership
    assert rep["in_set(status)"]["n_violations"] == 2
    # -3.0 and NULL violate the range
    assert rep["in_range(price)"]["n_violations"] == 2
    # 60 and NULL violate qty range
    assert rep["in_range(qty)"]["n_violations"] == 2
    # NULL predicate counts as violation (unknown doesn't pass)
    assert rep["pos_both"]["n_violations"] == 3
    assert all(r["n_checked"] == 4 for r in rep.values())
    uniq = unique_check(df, "k").collect()[0]
    assert uniq["n_violations"] == 1 and not uniq["passed"]
    # the compiled report is ONE aggregate pass: no joins and exactly
    # one scan of the source REGARDLESS of the number of checks — the
    # tidy pivot must not re-reference df per check (a unionByName of
    # per-check selects would duplicate the whole aggregate N times)
    rep5 = check(
        df,
        [
            not_null("status"),
            in_set("status", ["O", "F", "P"]),
            in_range("price", 0, None),
            satisfies("qty > 0", "qty_pos"),
            unique("k"),
        ],
    )
    plan_str = rep5._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_str
    n_scans = plan_str.count("Scan ExistingRDD") + plan_str.count(
        "LocalTableScan"
    )
    assert n_scans == 1, plan_str
    # and the folded-in unique() matches the standalone helper
    row = {r["check_name"]: r for r in rep5.collect()}
    assert row["unique(k)"]["n_violations"] == 1


def test_dq_report_scan_count(spark):
    """dq_expectations_report's 9 checks over 2 tables must execute
    exactly 4 parquet scans: orders (4 checks share 1), lineitem
    (4 checks share 1), and the FK join's two sides."""
    from compendium_spark.plans.registry import all_plans

    df = all_plans()["dq_expectations_report"].fn(spark, SF_ORACLE)
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert plan_str.count("Scan parquet") == 4, plan_str


def test_referential_check(spark):
    from compendium_spark.operators.expectations import referential_check

    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_check(child, "fk", parent, "pk").collect()[0]
    assert r["n_checked"] == 3 and r["n_violations"] == 1 and not r["passed"]
