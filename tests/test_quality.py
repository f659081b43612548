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
