"""Semantic pins for the round-6 operators — parity proves Spark ==
DuckDB; these prove both match the INTENDED behavior on constructed
fixtures (the same role test_graph_cap plays for the wedge cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_asof_nearest_picks_closer_side_and_respects_tau(spark):
    from compendium_spark.plans.history import ASOF_TAU_S, j20_asof_nearest

    rows = {r["purchase_id"]: r for r in j20_asof_nearest(spark, SF_ORACLE).collect()}
    assert rows
    matched = [r for r in rows.values() if r["click_id"] is not None]
    assert matched, "tau too tight: no purchase matched any click"
    # every emitted delta respects tau and is the true |dt| to SOME click
    assert all(0 <= r["delta_us"] <= ASOF_TAU_S * 1_000_000 for r in matched)
    # cross-check one user end-to-end against a brute-force nearest
    u = matched[0]["user_id"]
    from compendium_spark.tables import load

    ev = load(spark, SF_ORACLE, "events").filter(F.col("user_id") == u)
    clicks = [
        (r["event_id"], r["ts"])
        for r in ev.filter(F.col("event_type") == "click").collect()
    ]
    for r in (x for x in rows.values() if x["user_id"] == u):
        if not clicks:
            assert r["click_id"] is None
            continue
        best = min(
            abs((c_ts - r["ts"]).total_seconds()) for _, c_ts in clicks
        )
        if r["click_id"] is None:
            assert best > ASOF_TAU_S
        else:
            assert abs(r["delta_us"] / 1e6 - best) < 1e-6


def test_cdc_apply_drops_delete_final_entities(spark):
    from compendium_spark.plans.history import j21_cdc_apply
    from compendium_spark.tables import load
    from pyspark.sql import Window

    snap = {r["entity_id"]: r for r in j21_cdc_apply(spark, SF_ORACLE).collect()}
    ev = load(spark, SF_ORACLE, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
        .collect()
    )
    for r in last:
        if r["event_type"] == "error":  # mapped to D
            assert r["user_id"] not in snap
        else:
            assert r["user_id"] in snap


def test_url_canonical_collapses_all_variants(spark):
    from compendium_spark.plans.curation import curate_url_canonical

    rows = curate_url_canonical(spark, SF_ORACLE).collect()
    # every canonical URL is fully normalized
    for r in rows:
        u = r["canonical_url"]
        assert u.startswith("http://")
        assert "#" not in u and "utm_" not in u
        assert ":80" not in u and ":443" not in u
        assert not u.endswith("/")
        assert u == u.lower()
    # doc_id % 100 defines the logical resource: 500 docs / 100 keys
    # with 4 surface forms each must collapse to exactly 100 groups of 5
    assert len(rows) == 100
    assert all(r["n_variants"] == 5 for r in rows)


def test_pivot_wide_matches_long_counts(spark):
    from compendium_spark.plans.olap_ext import e_pivot_wide
    from compendium_spark.tables import load

    wide = {r["user_id"]: r for r in e_pivot_wide(spark, SF_ORACLE).collect()}
    long = (
        load(spark, SF_ORACLE, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    )
    for r in long:
        assert wide[r["user_id"]][f"n_{r['event_type']}"] == r["count"]


def test_ahash_bands_property_random_payloads():
    """Property: the vectorized aHash equals the per-row reference on
    arbitrary ASCII payloads of arbitrary (>= PH_BLOCKS) lengths —
    hypothesis explores the uneven block-boundary space the corpus
    sample can't."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from compendium_spark.plans.multimodal import PH_BANDS, PH_BLOCKS, ahash_bands

    def perrow(payload: bytes) -> list[int]:
        a = np.frombuffer(payload, np.uint8).astype(np.int64)
        ln = len(a)
        total = int(a.sum())
        bits = [
            1
            if int(a[k * ln // PH_BLOCKS : (k + 1) * ln // PH_BLOCKS].sum())
            * ln
            > total * ((k + 1) * ln // PH_BLOCKS - k * ln // PH_BLOCKS)
            else 0
            for k in range(PH_BLOCKS)
        ]
        return [
            sum(bits[16 * band + j] << j for j in range(16))
            for band in range(PH_BANDS)
        ]

    payload_st = st.binary(min_size=PH_BLOCKS, max_size=PH_BLOCKS * 5).map(
        lambda b: bytes(x % 128 for x in b)
    )

    @given(st.lists(payload_st, min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def check(payloads):
        got = ahash_bands(payloads)
        for i, p in enumerate(payloads):
            assert got[i].tolist() == perrow(p)

    check()


def test_url_canonicalization_is_idempotent(spark):
    """canon(canon(x)) == canon(x): applying the plan's regex chain to
    its own output must be a no-op — the property that makes a
    canonical form safe to store and re-ingest."""
    from pyspark.sql import functions as F

    from compendium_spark.plans.curation import curate_url_canonical

    urls = curate_url_canonical(spark, SF_ORACLE).select("canonical_url")
    twice = urls.select(
        "canonical_url",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.lower(F.col("canonical_url")),
                            "^https://",
                            "http://",
                        ),
                        "#.*$",
                        "",
                    ),
                    r"\?utm_[^#]*",
                    "",
                ),
                ":(80|443)/",
                "/",
            ),
            "/$",
            "",
        ).alias("again"),
    )
    assert twice.filter(F.col("again") != F.col("canonical_url")).count() == 0


def test_crawl_to_documents_total_over_adversarial_text(spark, tmp_path):
    """The plan's domain guards must make it TOTAL: empty text,
    whitespace-only text, unicode whitespace (\\xa0 — collapsed by
    Python's \\s but not RE2's) and control characters must be handled
    identically by the Spark pipeline and the DuckDB oracle, not just
    on the well-behaved fixture corpus."""
    import duckdb

    from compendium_spark.plans.crawl2docs import crawl_to_documents

    rows = [
        (3, "normal words here", "en", "s", 17),
        (4, "", "en", "s", 0),                      # empty
        (5, "   ", "en", "s", 3),                   # whitespace-only
        (6, "nbsp inside", "en", "s", 11),     # unicode ws
        (10, "tab\there", "en", "s", 8),            # control char
        (11, "double  spaced  text", "en", "s", 20),
        (12, "<b>tagged</b>", "en", "s", 13),       # markup chars
        (13, "kept plain row", "en", "s", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = crawl_to_documents(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    from compendium_spark.plans import all_plans

    want = con.execute(all_plans()["crawl_to_documents"].oracle).df()
    got = got.sort_values("orig_id", ignore_index=True)[sorted(got.columns)]
    want = want.sort_values("orig_id", ignore_index=True)[sorted(want.columns)]
    assert list(got["orig_id"]) == list(want["orig_id"])
    assert list(got["text"]) == list(want["text"])
    assert list(got["n_chars"]) == list(want["n_chars"])
    # the guards drop exactly: residues 0-2 (none here besides 10?),
    # empty/ws-only (4 is residue 4 but empty; 5 ws-only), non-ASCII
    # (6), markup (12); doc 10 is residue 3 but contains a tab ->
    # excluded by printable-ASCII; 11 double-space collapses
    kept = set(got["orig_id"])
    assert kept == {3, 11, 13}, kept
    assert got.loc[got["orig_id"] == 11, "text"].iloc[0] == "Doc 11 double spaced text"
