"""Multimodal binary-column plumbing."""

from __future__ import annotations

import pytest

from compendium_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    fake_image_features,
    frame_sample,
    media_summary,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", {"w": "64", "h": "64"}),
        (2, "image", b"\x89PNG-fake-bytes-2", {"w": "32", "h": "32"}),
        (3, "image", b"\x89PNG-fake-bytes-1", None),  # duplicate payload
        (4, "audio", b"RIFF-fake", {"hz": "16000"}),
        (5, "video", b"mp4-fake", {"n_frames": "25"}),
        (6, "video", None, {"n_frames": "0"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_raises_without_decoder():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_decode_with_injected_decoder():
    assert decode_image(b"xy", decoder=lambda b: len(b)) == 2


def test_fake_features_deterministic():
    a = fake_image_features(b"payload")
    b = fake_image_features(b"payload")
    assert a == b
    assert len(a) == 8
    assert all(0 <= x < 1 for x in a)
    assert fake_image_features(b"other") != a


def test_extract_features_schema_and_batching(spark, media):
    out = extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "media_type", "n_bytes", "digest", "features"
    ]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[1].digest == rows[3].digest  # same payload → same digest
    assert rows[1].digest != rows[2].digest
    assert rows[6].n_bytes == 0  # null payload handled
    assert len(rows[1].features) == 8


def test_media_summary_never_touches_bytes(spark, media):
    summ = {r.media_type: r for r in media_summary(extract_features(media)).collect()}
    assert summ["image"].n_items == 3
    assert summ["image"].distinct_payloads == 2
    assert summ["audio"].n_items == 1


def test_frame_sample(spark, media):
    frames = frame_sample(media, every_n=10).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_index)
    assert by_media[5] == [0, 10, 20]
    assert by_media[6] == [0]  # zero-frame video degrades to frame 0


# --- CSM1 synthetic container ----------------------------------------------


def test_csm1_roundtrip(spark):
    import struct

    from pyspark.sql import functions as F

    from compendium_spark.operators.multimodal import (
        CSM1_HEADER_LEN,
        CSM1_MAGIC,
        CSM1_STRUCT,
        decode_media,
        synth_encode_expr,
    )

    df = spark.createDataFrame(
        [(1, 640, 480, 3, 100, b"hello"), (2, 16, 16, 1, 0, b"")],
        "media_id long, w int, h int, ch int, nf int, payload binary",
    )
    encoded = df.select(
        "media_id",
        synth_encode_expr(
            code=F.pmod(F.col("media_id"), F.lit(3)),
            width=F.col("w"),
            height=F.col("h"),
            channels=F.col("ch"),
            n_frames=F.col("nf"),
            payload=F.col("payload"),
        ).alias("content"),
    )
    # the JVM-built blob parses with plain struct.unpack — format parity
    blob = {r.media_id: bytes(r.content) for r in encoded.collect()}
    magic, ver, code, w, h, ch, nf = struct.unpack(
        CSM1_STRUCT, blob[1][:CSM1_HEADER_LEN]
    )
    assert (magic, ver, code, w, h, ch, nf) == (CSM1_MAGIC, 1, 1, 640, 480, 3, 100)
    assert blob[1][CSM1_HEADER_LEN:] == b"hello"

    out = {r.media_id: r for r in decode_media(encoded).collect()}
    assert (out[1].media_type, out[1].width, out[1].height) == ("audio", 640, 480)
    assert (out[1].channels, out[1].n_frames, out[1].payload_bytes) == (3, 100, 5)
    assert (out[2].media_type, out[2].payload_bytes, out[2].n_frames) == (
        "video", 0, 0,
    )


def test_csm1_corrupt_header_raises(spark):
    from pyspark.sql import functions as F

    from compendium_spark.operators.multimodal import decode_media

    bad = spark.createDataFrame(
        [(1, b"NOTCSM1-garbage-bytes")], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="bad CSM1 header|ValueError"):
        decode_media(bad).collect()


def test_csm1_property_roundtrip():
    """Format contract, property-tested without Spark: any header the
    spec admits packs with struct and parses back exactly."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from compendium_spark.operators.multimodal import (
        CSM1_MAGIC,
        CSM1_STRUCT,
        MEDIA_TYPE_NAMES,
        parse_csm1,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        code=st.integers(0, 2),
        w=st.integers(0, 65535),
        h=st.integers(0, 65535),
        ch=st.integers(0, 255),
        nf=st.integers(0, 2**32 - 1),
        payload=st.binary(max_size=64),
    )
    def check(code, w, h, ch, nf, payload):
        blob = struct.pack(CSM1_STRUCT, CSM1_MAGIC, 1, code, w, h, ch, nf) + payload
        assert parse_csm1(blob) == (
            MEDIA_TYPE_NAMES[code], w, h, ch, nf, len(payload)
        )

    check()


def test_csm1_rejects_wrong_version():
    import struct

    from compendium_spark.operators.multimodal import (
        CSM1_MAGIC,
        CSM1_STRUCT,
        parse_csm1,
    )

    blob = struct.pack(CSM1_STRUCT, CSM1_MAGIC, 2, 0, 1, 1, 1, 1)
    with pytest.raises(ValueError, match="version=2"):
        parse_csm1(blob)


def test_ahash_bands_vectorized_matches_perrow(spark):
    """The reduceat-vectorized aHash kernel (plans/multimodal.py
    ahash_bands) must be bit-identical to the straightforward per-row
    implementation it replaced — on real corpus payloads, whose
    lengths exercise uneven block boundaries."""
    import numpy as np
    from pyspark.sql import functions as F

    from compendium_spark.plans.multimodal import PH_BANDS, PH_BLOCKS, ahash_bands
    from compendium_spark.tables import load

    from .conftest import SF_ORACLE

    docs = (
        load(spark, SF_ORACLE, "documents")
        .filter(F.col("n_chars") >= PH_BLOCKS)
        .orderBy("doc_id")
        .limit(64)
        .collect()
    )
    assert docs

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

    payloads = [r["text"].encode("utf-8") for r in docs]
    got = ahash_bands(payloads)
    for i, p in enumerate(payloads):
        assert got[i].tolist() == perrow(p), docs[i]["doc_id"]


def test_ahash_bands_rejects_non_ascii():
    import pytest

    from compendium_spark.plans.multimodal import PH_BLOCKS, ahash_bands

    with pytest.raises(ValueError, match="non-ASCII"):
        ahash_bands([bytes([200]) * PH_BLOCKS])
