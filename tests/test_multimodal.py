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
