"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics are fully real — schema, partition-friendly
`mapInPandas` batch iteration, Arrow transfer of binary columns, UDF
signatures — while the codec step is pluggable: the real decoders
(PIL/librosa/av) are not in this image, so `decode_image` raises
NotImplementedError unless a decoder is injected, and
`fake_image_features` provides a deterministic stand-in so the
pipeline shape is testable end-to-end.

The CSM1 synthetic container (``synth_encode_expr`` /
``decode_media``) goes one step further than the digest stand-in: a
real fixed-layout binary format (15-byte big-endian header + payload)
is ENCODED JVM-side and DECODED byte-for-byte inside the mapInPandas
kernel with ``struct.unpack`` — so the parse logic, endianness
handling, magic/version validation, and Arrow binary round-trip are
all genuinely exercised, not stubbed, and the decoded fields carry a
full value oracle (plans/multimodal.py mm_decode).

Scale notes (100 TB of media):
  * binary payloads ride in parquet/Arrow pages; never collect() them;
  * feature extraction is embarrassingly parallel mapInPandas — size
    `spark.sql.files.maxPartitionBytes` so a batch of payloads fits
    executor memory;
  * outputs are small typed columns (dims, features), so downstream
    joins/aggs never touch bytes again — project the binary column
    away as early as possible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, digest string, "
    "features array<float>"
)

N_FEATURES = 8


def decode_image(content: bytes, decoder: Callable[[bytes], object] | None = None):
    """Decode an image payload. Inject `decoder` (e.g. PIL.Image.open
    wrapped) in environments that have one; this image does not.
    """
    if decoder is None:
        raise NotImplementedError(
            "no image decoder available in this environment; "
            "inject decoder= (e.g. PIL) or use fake_image_features"
        )
    return decoder(content)


def fake_image_features(content: bytes, n: int = N_FEATURES) -> list[float]:
    """Deterministic stand-in feature vector: n floats in [0,1) derived
    from the payload digest. Replaces the model/codec step so the
    Spark plumbing (batching, schema, joins) is fully exercised."""
    d = hashlib.sha256(content or b"").digest()
    return [d[i] / 255.0 for i in range(n)]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves each partition's binary column into pandas in batches;
    the output drops the payload (bytes never survive past this
    operator). Columns the kernel doesn't read are projected away
    FIRST — Catalyst cannot prune through an opaque mapInPandas, and
    shipping e.g. a map column through Arrow costs ~3× (measured).
    """
    media = media.select("media_id", "media_type", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "digest": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": content.map(fake_image_features),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB: emits one row per sampled frame index
    based on a frame-count metadata key. The decode of actual frames is
    the injected-codec step (NotImplemented here); the row explosion,
    schema, and partitioning are the real Spark mechanics."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_index"),
        )
    )


# --- CSM1 synthetic media container ---------------------------------------
#
# Layout (big-endian, 15-byte header):
#   bytes 0-3   magic  "CSM1"
#   byte  4     version (1)
#   byte  5     media-type code (0=image, 1=audio, 2=video)
#   bytes 6-7   width   u16
#   bytes 8-9   height  u16
#   byte  10    channels u8
#   bytes 11-14 n_frames u32
#   bytes 15-   payload
CSM1_MAGIC = b"CSM1"
CSM1_STRUCT = ">4sBBHHBI"
CSM1_HEADER_LEN = 15
MEDIA_TYPE_CODES = {"image": 0, "audio": 1, "video": 2}
MEDIA_TYPE_NAMES = {v: k for k, v in MEDIA_TYPE_CODES.items()}

DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "channels int, n_frames long, payload_bytes long"
)


def _be_hex(col: Column, n_bytes: int) -> Column:
    """Big-endian fixed-width hex of a non-negative integral column —
    one lpad'd HEX() so the whole header can concat into a single
    UNHEX (all JVM-side codegen, no Python in the encode path)."""
    return F.lpad(F.hex(col.cast("bigint")), 2 * n_bytes, "0")


def synth_encode_expr(
    code: Column,
    width: Column,
    height: Column,
    channels: Column,
    n_frames: Column,
    payload: Column,
) -> Column:
    """CSM1 container as a Column expression: header built from hex
    nibbles (`unhex(concat(lpad(hex(..))))` — whole-stage-codegen
    string ops), concatenated with the binary payload."""
    header_hex = F.concat(
        F.lit(CSM1_MAGIC.hex().upper()),
        _be_hex(F.lit(1), 1),
        _be_hex(code, 1),
        _be_hex(width, 2),
        _be_hex(height, 2),
        _be_hex(channels, 1),
        _be_hex(n_frames, 4),
    )
    return F.concat(F.unhex(header_hex), payload)


def parse_csm1(b: bytes) -> tuple[str, int, int, int, int, int]:
    """Parse one CSM1 blob → (media_type, width, height, channels,
    n_frames, payload_bytes). Validates magic + version — a corrupt
    byte raises, it does not pass silently. Pure function so the
    format contract is property-testable without a SparkSession."""
    import struct  # noqa: PLC0415

    magic, ver, code, w, h, ch, nf = struct.unpack(
        CSM1_STRUCT, bytes(b[:CSM1_HEADER_LEN])
    )
    if magic != CSM1_MAGIC or ver != 1:
        raise ValueError(
            f"bad CSM1 header: magic={magic!r} version={ver}"
        )
    return (
        MEDIA_TYPE_NAMES[code], w, h, ch, nf, len(b) - CSM1_HEADER_LEN
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode CSM1 payloads batch-wise in mapInPandas.

    This is the real decode seam exercised end-to-end: Arrow moves the
    binary column into pandas, `parse_csm1` unpacks the fixed-layout
    header per row, and only typed scalars leave the kernel. Swapping
    CSM1 for JPEG/WAV means swapping the parse call for PIL/librosa
    inside the same kernel — schema, batching, and partitioning are
    unchanged.
    """
    media = media.select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "media_type", "width", "height",
                "channels", "n_frames", "payload_bytes",
            )}
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                mt, w, h, ch, nf, nbytes = parse_csm1(b)
                rows["media_id"].append(mid)
                rows["media_type"].append(mt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["n_frames"].append(nf)
                rows["payload_bytes"].append(nbytes)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Typed-metadata aggregation after extraction: payload stats per
    media type — bytes never reach this stage."""
    return (
        features.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("digest").alias("distinct_payloads"),
        )
        .orderBy("media_type")
    )
