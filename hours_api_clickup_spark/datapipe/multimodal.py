"""Multimodal column plumbing: opaque binary media + typed metadata.

Design for 100 TB: media lives as a ``binary`` column (or object-store
URIs) beside a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the Python
boundary is crossed once per batch, not per row, and each partition
streams through the decoder without materializing the whole table.

The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_media`` raises NotImplementedError by design, and
``extract_features`` uses a deterministic fake decoder (sha256-seeded
feature vector) so the Spark-side plumbing — schema, batch iteration,
partitioning — is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("content", StringType()),  # binary handled below
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build an opaque-binary media table from any string column: content
    becomes bytes with a fake format header; metadata is typed columns.
    Stands in for reading real image/audio bytes from object storage."""
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(F.lit("IMG0"), payload).cast("binary").alias("content"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.length(payload) % 1024 + 16).cast("long").alias("width"),
        (F.length(payload) % 768 + 16).cast("long").alias("height"),
    )


def decode_media(content: bytes, media_type: str):
    """Real codec hook — deliberately unimplemented in this environment.

    Production wiring: try-import PIL / soundfile / av inside the
    mapInPandas worker and decode per batch. Kept as an explicit stub so
    the dependency boundary is visible.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "container; extract_features uses the deterministic fake path"
    )


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: 8 doubles
    derived from the sha256 digest, stable across runs and engines."""
    digest = hashlib.sha256(content).digest()
    return [
        int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: one Python crossing per Arrow batch; partitions stream.
    Swap ``_fake_features`` for a real decoder without touching the plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": content.map(lambda b: _fake_features(bytes(b))),
                }
            )

    from hours_api_clickup_spark.datapipe.dedup import spread

    # decode work is per-row CPU in Python workers — fan out the scan so
    # every core runs a worker instead of one giant batch stream
    return spread(media).mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_media(
    media: DataFrame, target_width: int = 224, target_height: int = 224
) -> DataFrame:
    """Resize stage: binary in → binary out, so stages compose into a
    decode→resize→featurize pipeline without schema breaks.

    The pixel resample is the stubbed codec step (``decode_media``); the
    deterministic fake scales the byte payload to a length proportional
    to the target area — preserving the real contract: output rows keep
    (media_id, media_type), carry new typed dimensions, and the content
    column stays opaque binary. Arrow-batched mapInPandas, one Python
    crossing per batch; image-only rows pass through the resampler,
    audio/video pass through untouched (their "resize" is
    ``frame_sample_plan`` / re-chunking).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        area = target_width * target_height
        for pdf in batches:
            is_img = pdf["media_type"].eq("image/png")
            src_area = (pdf["width"] * pdf["height"]).clip(lower=1)
            scale = (area / src_area) ** 0.5

            def _rescale(b, s):
                # fake resample: repeat/truncate bytes to the scaled size
                raw = bytes(b)
                n = max(4, int(len(raw) * s))
                return (raw * (n // max(len(raw), 1) + 1))[:n]

            content = [
                _rescale(b, s) if img else bytes(b)
                for b, s, img in zip(pdf["content"], scale, is_img)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": content,
                    "width": pdf["width"].where(~is_img, target_width).astype("int64"),
                    "height": pdf["height"].where(~is_img, target_height).astype("int64"),
                }
            )

    from hours_api_clickup_spark.datapipe.dedup import spread

    return spread(media).mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: fan out one row per sampled frame
    index (the decode of each frame is the stubbed codec step). Shows the
    explode-then-decode shape used for video at scale."""
    n_frames = (F.length(F.col("content")) % 100 + 1).alias("n_frames")
    return (
        media.filter(F.col("media_type") == "video/mp4")
        .select("media_id", "content", n_frames)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
